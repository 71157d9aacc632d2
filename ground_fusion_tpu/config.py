"""Typed configuration for the TPU-native ground-SLAM engine.

Replaces the reference's ~70 mutable globals parsed out of one YAML via
``cv::FileStorage`` (``vins_estimator/src/estimator/parameters.{h,cpp}``,
``parameters.h:28-152``) with a frozen dataclass. Static fields (window size,
feature capacity, sensor toggles) specialize the jitted programs; float fields
ride along as scalars inside the state pytree where online calibration needs
them (extrinsics, td, wheel intrinsic scales).

Load from YAML with :func:`load_yaml` — the shipped per-dataset configs under
``configs/`` mirror ``config/realsense/groundchallenge.yaml`` etc.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any

import numpy as np


@dataclass(frozen=True)
class CameraConfig:
    model: str = "pinhole"  # pinhole | equidistant | mei
    width: int = 640
    height: int = 480
    fx: float = 460.0
    fy: float = 460.0
    cx: float = 320.0
    cy: float = 240.0
    distortion: tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    # camera-IMU extrinsics: body_T_cam (translation xyz + quaternion wxyz)
    t_ic: tuple[float, float, float] = (0.0, 0.0, 0.0)
    q_ic: tuple[float, float, float, float] = (1.0, 0.0, 0.0, 0.0)
    # rectified stereo baseline (m); > 0 enables the right-image LK-disparity
    # depth path (STEREO ingest — the second image topic of
    # rosNodeTest.cpp:678-711)
    baseline: float = 0.0


@dataclass(frozen=True)
class ImuConfig:
    acc_n: float = 0.1       # accelerometer white noise (groundchallenge.yaml:74)
    gyr_n: float = 0.01      # gyro white noise
    acc_w: float = 0.001     # accel bias random walk
    gyr_w: float = 0.0001    # gyro bias random walk
    g_norm: float = 9.805    # gravity magnitude (g_norm)
    rate_hz: float = 200.0


@dataclass(frozen=True)
class WheelConfig:
    enabled: bool = True
    # body_T_wheel extrinsic
    t_io: tuple[float, float, float] = (0.0, 0.0, 0.0)
    q_io: tuple[float, float, float, float] = (1.0, 0.0, 0.0, 0.0)
    vel_n: float = 0.1       # wheel velocity noise (VEL_N_wheel)
    gyr_n: float = 0.02      # wheel gyro noise (GYR_N_wheel)
    sx: float = 1.0          # intrinsic scale x (online-calibratable)
    sy: float = 1.0
    sw: float = 1.0
    estimate_extrinsic: bool = False
    estimate_intrinsic: bool = False
    estimate_td: bool = False
    td: float = 0.0
    # anomaly gate: |dP_wheel - dP_imu| threshold per frame interval
    # (estimator.cpp:629-636)
    anomaly_thresh: float = 0.02
    # replace wheel yaw-rate with interpolated IMU gyro z (w_replace,
    # rosNodeTest.cpp:93-156)
    w_replace: bool = False
    rate_hz: float = 100.0


@dataclass(frozen=True)
class PlaneConfig:
    enabled: bool = False
    pitch_n_inv: float = 100.0
    roll_n_inv: float = 100.0
    zpw_n_inv: float = 100.0


@dataclass(frozen=True)
class GnssConfig:
    enabled: bool = False
    elevation_mask_deg: float = 30.0    # GNSS_ELEVATION_THRES
    psr_std_thresh: float = 2.0         # GNSS_PSR_STD_THRES
    dopp_std_thresh: float = 2.0
    track_num_thresh: int = 5           # GNSS_TRACK_NUM_THRES
    ddt_weight: float = 10.0            # GNSS_DDT_WEIGHT
    max_sats: int = 16                  # per-frame satellite slot capacity
    low_speed_yaw_fix: float = 0.3      # m/s; fix yaw below this (estimator.cpp:2904-2930)


@dataclass(frozen=True)
class TrackerConfig:
    max_features: int = 128           # MAX_CNT=150 in reference; pad-friendly default
    min_dist_px: float = 30.0         # MIN_DIST
    pyramid_levels: int = 3
    patch_half: int = 10              # LK window half-size (21x21 in reference)
    lk_iters: int = 10
    fb_thresh_px: float = 0.5         # reverse-flow consistency gate (feature_tracker.cpp:137-153)
    border: int = 5
    depth_min: float = 0.1
    depth_max: float = 7.0
    # fisheye lens mask (FISHEYE/FISHEYE_MASK, parameters.cpp:95-106 +
    # config/fisheye_mask_752x480.jpg): features outside the lens circle are
    # culled and never refilled there. Path to a PGM/NPY 0-255 mask image
    # ("" = disabled); pixels with value 0 are outside the lens.
    fisheye_mask_path: str = ""


@dataclass(frozen=True)
class SolverConfig:
    window_size: int = 10             # WINDOW_SIZE (parameters.h:24) -> 11 poses
    max_landmarks: int = 128          # active landmark slots in the BA
    max_iters: int = 8                # NUM_ITERATIONS
    # trust-region strategy: "dogleg" = ceres DOGLEG (estimator.cpp:3306),
    # "lm" = Levenberg–Marquardt damping. Default matches the reference's
    # DOGLEG + DENSE_SCHUR (estimator.cpp:3303-3318); on-TPU medians also
    # favor it: dogleg+schur 6683 window-steps/s vs lm+dense 3833 (r3 bench)
    method: str = "dogleg"
    # "schur" eliminates depth/line blocks before the dense Cholesky
    # (ceres DENSE_SCHUR); "dense" factorizes the full system
    linear_solver: str = "schur"
    lm_lambda0: float = 1e-4
    lm_lambda_factor: float = 3.0
    focal: float = 460.0              # FOCAL_LENGTH used for sqrt_info = F/1.5
    huber_delta: float = 1.0          # Cauchy/Huber robust loss threshold (in sigma)
    keyframe_parallax_px: float = 10.0
    min_track_for_solve: int = 4      # feature used_num >= 4 (feature_manager semantics)
    # failureDetection bias-norm thresholds (estimator.cpp:2852-2862)
    fail_ba_thresh: float = 2.5
    fail_bg_thresh: float = 1.0
    estimate_extrinsic: bool = False
    # ESTIMATE_EXTRINSIC=2 path (parameters.h:76-80): no prior rotation —
    # bootstrap ric by hand-eye calibration during initialization
    # (initial_ex_rotation.cpp:22-79) before optimizing it online
    calibrate_extrinsic: bool = False
    estimate_td: bool = False
    td: float = 0.0
    max_solver_time_ms: float = 40.0  # informational; TPU solve is fixed-iteration
    # padded raw-sample capacity per frame gap; must cover a *merged* double
    # interval (non-keyframe slides concatenate two gaps, estimator.cpp:3712),
    # so ≥ 2 × rate/frame_rate + slack — overflow decimates pairwise
    max_imu_per_interval: int = 48
    max_wheel_per_interval: int = 24
    dtype: str = "float32"


@dataclass(frozen=True)
class InitConfig:
    imu_excite_var_thresh: float = 0.35   # excitation test (estimator.cpp:1564-1602)
    stationary_acc_var: float = 0.1       # checkimu gate (estimator.cpp:870)
    stationary_parallax: float = 0.5      # checkvisual: parallax*focal < 0.5px
    wheel_stationary_dp: float = 1e-3


@dataclass(frozen=True)
class LineFeatureConfig:
    """Structural-line landmarks (``use_line``; linefeatureTracker +
    estimator.cpp:4202-4712)."""

    max_lines: int = 32               # padded line-landmark slots in the BA
    min_obs: int = 5                  # LINE_MIN_OBS (parameters.h:26)
    min_cos_theta: float = 0.998      # triangulation parallax gate
                                      # (feature_manager.cpp:1236)
    only_opt_iters: int = 4           # onlyLineOpt GN iterations
    # line-factor weight relative to point factors (the reference ships
    # sqrt_info = F/1.5 like points but carries a commented adaptive
    # down-weighting experiment, estimator.cpp:4540-4543)
    weight_scale: float = 1.0
    outlier_reproj_px: float = 3.0    # removeLineOutlier max-residual gate
    min_seg_len_px: float = 60.0      # detector min segment length


@dataclass(frozen=True)
class LoopConfig:
    enabled: bool = False
    brief_bits: int = 256
    fast_threshold: int = 20
    max_keypoints: int = 500
    min_loop_gap: int = 50            # frame gap (pose_graph.cpp:447)
    # gate semantics as pose_graph.cpp:476-480 (best > A, top-4 candidates
    # > B, earliest wins) but recalibrated: the reference's 0.05/0.015 are
    # operating points of its 1M-leaf DBoW2 vocabulary; our 4096-word LSH
    # vocabulary scores unrelated scenes ≈ 0.15 and true revisits ≈ 0.8
    bow_score_best: float = 0.30
    bow_score_min: float = 0.25
    # optional trained DBoW2 vocabulary (the reference's
    # support_files/brief_k10L6.bin, pose_graph_node.cpp:788-790): when set,
    # place recognition quantizes through that tree and scores with DBoW2's
    # TF-IDF L1, so the reference gates apply verbatim (see dbow_score_*)
    vocab_path: str = ""
    dbow_score_best: float = 0.05     # pose_graph.cpp:476-480 gates for the
    dbow_score_min: float = 0.015     # trained-vocabulary operating point
    hamming_thresh: int = 80          # keyframe.cpp:215
    pnp_reproj_px: float = 10.0       # keyframe.cpp:299-305
    min_matches: int = 25
    # full-SE(3) relaxation instead of yaw+translation (the reference's
    # optimize6DoF alternative loop, pose_graph.cpp:707-860)
    graph_6dof: bool = False


@dataclass(frozen=True)
class MapConfig:
    enabled: bool = False
    voxel_size: float = 0.05
    depth_stride: int = 4             # depth_dist sampling stride (pose_graph_node.cpp:598-624)
    depth_boundary: int = 20
    max_points_per_kf: int = 8192
    density_gate: int = 3             # getVoxelDensityAtPoint < 3 (pose_graph.cpp:191-244)
    # world-z insertion gate: skip points above/below (ground-robot ceiling/
    # floor cull, pose_graph.cpp:201-202: z > 2 || z < -0.5)
    z_min: float = -0.5
    z_max: float = 2.0
    # TSDF surface meshing (the offline Poisson-mesh analog, meshing.py)
    mesh: bool = False
    mesh_resolution: int = 128
    mesh_size_m: float = 10.0
    mesh_origin: tuple[float, float, float] = (-5.0, -5.0, -2.0)
    # offline cloud conditioning before export (the MLS + radius-outlier
    # stage of the reference's mesh command, pose_graph_node.cpp:175-182):
    # 0 disables; in voxels of mesh cell size for the mesh vertex smoothing
    mls_radius_m: float = 0.0
    outlier_min_neighbors: int = 0


@dataclass(frozen=True)
class Config:
    camera: CameraConfig = field(default_factory=CameraConfig)
    imu: ImuConfig = field(default_factory=ImuConfig)
    wheel: WheelConfig = field(default_factory=WheelConfig)
    plane: PlaneConfig = field(default_factory=PlaneConfig)
    gnss: GnssConfig = field(default_factory=GnssConfig)
    tracker: TrackerConfig = field(default_factory=TrackerConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)
    init: InitConfig = field(default_factory=InitConfig)
    lines: LineFeatureConfig = field(default_factory=LineFeatureConfig)
    loop: LoopConfig = field(default_factory=LoopConfig)
    map: MapConfig = field(default_factory=MapConfig)
    # RGBD mode (the reference's DEPTH flag, groundchallenge.yaml:5): gates
    # depth-verified triangulation in the window step and selects the
    # Depth/WD linear-alignment variants + metric SfM at initialization
    use_depth: bool = True
    use_line: bool = False
    use_yolo: bool = False
    use_mcc: bool = False             # movingConsistencyCheck outlier gate
    wdetect: bool = True              # wheel anomaly detection
    stationary_detect: bool = True
    output_path: str = "output"
    # replay acceleration: stage this many frames and solve them in ONE
    # device dispatch (pipeline.Estimator.enable_burst — on-device ingest +
    # scanned window steps; supports point AND line landmarks; with tight
    # GNSS the chunk auto-flushes around host-interactive epochs). 0 =
    # per-frame dispatch (live/latency mode); replay-only — a live robot
    # wants the per-frame path's latency.
    burst_chunk: int = 0

    @property
    def num_frames(self) -> int:
        return self.solver.window_size + 1


def _update(dc, d: dict[str, Any]):
    """Recursively rebuild a frozen dataclass with overrides from a dict."""
    kwargs = {}
    for f in dataclasses.fields(dc):
        if f.name in d:
            v = d[f.name]
            cur = getattr(dc, f.name)
            if dataclasses.is_dataclass(cur) and isinstance(v, dict):
                kwargs[f.name] = _update(cur, v)
            elif isinstance(cur, tuple):
                kwargs[f.name] = tuple(np.asarray(v).ravel().tolist())
            else:
                kwargs[f.name] = v
    return dataclasses.replace(dc, **kwargs)


def from_dict(d: dict[str, Any]) -> Config:
    return _update(Config(), d)


def load_yaml(path: str) -> Config:
    import yaml

    with open(path) as f:
        return from_dict(yaml.safe_load(f) or {})
