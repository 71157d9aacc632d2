"""Auxiliary subsystems: checkpoint round-trip, gate detectors, profiling,
output writers (SURVEY §5 inventory)."""

import numpy as np
import jax.numpy as jnp

from ground_fusion_tpu.config import Config
from ground_fusion_tpu.estimator.gates import (
    failure_detection,
    imu_stationary,
    visual_stationary,
    wheel_anomaly,
    wheel_stationary,
)
from ground_fusion_tpu.utils.checkpoint import load_core, save_core
from ground_fusion_tpu.utils.profiling import StageStats, TicToc


def test_checkpoint_roundtrip(tmp_path):
    from ground_fusion_tpu.estimator.assembly import empty_prior
    from ground_fusion_tpu.estimator.buffers import empty_imu_buffer, empty_wheel_buffer
    from ground_fusion_tpu.estimator.layout import StateLayout
    from ground_fusion_tpu.estimator.step import EstimatorCore
    from ground_fusion_tpu.estimator.window import empty_state, empty_tracks

    cfg = Config()
    f, ml = cfg.num_frames, cfg.solver.max_landmarks
    layout = StateLayout(f, ml)
    core = EstimatorCore(
        state=empty_state(f)._replace(td=jnp.asarray(0.123, jnp.float32)),
        tracks=empty_tracks(ml, f)._replace(inv_depth=jnp.full((ml,), 0.7)),
        imu_buf=empty_imu_buffer(f, 8),
        wheel_buf=empty_wheel_buffer(f, 8),
        prior=empty_prior(layout, f),
        gnss_obs=None,
    )
    p = str(tmp_path / "core.npz")
    save_core(p, core)
    core2 = load_core(p, core)
    assert float(core2.state.td) == float(core.state.td)
    assert np.allclose(np.asarray(core2.tracks.inv_depth), 0.7)
    assert core2.gnss_obs is None


def test_gate_detectors():
    rng = np.random.default_rng(0)
    still = rng.normal([0, 0, 9.8], 0.01, (50, 3))
    moving = rng.normal([0, 0, 9.8], 1.0, (50, 3))
    assert imu_stationary(still)
    assert not imu_stationary(moving)
    assert visual_stationary(np.full(20, 0.0005), 460.0)       # 0.23 px
    assert not visual_stationary(np.full(20, 0.01), 460.0)     # 4.6 px
    assert wheel_stationary(np.zeros(3))
    assert not wheel_stationary(np.array([0.1, 0, 0]))
    assert wheel_anomaly([0.1, 0, 0], [0.15, 0, 0])            # 5 cm slip
    assert not wheel_anomaly([0.1, 0, 0], [0.11, 0, 0])
    sbs = np.zeros((11, 9))
    assert not failure_detection(sbs)
    sbs[-1, 3:6] = [3.0, 0, 0]
    assert failure_detection(sbs)


def test_profiling_stats():
    st = StageStats()
    with st.time("solve"):
        pass
    st.add("solve", 5.0)
    assert st.counts["solve"] == 2
    assert "solve" in st.report()
    t = TicToc()
    assert t.toc() >= 0.0


def test_output_writers(tmp_path):
    from ground_fusion_tpu.estimator.window import empty_state
    from ground_fusion_tpu.utils.outputs import (
        CalibrationDump, DeadReckoningPaths, print_statistics,
    )

    st = empty_state(11)
    dump = CalibrationDump(str(tmp_path))
    dump.append(1.0, st)
    assert (tmp_path / "td.csv").read_text().startswith("1.0")
    dr = DeadReckoningPaths()
    for k in range(5):
        dr.propagate_imu(0.01 * k, 0.01, np.array([0, 0, 9.8]), np.zeros(3),
                         np.array([0, 0, 9.8]), np.zeros(3), np.zeros(3),
                         np.zeros(3), 9.8)
        dr.propagate_wheel(0.01 * k, 0.01, np.array([1.0, 0, 0]), np.zeros(3))
    dr.write_tum(str(tmp_path / "imu.txt"), str(tmp_path / "wheel.txt"))
    assert (tmp_path / "wheel.txt").read_text().count("\n") == 5
    line = print_statistics(1.0, st, 0.5)
    assert "t=1.00" in line


def test_wheel_odom_pose_buffer():
    """SURVEY §2 #24: planar interpolation + frame-pose seeding
    (feature_manager.cpp:407-545)."""
    import numpy as np
    from ground_fusion_tpu.utils.wheel_odom import WheelOdomPoseBuffer, WHEEL2CAM

    buf = WheelOdomPoseBuffer(tio=np.zeros(3))
    # straight-line drive along +x with constant yaw = 0
    for k in range(5):
        buf.push(0.1 * k, [0.5 * k, 0.0, 0.0], qz=0.0, qw=1.0)
    out = buf.pose_by_wheel_odom(0.25)
    assert out is not None
    P, Rcam = out
    np.testing.assert_allclose(P, [1.25, 0.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(Rcam, WHEEL2CAM, atol=1e-12)
    # out-of-span lookups are rejected
    assert buf.pose_by_wheel_odom(-1.0) is None
    assert buf.pose_by_wheel_odom(9.0) is None
    # 90° yaw: qz = qw = √2/2 → x_world axis maps to +y
    buf2 = WheelOdomPoseBuffer()
    s = np.sqrt(0.5)
    buf2.push(0.0, [0.0, 0.0, 0.0], qz=s, qw=s)
    buf2.push(1.0, [0.0, 1.0, 0.0], qz=s, qw=s)
    P2, R2 = buf2.pose_by_wheel_odom(0.5)
    np.testing.assert_allclose(P2, [0.0, 0.5, 0.0], atol=1e-12)
    np.testing.assert_allclose(R2 @ WHEEL2CAM.T,
                               [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-12)
    # init_frame_pose: identity extrinsics → same pose back in IMU frame
    seed = buf.init_frame_pose(0.25, np.zeros(3), WHEEL2CAM)
    assert seed is not None
    np.testing.assert_allclose(seed[0], [1.25, 0.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(seed[1], np.eye(3), atol=1e-12)


def test_dead_reckoning_paths_track_gt():
    """Pure-IMU / pure-wheel dead reckoning on exact synthetic measurements
    (fastPredictPureIMU / fastPredictWheel, estimator.cpp:4032-4093): seeded
    at the true initial state, both tracks must follow the ground-truth
    trajectory expressed in the frame-0 body frame."""
    import jax.numpy as jnp

    from ground_fusion_tpu.geometry.se3 import pose_apply, pose_inverse
    from ground_fusion_tpu.sim.synthetic import (
        SimParams, gt_pose7, gt_velocity, imu_sample, wheel_sample,
    )
    from ground_fusion_tpu.utils.outputs import DeadReckoningPaths

    sp = SimParams()
    dr = DeadReckoningPaths()
    T0 = np.asarray(gt_pose7(0.0, sp))
    T0_inv = np.asarray(pose_inverse(jnp.asarray(T0)))
    v0 = np.asarray(gt_velocity(0.0, sp))

    # the IMU track integrates in the gravity-aligned world (the estimator's
    # world frame): seed at the true initial pose/velocity
    # the sim IMU carries biases; the system feeds the latest solved biases
    # the same way (_refresh_dr_bias)
    for ti in np.arange(0.0, 2.0, 1.0 / sp.imu_rate):
        a, g = np.asarray(imu_sample(float(ti), sp), np.float64)
        dr.push_imu(float(ti), a, g, ba=np.asarray(sp.ba), bg=np.asarray(sp.bg),
                    g_norm=sp.g_norm, seed_pose=(T0[0:3], T0[3:7], v0))
    for ti in np.arange(0.0, 2.0, 1.0 / sp.wheel_rate):
        v, w = np.asarray(wheel_sample(float(ti), sp), np.float64)
        dr.push_wheel(float(ti), v, w)

    assert len(dr.imu_path) > 300 and len(dr.wheel_path) > 100
    t_end = dr.imu_path[-1][0]
    p_gt = np.asarray(gt_pose7(t_end, sp))[0:3]
    err_imu = np.linalg.norm(dr.imu_path[-1][1][0:3] - p_gt)
    assert err_imu < 0.02, f"pure-IMU drifted {err_imu:.3f} m over 2 s"
    t_end_w = dr.wheel_path[-1][0]
    p_gt_w = np.asarray(pose_apply(jnp.asarray(T0_inv),
                                   jnp.asarray(gt_pose7(t_end_w, sp))[0:3]))
    err_w = np.linalg.norm(dr.wheel_path[-1][1][0:3] - p_gt_w)
    assert err_w < 0.05, f"pure-wheel drifted {err_w:.3f} m over 2 s"

    # TUM writers produce non-empty, well-formed rows
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        import os as _os

        pi, pw = _os.path.join(d, "i.txt"), _os.path.join(d, "w.txt")
        dr.write_tum(pi, pw)
        rows = np.loadtxt(pi)
        assert rows.shape[1] == 8 and len(rows) == len(dr.imu_path)
