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
