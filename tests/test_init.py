"""Initialization tests: gyro-bias solve, the four linear-alignment variants,
SfM relative pose + construct (initial_aligment.cpp / initial_sfm.cpp
semantics on the synthetic window)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ground_fusion_tpu.config import Config
from ground_fusion_tpu.estimator.buffers import (
    preintegrate_imu_window,
    preintegrate_wheel_window,
)
from ground_fusion_tpu.estimator.initialization import (
    linear_alignment_depth,
    linear_alignment_mono,
    linear_alignment_wd,
    linear_alignment_wheel,
    solve_gyroscope_bias,
)
from ground_fusion_tpu.estimator.sfm import (
    find_pivot_frame,
    relative_pose_ransac,
    sfm_construct,
)
from ground_fusion_tpu.geometry.so3 import quat_to_mat
from ground_fusion_tpu.preintegration.imu import noise_cov
from ground_fusion_tpu.preintegration.wheel import wheel_noise_cov
from ground_fusion_tpu.sim.synthetic import SimParams, build_window_problem

DT = jnp.float64


@pytest.fixture(scope="module")
def prob():
    cfg = Config()
    sp = SimParams()
    p = build_window_problem(cfg, sp, dtype=DT)
    n18 = noise_cov(cfg.imu.acc_n, cfg.imu.gyr_n, cfg.imu.acc_w, cfg.imu.gyr_w, DT)
    n12 = wheel_noise_cov(cfg.wheel.vel_n, cfg.wheel.gyr_n, DT)
    # preints at ZERO bias (pre-init state: biases unknown)
    sbs0 = jnp.zeros_like(p["state"].sbs)
    p["imu_pre0"] = preintegrate_imu_window(p["imu_buf"], sbs0, n18)
    p["wheel_pre"] = preintegrate_wheel_window(
        p["wheel_buf"], p["state"].s_wheel, p["state"].td_wheel, n12
    )
    p["cfg"], p["sp"] = cfg, sp
    return p


def test_solve_gyroscope_bias(prob):
    """With true rotations and zero-bias preints, the LS must recover bg."""
    valid = prob["interval_valid"]
    dbg = solve_gyroscope_bias(prob["state"].poses[:, 3:7], prob["imu_pre0"], valid)
    assert np.allclose(np.asarray(dbg), prob["sp"].bg, atol=2e-4)


def _gravity_world(prob):
    return np.array([0.0, 0.0, prob["sp"].g_norm])


def _aligned_preints(prob):
    """Preints at the true gyro bias (post gyro-bias solve), zero accel bias
    — matching the reference's repropagate(0, Bgs) step."""
    cfg = prob["cfg"]
    n18 = noise_cov(cfg.imu.acc_n, cfg.imu.gyr_n, cfg.imu.acc_w, cfg.imu.gyr_w, DT)
    sbs = jnp.zeros_like(prob["state"].sbs).at[:, 6:9].set(
        jnp.asarray(prob["sp"].bg, DT)
    )
    return preintegrate_imu_window(prob["imu_buf"], sbs, n18)


@pytest.mark.parametrize("variant", ["wheel", "mono", "depth", "wd"])
def test_linear_alignment_variants(prob, variant):
    st = prob["state"]
    Rs = quat_to_mat(st.poses[:, 3:7])
    Ts = st.poses[:, 0:3]
    tic = st.ex_cam[0:3]
    tio = st.ex_wheel[0:3]
    rio = quat_to_mat(st.ex_wheel[3:7])
    g_norm = prob["sp"].g_norm
    imu_pre = _aligned_preints(prob)

    if variant == "wheel":
        ok, g, vels, s = linear_alignment_wheel(Rs, Ts, imu_pre, prob["wheel_pre"],
                                                tic, tio, rio, g_norm)
    elif variant == "mono":
        ok, g, vels, s = linear_alignment_mono(Rs, Ts, imu_pre, tic, g_norm)
    elif variant == "depth":
        ok, g, vels, s = linear_alignment_depth(Rs, Ts, imu_pre, tic, g_norm)
    else:
        ok, g, vels, s = linear_alignment_wd(Rs, Ts, imu_pre, prob["wheel_pre"],
                                             tic, tio, rio, g_norm)
    assert bool(ok), f"{variant} alignment failed"
    # gravity direction in world frame: sim world is gravity-aligned, and the
    # alignment returns g expressed in frame-0's "camera-ish" world = world
    g = np.asarray(g)
    assert abs(np.linalg.norm(g) - g_norm) < 0.05
    g_dir_err = np.arccos(np.clip(np.dot(g / np.linalg.norm(g), [0, 0, 1]), -1, 1))
    assert g_dir_err < 0.02, f"gravity direction error {g_dir_err} rad"
    # mono: scale only weakly observable on a constant-speed circle — wider
    # tolerance there; metric variants must be tight
    s_tol, v_tol = (0.08, 0.1) if variant == "mono" else (0.05, 0.05)
    assert abs(float(s) - 1.0) < s_tol
    # velocities are solved in body frame: compare against R^T v_world
    v_body_gt = np.einsum("kij,ki->kj", np.asarray(Rs), np.asarray(st.sbs[:, 0:3]))
    assert np.abs(np.asarray(vels) - v_body_gt).max() < v_tol


@pytest.fixture(scope="module")
def prob_slow():
    """Slow sweep (ω=0.12) + dense landmark field: wide inter-frame feature
    overlap for the SfM tests (the ring field only keeps ~9 points in view)."""
    import dataclasses

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, max_landmarks=512)
    )
    sp = SimParams(omega=0.12)
    p = build_window_problem(cfg, sp, dtype=DT)
    p["cfg"], p["sp"] = cfg, sp
    return p


def test_relative_pose_ransac(prob_slow):
    prob = prob_slow
    tr = prob["tracks"]
    f = prob["cfg"].num_frames
    both = tr.obs_valid[:, 0] & tr.obs_valid[:, f - 1]
    assert int(both.sum()) >= 20
    pose_rel, inl, ok = relative_pose_ransac(
        tr.obs[:, 0, 0:2], tr.obs[:, f - 1, 0:2], both, jax.random.PRNGKey(0)
    )
    assert bool(ok)
    # ground-truth relative camera pose (world = cam0)
    from ground_fusion_tpu.geometry.se3 import pose_compose, pose_inverse

    cam0 = pose_compose(prob["state"].poses[0], prob["ex_cam"])
    cam1 = pose_compose(prob["state"].poses[f - 1], prob["ex_cam"])
    rel_gt = np.asarray(pose_compose(pose_inverse(cam0), cam1))
    t_gt = rel_gt[0:3] / np.linalg.norm(rel_gt[0:3])
    t_est = np.asarray(pose_rel[0:3])
    t_est = t_est / np.linalg.norm(t_est)
    assert np.dot(t_gt, t_est) > 0.995, f"translation direction {t_est} vs {t_gt}"
    q_err = np.abs(np.dot(rel_gt[3:7], np.asarray(pose_rel[3:7])))
    assert q_err > 0.9999, f"rotation mismatch {q_err}"


def test_sfm_construct(prob_slow):
    prob = prob_slow
    poses, ok = sfm_construct(prob["tracks"], jax.random.PRNGKey(1))
    assert ok
    # compare up-to-scale relative camera poses against GT
    from ground_fusion_tpu.geometry.se3 import pose_compose, pose_inverse

    f = prob["cfg"].num_frames
    l = find_pivot_frame(prob["tracks"])
    cam_l = pose_compose(prob["state"].poses[l], prob["ex_cam"])
    for k in [0, f // 2, f - 1]:
        cam_k = pose_compose(prob["state"].poses[k], prob["ex_cam"])
        rel_gt = np.asarray(pose_compose(pose_inverse(cam_l), cam_k))
        est = np.asarray(poses[k])
        if np.linalg.norm(rel_gt[0:3]) > 1e-6:
            d_gt = rel_gt[0:3] / np.linalg.norm(rel_gt[0:3])
            d_est = est[0:3] / max(np.linalg.norm(est[0:3]), 1e-9)
            assert np.dot(d_gt, d_est) > 0.98, f"frame {k} dir"
        assert abs(np.dot(rel_gt[3:7], est[3:7])) > 0.999, f"frame {k} rot"


def test_calibrate_extrinsic_rotation_recovers_ric():
    """Hand-eye calibration (initial_ex_rotation.cpp:22-79 semantics): recover
    a known camera-IMU rotation from noisy relative-rotation pairs."""
    import numpy as np
    from ground_fusion_tpu.estimator.initialization import calibrate_extrinsic_rotation
    from ground_fusion_tpu.geometry.so3 import (
        quat_conj, quat_mul, quat_normalize, quat_to_mat,
    )

    rng = np.random.default_rng(7)
    # true body_R_cam
    axis = rng.standard_normal(3); axis /= np.linalg.norm(axis)
    th = 0.9
    q_ric = jnp.asarray([np.cos(th / 2), *(np.sin(th / 2) * axis)], jnp.float64)

    n = 24
    qs = []
    for _ in range(n):
        a = rng.standard_normal(3); a /= np.linalg.norm(a)
        t = rng.uniform(0.05, 0.5)
        qs.append([np.cos(t / 2), *(np.sin(t / 2) * a)])
    q_imu = jnp.asarray(np.array(qs), jnp.float64)
    # q_cam = ric⁻¹ ⊗ q_imu ⊗ ric  (hand-eye identity), small noise
    q_cam = quat_mul(quat_mul(quat_conj(q_ric)[None], q_imu), q_ric[None])
    noise = 0.002 * rng.standard_normal((n, 4))
    q_cam = quat_normalize(q_cam + jnp.asarray(noise))
    valid = jnp.ones(n, bool)

    ric, ok = jax.jit(calibrate_extrinsic_rotation)(q_cam, q_imu, valid)
    assert bool(ok)
    err = np.asarray(ric) - np.asarray(quat_to_mat(q_ric))
    assert np.abs(err).max() < 5e-3

    # degenerate: all rotations about one axis → observability gate trips
    q_deg = jnp.asarray(
        np.array([[np.cos(t / 2), np.sin(t / 2), 0.0, 0.0]
                  for t in rng.uniform(0.05, 0.5, n)]), jnp.float64)
    q_cam_d = quat_mul(quat_mul(quat_conj(q_ric)[None], q_deg), q_ric[None])
    _, ok_d = jax.jit(calibrate_extrinsic_rotation)(q_cam_d, q_deg, valid)
    assert not bool(ok_d)
