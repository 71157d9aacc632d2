"""Preintegration checks: brute-force integration equality, finite-difference
bias Jacobians (the reference's own disabled methodology,
integration_base.h:288-454), and covariance PSD-ness."""

import jax
import jax.numpy as jnp
import numpy as np

from ground_fusion_tpu.geometry import so3
from ground_fusion_tpu.preintegration import imu as pimu
from ground_fusion_tpu.preintegration import wheel as pwheel

F64 = jnp.float64


def make_samples(rng, K=20, dt=0.005, dtype=F64):
    dts = jnp.full((K,), dt, dtype)
    accs = jnp.asarray(rng.normal(size=(K, 3)), dtype) * 0.5 + jnp.array([0.1, 0.2, 9.8], dtype)
    gyrs = jnp.asarray(rng.normal(size=(K, 3)), dtype) * 0.3
    valid = jnp.ones((K,), bool)
    acc0 = jnp.asarray(rng.normal(size=3), dtype) * 0.5 + jnp.array([0.0, 0.0, 9.8], dtype)
    gyr0 = jnp.asarray(rng.normal(size=3), dtype) * 0.3
    return dts, accs, gyrs, valid, acc0, gyr0


def run_preint(dts, accs, gyrs, valid, acc0, gyr0, ba, bg):
    noise = pimu.noise_cov(0.1, 0.01, 0.001, 0.0001, dtype=F64)
    return pimu.preintegrate(dts, accs, gyrs, valid, acc0, gyr0, ba, bg, noise)


def test_imu_preint_zero_motion():
    """Constant gravity-only accel, zero gyro: delta_q stays identity if the
    accel equals the bias; pure-bias case gives zero deltas."""
    K = 10
    dts = jnp.full((K,), 0.01, F64)
    acc = jnp.tile(jnp.array([[0.3, -0.2, 9.8]], F64), (K, 1))
    gyr = jnp.zeros((K, 3), F64)
    valid = jnp.ones((K,), bool)
    ba = jnp.array([0.3, -0.2, 9.8], F64)  # bias == accel -> no motion in delta frame
    bg = jnp.zeros(3, F64)
    pre = run_preint(dts, acc, gyr, valid, acc[0], gyr[0], ba, bg)
    np.testing.assert_allclose(pre.delta_p, 0.0, atol=1e-12)
    np.testing.assert_allclose(pre.delta_v, 0.0, atol=1e-12)
    np.testing.assert_allclose(pre.delta_q, [1, 0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(float(pre.sum_dt), 0.1, atol=1e-12)


def test_imu_preint_mask_padding():
    """Padded (invalid) samples must not change the result."""
    rng = np.random.default_rng(0)
    dts, accs, gyrs, valid, acc0, gyr0 = make_samples(rng, K=16)
    ba = jnp.zeros(3, F64)
    bg = jnp.zeros(3, F64)
    pre_full = run_preint(dts, accs, gyrs, valid, acc0, gyr0, ba, bg)

    pad = 8
    dts2 = jnp.concatenate([dts, jnp.full((pad,), 0.123, F64)])
    accs2 = jnp.concatenate([accs, jnp.asarray(rng.normal(size=(pad, 3)), F64)])
    gyrs2 = jnp.concatenate([gyrs, jnp.asarray(rng.normal(size=(pad, 3)), F64)])
    valid2 = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    pre_pad = run_preint(dts2, accs2, gyrs2, valid2, acc0, gyr0, ba, bg)

    np.testing.assert_allclose(pre_pad.delta_p, pre_full.delta_p, atol=1e-12)
    np.testing.assert_allclose(pre_pad.delta_q, pre_full.delta_q, atol=1e-12)
    np.testing.assert_allclose(pre_pad.covariance, pre_full.covariance, atol=1e-14)
    np.testing.assert_allclose(float(pre_pad.sum_dt), float(pre_full.sum_dt), atol=1e-12)


def test_imu_bias_jacobian_finite_diff():
    """First-order bias correction vs re-integration with perturbed bias —
    exactly the reference's checkJacobian perturbation scheme."""
    rng = np.random.default_rng(1)
    dts, accs, gyrs, valid, acc0, gyr0 = make_samples(rng, K=24)
    ba = jnp.array([0.05, -0.02, 0.03], F64)
    bg = jnp.array([0.01, 0.02, -0.015], F64)
    pre = run_preint(dts, accs, gyrs, valid, acc0, gyr0, ba, bg)

    eps = 1e-6
    for k in range(3):
        dba = jnp.zeros(3, F64).at[k].set(eps)
        pre2 = run_preint(dts, accs, gyrs, valid, acc0, gyr0, ba + dba, bg)
        # corrected delta from Jacobian should match re-integrated delta
        cp, cq, cv = pimu.bias_corrected_delta(pre, ba + dba, bg)
        np.testing.assert_allclose(cp, pre2.delta_p, atol=5e-9)
        np.testing.assert_allclose(cv, pre2.delta_v, atol=5e-9)

        dbg = jnp.zeros(3, F64).at[k].set(eps)
        pre3 = run_preint(dts, accs, gyrs, valid, acc0, gyr0, ba, bg + dbg)
        cp, cq, cv = pimu.bias_corrected_delta(pre, ba, bg + dbg)
        np.testing.assert_allclose(cp, pre3.delta_p, atol=5e-9)
        np.testing.assert_allclose(cv, pre3.delta_v, atol=5e-9)
        dq_err = so3.quat_log(so3.quat_mul(so3.quat_conj(cq), pre3.delta_q))
        np.testing.assert_allclose(dq_err, 0.0, atol=5e-9)


def test_imu_covariance_psd_and_grows():
    rng = np.random.default_rng(2)
    dts, accs, gyrs, valid, acc0, gyr0 = make_samples(rng, K=30)
    pre = run_preint(dts, accs, gyrs, valid, acc0, gyr0, jnp.zeros(3, F64), jnp.zeros(3, F64))
    eig = np.linalg.eigvalsh(np.asarray(pre.covariance))
    assert eig.min() > -1e-16
    assert eig.max() > 0


def wheel_run(dts, vels, gyrs, valid, v0, g0, sx, sy, sw, td=0.0):
    noise = pwheel.wheel_noise_cov(0.1, 0.02, dtype=F64)
    return pwheel.preintegrate_wheel(
        dts, vels, gyrs, valid, v0, g0,
        jnp.asarray(sx, F64), jnp.asarray(sy, F64), jnp.asarray(sw, F64), jnp.asarray(td, F64),
        noise,
    )


def test_wheel_intrinsic_jacobian_finite_diff():
    """d(delta)/d(sx,sy,sw) vs re-integration (the reference's commented
    checkIntrinsicUpdateJacobian, wheel_integration_base.h:47)."""
    rng = np.random.default_rng(3)
    K = 20
    dts = jnp.full((K,), 0.01, F64)
    vels = jnp.asarray(rng.normal(size=(K, 3)), F64) * jnp.array([1.0, 0.2, 0.0], F64) + jnp.array([0.8, 0, 0], F64)
    gyrs = jnp.asarray(rng.normal(size=(K, 3)), F64) * 0.4
    valid = jnp.ones((K,), bool)
    v0 = jnp.array([0.7, 0.05, 0.0], F64)
    g0 = jnp.asarray(rng.normal(size=3), F64) * 0.4

    pre = wheel_run(dts, vels, gyrs, valid, v0, g0, 1.0, 1.0, 1.0)
    eps = 1e-6
    for k, name in enumerate(["sx", "sy", "sw"]):
        s = [1.0, 1.0, 1.0]
        s[k] += eps
        pre2 = wheel_run(dts, vels, gyrs, valid, v0, g0, *s)
        dp_fd = (np.asarray(pre2.delta_p) - np.asarray(pre.delta_p)) / eps
        np.testing.assert_allclose(np.asarray(pre.jacobian_ix[0:3, k]), dp_fd, atol=2e-5, err_msg=name)
        if k == 2:
            dq_fd = np.asarray(so3.quat_log(so3.quat_mul(so3.quat_conj(pre.delta_q), pre2.delta_q))) / eps
            np.testing.assert_allclose(np.asarray(pre.jacobian_ix[3:6, 2]), dq_fd, atol=2e-5)


def test_wheel_straight_line():
    """Constant forward velocity, no rotation: delta_p = v*t along x."""
    K = 10
    dts = jnp.full((K,), 0.02, F64)
    vels = jnp.tile(jnp.array([[1.0, 0.0, 0.0]], F64), (K, 1))
    gyrs = jnp.zeros((K, 3), F64)
    valid = jnp.ones((K,), bool)
    pre = wheel_run(dts, vels, gyrs, valid, vels[0], gyrs[0], 1.0, 1.0, 1.0)
    np.testing.assert_allclose(pre.delta_p, [0.2, 0, 0], atol=1e-12)
    np.testing.assert_allclose(pre.delta_q, [1, 0, 0, 0], atol=1e-12)


def test_wheel_residual_consistency():
    """The residual of poses consistent with the preintegrated delta is zero."""
    rng = np.random.default_rng(4)
    K = 15
    dts = jnp.full((K,), 0.01, F64)
    vels = jnp.concatenate(
        [jnp.asarray(rng.normal(size=(K, 2)), F64) * 0.3 + jnp.array([1.0, 0.0], F64),
         jnp.zeros((K, 1), F64)], axis=1
    )
    gyrs = jnp.asarray(rng.normal(size=(K, 3)), F64) * 0.2
    valid = jnp.ones((K,), bool)
    pre = wheel_run(dts, vels, gyrs, valid, vels[0], gyrs[0], 1.0, 1.0, 1.0)

    from ground_fusion_tpu.geometry import se3

    ex_io = se3.pose_identity(F64)  # wheel frame == body frame
    pose_i = se3.pose(jnp.asarray(rng.normal(size=3), F64),
                      so3.quat_normalize(jnp.asarray(rng.normal(size=4), F64)))
    # pose_j consistent with delta: Tj = Ti * delta
    delta = se3.pose(pre.delta_p, pre.delta_q)
    pose_j = se3.pose_compose(pose_i, delta)
    dp, dq = pwheel.wheel_corrected_delta(pre, pre.linearized_sx, pre.linearized_sy, pre.linearized_sw, pre.linearized_td)
    r = pwheel.wheel_residual_from_delta(pose_i, pose_j, ex_io, dp, dq)
    np.testing.assert_allclose(r, 0.0, atol=1e-10)
