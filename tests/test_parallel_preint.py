"""Parallel (associative-scan) preintegration must match the sequential scan
bit-for-bit up to float rounding, including masks, biases and Jacobians."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ground_fusion_tpu.preintegration.imu import noise_cov, preintegrate
from ground_fusion_tpu.preintegration.parallel import (
    preintegrate_parallel,
    preintegrate_wheel_parallel,
)
from ground_fusion_tpu.preintegration.wheel import preintegrate_wheel, wheel_noise_cov

DT = jnp.float64


def _imu_inputs(k=32, n_valid=None, seed=0):
    rng = np.random.default_rng(seed)
    n_valid = k if n_valid is None else n_valid
    dts = jnp.asarray(rng.uniform(0.004, 0.006, k), DT)
    accs = jnp.asarray(rng.normal(0, 1.0, (k, 3)) + np.array([0, 0, 9.8]), DT)
    gyrs = jnp.asarray(rng.normal(0, 0.5, (k, 3)), DT)
    valid = jnp.asarray(np.arange(k) < n_valid)
    acc0 = jnp.asarray(rng.normal(0, 1.0, 3) + np.array([0, 0, 9.8]), DT)
    gyr0 = jnp.asarray(rng.normal(0, 0.5, 3), DT)
    ba = jnp.asarray(rng.normal(0, 0.05, 3), DT)
    bg = jnp.asarray(rng.normal(0, 0.01, 3), DT)
    return dts, accs, gyrs, valid, acc0, gyr0, ba, bg


@pytest.mark.parametrize("n_valid", [32, 17, 1, 0])
def test_imu_parallel_matches_sequential(n_valid):
    inp = _imu_inputs(32, n_valid)
    n18 = noise_cov(0.1, 0.01, 0.001, 0.0001, DT)
    ref = preintegrate(*inp, n18)
    par = preintegrate_parallel(*inp, n18)
    np.testing.assert_allclose(par.delta_p, ref.delta_p, atol=1e-12)
    np.testing.assert_allclose(par.delta_q, ref.delta_q, atol=1e-12)
    np.testing.assert_allclose(par.delta_v, ref.delta_v, atol=1e-12)
    np.testing.assert_allclose(par.sum_dt, ref.sum_dt, atol=1e-15)
    np.testing.assert_allclose(par.jacobian, ref.jacobian, atol=1e-11)
    np.testing.assert_allclose(par.covariance, ref.covariance, atol=1e-11)


def test_imu_parallel_interleaved_mask():
    # non-prefix masks must also agree (last-valid gather semantics)
    dts, accs, gyrs, _, acc0, gyr0, ba, bg = _imu_inputs(16, seed=3)
    valid = jnp.asarray(np.array([1, 1, 0, 1, 0, 0, 1, 1, 1, 0, 1, 0, 0, 0, 1, 0], bool))
    n18 = noise_cov(0.1, 0.01, 0.001, 0.0001, DT)
    ref = preintegrate(dts, accs, gyrs, valid, acc0, gyr0, ba, bg, n18)
    par = preintegrate_parallel(dts, accs, gyrs, valid, acc0, gyr0, ba, bg, n18)
    np.testing.assert_allclose(par.delta_p, ref.delta_p, atol=1e-12)
    np.testing.assert_allclose(par.delta_q, ref.delta_q, atol=1e-12)
    np.testing.assert_allclose(par.covariance, ref.covariance, atol=1e-11)


@pytest.mark.parametrize("n_valid", [24, 9, 0])
def test_wheel_parallel_matches_sequential(n_valid):
    rng = np.random.default_rng(7)
    k = 24
    dts = jnp.asarray(rng.uniform(0.008, 0.012, k), DT)
    vels = jnp.asarray(rng.normal(0.5, 0.1, (k, 3)) * np.array([1, 0.05, 0.0]), DT)
    gyrs = jnp.asarray(rng.normal(0, 0.3, (k, 3)), DT)
    valid = jnp.asarray(np.arange(k) < n_valid)
    vel0 = jnp.asarray(rng.normal(0.5, 0.1, 3) * np.array([1, 0.05, 0.0]), DT)
    gyr0 = jnp.asarray(rng.normal(0, 0.3, 3), DT)
    sx = jnp.asarray(1.01, DT)
    sy = jnp.asarray(0.99, DT)
    sw = jnp.asarray(1.002, DT)
    td = jnp.asarray(0.0, DT)
    n12 = wheel_noise_cov(0.1, 0.02, DT)
    ref = preintegrate_wheel(dts, vels, gyrs, valid, vel0, gyr0, sx, sy, sw, td, n12)
    par = preintegrate_wheel_parallel(dts, vels, gyrs, valid, vel0, gyr0,
                                      sx, sy, sw, td, n12)
    np.testing.assert_allclose(par.delta_p, ref.delta_p, atol=1e-12)
    np.testing.assert_allclose(par.delta_q, ref.delta_q, atol=1e-12)
    np.testing.assert_allclose(par.covariance, ref.covariance, atol=1e-12)
    np.testing.assert_allclose(par.jacobian_ix, ref.jacobian_ix, atol=1e-10)
    np.testing.assert_allclose(par.vel_1, ref.vel_1, atol=0)
    np.testing.assert_allclose(par.gyr_1, ref.gyr_1, atol=0)
