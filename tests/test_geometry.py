"""Round-trip and closed-form checks for the SO(3)/SE(3) substrate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ground_fusion_tpu.geometry import so3, se3


def rand_quat(rng, n=()):
    q = rng.normal(size=n + (4,))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(q)


def test_quat_mul_vs_matrix():
    rng = np.random.default_rng(0)
    a, b = rand_quat(rng, (32,)), rand_quat(rng, (32,))
    m = so3.quat_to_mat(so3.quat_mul(a, b))
    m2 = so3.quat_to_mat(a) @ so3.quat_to_mat(b)
    np.testing.assert_allclose(m, m2, atol=1e-12)


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    q = rand_quat(rng, (16,))
    v = jnp.asarray(rng.normal(size=(16, 3)))
    np.testing.assert_allclose(
        so3.quat_rotate(q, v), jnp.einsum("nij,nj->ni", so3.quat_to_mat(q), v), atol=1e-12
    )


def test_mat_quat_roundtrip():
    rng = np.random.default_rng(2)
    q = rand_quat(rng, (64,))
    q2 = so3.mat_to_quat(so3.quat_to_mat(q))
    # sign-invariant comparison
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-9)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(3)
    phi = jnp.asarray(rng.normal(size=(64, 3)))
    # log is the short-arc inverse: restrict |phi| < pi
    phi = phi / jnp.linalg.norm(phi, axis=-1, keepdims=True) * jnp.asarray(
        rng.uniform(0.0, 3.1, size=(64, 1))
    )
    np.testing.assert_allclose(so3.quat_log(so3.quat_exp(phi)), phi, atol=1e-9)
    # tiny angles (Taylor branch)
    phi_small = jnp.asarray(rng.normal(size=(8, 3))) * 1e-9
    np.testing.assert_allclose(so3.quat_log(so3.quat_exp(phi_small)), phi_small, atol=1e-15)


def test_right_jacobian_finite_diff():
    rng = np.random.default_rng(4)
    phi = jnp.asarray(rng.normal(size=3))
    Jr = so3.right_jacobian_so3(phi)
    eps = 1e-7
    for k in range(3):
        dphi = jnp.zeros(3).at[k].set(eps)
        # exp(phi + d) ≈ exp(phi) exp(Jr d)
        lhs = so3.so3_exp_mat(phi + dphi)
        rhs = so3.so3_exp_mat(phi) @ so3.so3_exp_mat(Jr @ dphi)
        np.testing.assert_allclose(lhs, rhs, atol=1e-9)


def test_qleft_qright():
    rng = np.random.default_rng(5)
    a, b = rand_quat(rng), rand_quat(rng)
    np.testing.assert_allclose(so3.left_quat_prod_mat(a) @ b, so3.quat_mul(a, b), atol=1e-12)
    np.testing.assert_allclose(so3.right_quat_prod_mat(b) @ a, so3.quat_mul(a, b), atol=1e-12)


def test_ypr_roundtrip():
    rng = np.random.default_rng(6)
    ypr = jnp.asarray(rng.uniform(-1.0, 1.0, size=(32, 3)))
    np.testing.assert_allclose(so3.mat_to_ypr(so3.ypr_to_mat(ypr)), ypr, atol=1e-10)


def test_g2r_aligns_gravity_and_zero_yaw():
    rng = np.random.default_rng(7)
    g = jnp.asarray(rng.normal(size=3))
    g = g / jnp.linalg.norm(g) * 9.81
    R0 = so3.g2r(g)
    aligned = R0 @ (g / jnp.linalg.norm(g))
    np.testing.assert_allclose(aligned, [0, 0, 1], atol=1e-9)
    assert abs(float(so3.mat_to_ypr(R0)[0])) < 1e-9


def test_pose_compose_inverse():
    rng = np.random.default_rng(8)
    Ta = se3.pose(jnp.asarray(rng.normal(size=3)), rand_quat(rng))
    Tb = se3.pose(jnp.asarray(rng.normal(size=3)), rand_quat(rng))
    x = jnp.asarray(rng.normal(size=3))
    np.testing.assert_allclose(
        se3.pose_apply(se3.pose_compose(Ta, Tb), x),
        se3.pose_apply(Ta, se3.pose_apply(Tb, x)),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        se3.pose_apply(se3.pose_inverse(Ta), se3.pose_apply(Ta, x)), x, atol=1e-12
    )


def test_pose_boxplus_matches_manifold():
    rng = np.random.default_rng(9)
    T = se3.pose(jnp.asarray(rng.normal(size=3)), rand_quat(rng))
    d = jnp.asarray(rng.normal(size=6)) * 1e-3
    T2 = se3.pose_boxplus(T, d)
    np.testing.assert_allclose(se3.trans(T2), se3.trans(T) + d[:3], atol=1e-12)
    dq = so3.quat_mul(so3.quat_conj(se3.rot(T)), se3.rot(T2))
    np.testing.assert_allclose(so3.quat_log(dq), d[3:], atol=1e-8)
