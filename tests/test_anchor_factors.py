"""Anchor / prior factor library: finite-difference Jacobian checks.

Covers the reference's pose_anchor_factor.{h,cpp}, initial_pose_factor.h,
initial_bias_factor.h, pos_vel_factor.{hpp,cpp}, gnss_dt_anchor_factor.{hpp,
cpp} and the motion_factor.h stub (SURVEY §2 rows 9/10), using the
perturbation methodology of the reference's disabled check() methods.
"""

import jax.numpy as jnp
import numpy as np

from ground_fusion_tpu.estimator.factors import (
    POSE_ANCHOR_SQRT_INFO,
    initial_bias_factor,
    initial_pose_factor,
    motion_factor,
    pos_vel_factor,
    pose_anchor_factor,
    pose_anchor_residual_raw,
)
from ground_fusion_tpu.geometry.se3 import pose_boxplus
from ground_fusion_tpu.gnss.factors import dt_anchor_factor

DT = jnp.float64


def _rand_pose(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    return jnp.asarray(np.concatenate([rng.standard_normal(3), q]), DT)


def _fd(r_of, dim, eps=1e-6):
    z = np.zeros(dim)
    r0 = np.asarray(r_of(jnp.asarray(z, DT)))
    J = np.zeros((r0.shape[0], dim))
    for k in range(dim):
        d = z.copy()
        d[k] = eps
        J[:, k] = (np.asarray(r_of(jnp.asarray(d, DT))) - r0) / eps
    return r0, J


def test_pose_anchor_jacobian_and_zero_at_anchor():
    rng = np.random.default_rng(0)
    pose, anchor = _rand_pose(rng), _rand_pose(rng)
    r, J = pose_anchor_factor(pose, anchor)
    _, J_fd = _fd(
        lambda d: POSE_ANCHOR_SQRT_INFO
        * pose_anchor_residual_raw(pose_boxplus(pose, d), anchor),
        6,
    )
    np.testing.assert_allclose(np.asarray(J), J_fd, atol=1e-4)
    # anchored at itself → zero residual
    r0, _ = pose_anchor_factor(anchor, anchor)
    np.testing.assert_allclose(np.asarray(r0), 0.0, atol=1e-12)


def test_initial_pose_and_bias_factors():
    rng = np.random.default_rng(1)
    pose, init = _rand_pose(rng), _rand_pose(rng)
    r, J = initial_pose_factor(pose, init)
    assert r.shape == (6,) and J.shape == (6, 6)
    r0, _ = initial_pose_factor(init, init)
    np.testing.assert_allclose(np.asarray(r0), 0.0, atol=1e-9)

    sb = jnp.asarray(rng.standard_normal(9), DT)
    ba, bg = jnp.asarray(rng.standard_normal(3), DT), jnp.asarray(
        rng.standard_normal(3), DT
    )
    r, J = initial_bias_factor(sb, ba, bg)
    np.testing.assert_allclose(
        np.asarray(r), 1000.0 * np.concatenate([sb[3:6] - ba, sb[6:9] - bg]),
        rtol=1e-12,
    )
    # Jacobian: velocity columns zero, bias columns 1000·I
    Jn = np.asarray(J)
    np.testing.assert_allclose(Jn[:, 0:3], 0.0)
    np.testing.assert_allclose(Jn[:3, 3:6], 1000.0 * np.eye(3))
    np.testing.assert_allclose(Jn[3:, 6:9], 1000.0 * np.eye(3))


def test_pos_vel_factor_matches_reference_jacobians():
    rng = np.random.default_rng(2)
    pi, pj = _rand_pose(rng), _rand_pose(rng)
    si = jnp.asarray(rng.standard_normal(9), DT)
    sj = jnp.asarray(rng.standard_normal(9), DT)
    dt = 0.37
    r, J = pos_vel_factor(pi, pj, si, sj, dt)
    expect = 50.0 * (
        np.asarray(pj[:3]) - np.asarray(pi[:3])
        - 0.5 * (np.asarray(si[:3]) + np.asarray(sj[:3])) * dt
    )
    np.testing.assert_allclose(np.asarray(r), expect, rtol=1e-12)
    Jn = np.asarray(J)
    # pos_vel_factor.cpp:17-42 analytic blocks
    np.testing.assert_allclose(Jn[:, 0:3], -50.0 * np.eye(3), atol=1e-12)
    np.testing.assert_allclose(Jn[:, 6:9], 50.0 * np.eye(3), atol=1e-12)
    np.testing.assert_allclose(Jn[:, 12:15], -0.5 * dt * 50.0 * np.eye(3), atol=1e-9)
    np.testing.assert_allclose(Jn[:, 21:24], -0.5 * dt * 50.0 * np.eye(3), atol=1e-9)
    # rotation columns vanish
    np.testing.assert_allclose(Jn[:, 3:6], 0.0, atol=1e-9)


def test_dt_anchor_and_motion_stub():
    r, J = dt_anchor_factor(jnp.asarray(0.002, DT))
    np.testing.assert_allclose(np.asarray(r), [2.0])
    np.testing.assert_allclose(np.asarray(J), [[1000.0]])

    rng = np.random.default_rng(3)
    r, J = motion_factor(_rand_pose(rng), _rand_pose(rng),
                         jnp.asarray(rng.standard_normal(9), DT))
    assert r.shape == (2,) and J.shape == (2, 21)
    np.testing.assert_allclose(np.asarray(r), 0.0)
    np.testing.assert_allclose(np.asarray(J), 0.0)


def test_linearize_pose_anchor_gating():
    from ground_fusion_tpu.config import Config
    from ground_fusion_tpu.estimator.assembly import linearize_pose_anchor
    from ground_fusion_tpu.estimator.layout import StateLayout
    from ground_fusion_tpu.estimator.window import empty_state

    cfg = Config()
    layout = StateLayout(cfg.num_frames, cfg.solver.max_landmarks)
    state = empty_state(cfg.num_frames, DT)
    anchor = jnp.asarray([0.1, -0.2, 0.05, 1.0, 0.0, 0.0, 0.0], DT)
    J, r = linearize_pose_anchor(state, anchor, jnp.asarray(True), layout)
    assert J.shape == (6, layout.total)
    assert np.any(np.asarray(J[:, :6]) != 0.0)
    np.testing.assert_allclose(np.asarray(J[:, 6:]), 0.0)
    J0, r0 = linearize_pose_anchor(state, anchor, jnp.asarray(False), layout)
    np.testing.assert_allclose(np.asarray(J0), 0.0)
    np.testing.assert_allclose(np.asarray(r0), 0.0)
