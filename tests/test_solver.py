"""Solver-stack tests on the synthetic window problem.

Mirrors the reference's (disabled) verification methodology — residuals at
ground truth must vanish, perturbed states must re-converge — plus a
linear-Gaussian consistency check of the marginalization prior
(``integration_base.h:288-454`` check* methods; SURVEY §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ground_fusion_tpu.config import Config
from ground_fusion_tpu.estimator.assembly import (
    SolveInputs,
    assemble_rows,
    empty_prior,
    linearize_imu,
    linearize_visual,
    linearize_wheel,
    normal_equations,
)
from ground_fusion_tpu.estimator.layout import PER_FRAME, StateLayout
from ground_fusion_tpu.estimator.marginalization import marginalize_old
from ground_fusion_tpu.estimator.solver import SolverParams, solve_window
from ground_fusion_tpu.estimator.buffers import (
    preintegrate_imu_window,
    preintegrate_wheel_window,
)
from ground_fusion_tpu.estimator.window import retract
from ground_fusion_tpu.preintegration.imu import noise_cov
from ground_fusion_tpu.preintegration.wheel import wheel_noise_cov
from ground_fusion_tpu.sim.synthetic import SimParams, build_window_problem

DT = jnp.float64


@pytest.fixture(scope="module")
def problem():
    cfg = Config()
    sp = SimParams()
    prob = build_window_problem(cfg, sp, t_start=0.0, dtype=DT)
    layout = StateLayout(cfg.num_frames, cfg.solver.max_landmarks)
    n18 = noise_cov(cfg.imu.acc_n, cfg.imu.gyr_n, cfg.imu.acc_w, cfg.imu.gyr_w, DT)
    n12 = wheel_noise_cov(cfg.wheel.vel_n, cfg.wheel.gyr_n, DT)
    imu_pre = preintegrate_imu_window(prob["imu_buf"], prob["state"].sbs, n18)
    wheel_pre = preintegrate_wheel_window(
        prob["wheel_buf"], prob["state"].s_wheel, prob["state"].td_wheel, n12
    )
    g = jnp.array([0.0, 0.0, sp.g_norm], DT)
    return dict(cfg=cfg, sp=sp, layout=layout, imu_pre=imu_pre, wheel_pre=wheel_pre, g=g, **prob)


def test_imu_rows_zero_at_gt(problem):
    J, r = linearize_imu(
        problem["state"], problem["imu_pre"], problem["interval_valid"],
        problem["g"], problem["layout"],
    )
    # whitened residual of an exact trajectory should be ~0
    assert float(jnp.max(jnp.abs(r))) < 1e-3


def test_wheel_rows_zero_at_gt(problem):
    J, r = linearize_wheel(
        problem["state"], problem["wheel_pre"], problem["interval_valid"], problem["layout"]
    )
    assert float(jnp.max(jnp.abs(r))) < 1e-3


def test_visual_rows_zero_at_gt(problem):
    f = problem["cfg"].num_frames
    J, r = linearize_visual(
        problem["state"], problem["tracks"], jnp.zeros(f, DT), problem["layout"],
        sqrt_info_scale=jnp.asarray(460.0 / 1.5, DT), cauchy_delta=jnp.asarray(1.0, DT),
    )
    assert float(jnp.max(jnp.abs(r))) < 1e-6


def _solve_inputs(problem, free_mask):
    f = problem["cfg"].num_frames
    return SolveInputs(
        imu_pre=problem["imu_pre"],
        imu_valid=problem["interval_valid"],
        wheel_pre=problem["wheel_pre"],
        wheel_valid=problem["interval_valid"],
        plane_valid=jnp.zeros(f, bool),
        td_obs=jnp.zeros(f, DT),
        prior=empty_prior(problem["layout"], f, DT),
        g=problem["g"],
        free_mask=free_mask,
    )


def _params():
    return SolverParams(
        sqrt_info_scale=jnp.asarray(460.0 / 1.5, DT),
        cauchy_delta=jnp.asarray(1.0, DT),
        plane_sqrt_info=jnp.asarray([100.0, 100.0, 100.0], DT),
        lm_lambda0=jnp.asarray(1e-4, DT),
        lm_up=jnp.asarray(3.0, DT),
        lm_down=jnp.asarray(1.0 / 3.0, DT),
    )


def test_solver_recovers_perturbed_window(problem):
    """Perturb poses 2..F-1 + all depths; VIO factors must pull them back."""
    layout = problem["layout"]
    f = problem["cfg"].num_frames
    state_gt, tracks_gt = problem["state"], problem["tracks"]

    rng = np.random.default_rng(0)
    delta = np.zeros(layout.nx)
    for k in range(2, f):
        delta[PER_FRAME * k : PER_FRAME * k + 6] = rng.normal(0, 0.02, 6)
        delta[PER_FRAME * k + 6 : PER_FRAME * k + 9] = rng.normal(0, 0.02, 3)
    state0 = retract(state_gt, jnp.asarray(delta, DT), layout)
    tracks0 = tracks_gt._replace(
        inv_depth=tracks_gt.inv_depth * (1.0 + 0.1 * jnp.asarray(rng.normal(0, 1, tracks_gt.inv_depth.shape)))
    )

    free = np.ones(layout.total)
    free[: 2 * PER_FRAME] = 0.0                        # gauge: freeze frames 0, 1
    free[PER_FRAME * f : layout.nx] = 0.0              # calib frozen
    inp = _solve_inputs(problem, jnp.asarray(free, DT))

    state1, tracks1, cost = solve_window(state0, tracks0, inp, layout, _params(), num_iters=10)

    pos_err0 = float(jnp.max(jnp.abs(state0.poses[:, 0:3] - state_gt.poses[:, 0:3])))
    pos_err1 = float(jnp.max(jnp.abs(state1.poses[:, 0:3] - state_gt.poses[:, 0:3])))
    assert pos_err1 < 2e-3, f"pose error {pos_err1} (started {pos_err0})"
    dep_err1 = float(jnp.max(jnp.abs(
        jnp.where(tracks_gt.active, tracks1.inv_depth - tracks_gt.inv_depth, 0.0))))
    assert dep_err1 < 5e-3


def test_schur_linear_solver_matches_dense(problem):
    """DENSE_SCHUR-style block elimination (_solve_delta_schur) must produce
    the same Newton step as the full dense Cholesky — block elimination is
    algebraically exact."""
    from ground_fusion_tpu.estimator.assembly import assemble_rows, normal_equations
    from ground_fusion_tpu.estimator.solver import _solve_delta, _solve_delta_schur

    layout = problem["layout"]
    f = problem["cfg"].num_frames
    free = np.ones(layout.total)
    free[: 2 * PER_FRAME] = 0.0
    free[PER_FRAME * f : layout.nx] = 0.0
    inp = _solve_inputs(problem, jnp.asarray(free, DT))
    p = _params()
    J, r = assemble_rows(
        problem["state"], problem["tracks"], inp, layout,
        p.sqrt_info_scale, p.cauchy_delta, p.plane_sqrt_info,
    )
    H, g = normal_equations(J, r)
    lam = jnp.asarray(1e-4, DT)
    d_dense = _solve_delta(H, g, lam, inp.free_mask)
    d_schur = _solve_delta_schur(H, g, lam, inp.free_mask, layout)
    np.testing.assert_allclose(np.asarray(d_schur), np.asarray(d_dense),
                               rtol=1e-6, atol=1e-9)


def test_dogleg_recovers_perturbed_window(problem):
    """Same problem solved with the Powell dogleg strategy (ceres DOGLEG,
    estimator.cpp:3306) — must converge to the same answer as LM."""
    layout = problem["layout"]
    f = problem["cfg"].num_frames
    state_gt, tracks_gt = problem["state"], problem["tracks"]

    rng = np.random.default_rng(1)
    delta = np.zeros(layout.nx)
    for k in range(2, f):
        delta[PER_FRAME * k : PER_FRAME * k + 6] = rng.normal(0, 0.02, 6)
        delta[PER_FRAME * k + 6 : PER_FRAME * k + 9] = rng.normal(0, 0.02, 3)
    state0 = retract(state_gt, jnp.asarray(delta, DT), layout)
    tracks0 = tracks_gt._replace(
        inv_depth=tracks_gt.inv_depth
        * (1.0 + 0.1 * jnp.asarray(rng.normal(0, 1, tracks_gt.inv_depth.shape)))
    )

    free = np.ones(layout.total)
    free[: 2 * PER_FRAME] = 0.0
    free[PER_FRAME * f : layout.nx] = 0.0
    inp = _solve_inputs(problem, jnp.asarray(free, DT))

    state1, tracks1, cost = solve_window(
        state0, tracks0, inp, layout, _params(), num_iters=10, method="dogleg")

    pos_err1 = float(jnp.max(jnp.abs(state1.poses[:, 0:3] - state_gt.poses[:, 0:3])))
    assert pos_err1 < 2e-3, f"dogleg pose error {pos_err1}"
    dep_err1 = float(jnp.max(jnp.abs(
        jnp.where(tracks_gt.active, tracks1.inv_depth - tracks_gt.inv_depth, 0.0))))
    assert dep_err1 < 5e-3


def test_marginalization_matches_dense_schur(problem):
    """Linear-Gaussian check: the sqrt prior from ``marginalize_old`` must
    reproduce the dense Schur complement of the full normal equations over
    the frame-0-touching factor subset (marginalization_factor.cpp:278-302)."""
    layout = problem["layout"]
    cfg = problem["cfg"]
    f = cfg.num_frames
    state, tracks = problem["state"], problem["tracks"]
    free = np.ones(layout.total)
    free[PER_FRAME * f : layout.nx] = 0.0
    inp = _solve_inputs(problem, jnp.asarray(free, DT))

    prior = marginalize_old(
        state, tracks, inp, layout,
        sqrt_info_scale=jnp.asarray(460.0 / 1.5, DT),
        cauchy_delta=jnp.asarray(1.0, DT),
        plane_sqrt_info=jnp.asarray([100.0, 100.0, 100.0], DT),
    )
    H_prior = np.asarray(prior.J0.T @ prior.J0)

    # dense reference: assemble the same subset, eliminate depth cols of
    # anchored-at-0 landmarks + frame-0 block with plain linear algebra
    from ground_fusion_tpu.estimator.assembly import (
        linearize_imu as li, linearize_pose_anchor as la, linearize_visual as lv,
        linearize_wheel as lw,
    )
    only1 = jnp.arange(f) == 1
    Ji, ri = li(state, problem["imu_pre"], inp.imu_valid & only1, problem["g"], layout)
    Jw, rw = lw(state, problem["wheel_pre"], inp.wheel_valid & only1, layout)
    anchored0 = tracks.active & (tracks.start_frame == 0)
    Jv, rv = lv(state, tracks, inp.td_obs, layout,
                jnp.asarray(460.0 / 1.5, DT), jnp.asarray(1.0, DT), lm_filter=anchored0)
    # first marginalization has no prior → pose0 anchor seed
    # (estimator.cpp:3562-3570)
    Ja, ra = la(state, state.poses[0], jnp.asarray(True), layout)
    J = np.asarray(jnp.concatenate([Ji, Jw, Jv, Ja]) * inp.free_mask[None, :])
    r = np.asarray(jnp.concatenate([ri, rw, rv, ra]))

    H = J.T @ J
    b = J.T @ r
    nx = layout.nx
    # depth columns of anchored0 landmarks are the only nonzero landmark cols
    drop_cols = list(range(PER_FRAME)) + [
        nx + l for l in range(layout.max_landmarks)
        if bool(anchored0[l]) and np.abs(J[:, nx + l]).sum() > 0
    ]
    keep_cols = [c for c in range(nx) if c not in drop_cols]
    Hmm = H[np.ix_(drop_cols, drop_cols)]
    Hkm = H[np.ix_(keep_cols, drop_cols)]
    Hkk = H[np.ix_(keep_cols, keep_cols)]
    Hmm_inv = np.linalg.pinv(Hmm, rcond=1e-10)
    H_marg = Hkk - Hkm @ Hmm_inv @ Hkm.T

    # compare in the post-slide layout: old col c (c >= 15) -> c - 15 for
    # frame cols, calib cols shift to calib positions
    remap = {}
    for i, c in enumerate(keep_cols):
        if c < PER_FRAME * f:
            remap[i] = c - PER_FRAME
        else:
            remap[i] = c  # calib cols keep their positions in the new layout
    H_ref = np.zeros((nx, nx))
    for i, ci in remap.items():
        for j, cj in remap.items():
            H_ref[ci, cj] = H_marg[i, j]

    scale = max(1.0, np.abs(H_ref).max())
    assert np.max(np.abs(H_prior - H_ref)) / scale < 1e-6


def test_stereo_factors_zero_at_gt():
    """Stereo projection factors (two-cam variants) vanish on consistent
    geometry (projectionTwoFrameTwoCamFactor / OneFrameTwoCam)."""
    from ground_fusion_tpu.estimator.factors import proj12_factor, proj22_factor
    from ground_fusion_tpu.geometry.se3 import pose as make_pose, pose_apply, pose_apply_inv, pose_compose
    from ground_fusion_tpu.geometry.so3 import mat_to_quat, ypr_to_mat

    rng = np.random.default_rng(0)
    R = np.asarray(ypr_to_mat(jnp.asarray([0.1, -0.04, 0.02], DT)))
    pose_i = jnp.asarray(np.concatenate([[0.0, 0, 0], np.asarray(mat_to_quat(jnp.eye(3)))]), DT)
    pose_j = jnp.asarray(np.concatenate([[0.5, 0.1, 0.0],
                                         np.asarray(mat_to_quat(jnp.asarray(R)))]), DT)
    ex0 = jnp.asarray([0.0, 0, 0, 1, 0, 0, 0], DT)
    ex1 = jnp.asarray([0.1, 0.0, 0.0, 1, 0, 0, 0], DT)   # 10 cm baseline

    pt_w = jnp.asarray([0.3, -0.2, 4.0], DT)
    cam_i0 = pose_compose(pose_i, ex0)
    cam_j1 = pose_compose(pose_j, ex1)
    pc_i = pose_apply_inv(cam_i0, pt_w)
    pc_j = pose_apply_inv(cam_j1, pt_w)
    obs = jnp.concatenate([
        pc_i / pc_i[2], pc_j / pc_j[2], jnp.zeros(6, DT), jnp.zeros(2, DT)
    ])
    inv_dep = 1.0 / pc_i[2]

    r, J = proj22_factor(pose_i, pose_j, ex0, ex1, inv_dep, jnp.asarray(0.0, DT),
                         obs, jnp.asarray(460.0 / 1.5, DT))
    assert float(jnp.max(jnp.abs(r))) < 1e-9 and J.shape == (2, 26)

    pc_1 = pose_apply_inv(pose_compose(pose_i, ex1), pt_w)
    obs12 = jnp.concatenate([
        pc_i / pc_i[2], pc_1 / pc_1[2], jnp.zeros(6, DT), jnp.zeros(2, DT)
    ])
    r2, J2 = proj12_factor(ex0, ex1, inv_dep, jnp.asarray(0.0, DT), obs12,
                           jnp.asarray(460.0 / 1.5, DT))
    assert float(jnp.max(jnp.abs(r2))) < 1e-9 and J2.shape == (2, 14)
