"""Line landmarks in the sliding-window BA (estimator/lines.py).

Covers the reference's use_line estimator path: triangulateLine
(feature_manager.cpp:1151-1315), onlyLineOpt (estimator.cpp:4202-4270),
optimizationwithLine's line factor blocks (estimator.cpp:4500-4537), frame-0
line marginalization (estimator.cpp:4680-4712) and the line slide ops.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ground_fusion_tpu.config import Config
from ground_fusion_tpu.estimator.layout import StateLayout
from ground_fusion_tpu.estimator.lines import (
    LineTracks,
    empty_line_tracks,
    line_residuals,
    linearize_lines,
    only_line_opt,
    plk_cam_to_world,
    remove_line_outliers,
    slide_new_lines,
    slide_old_lines,
    triangulate_lines,
)
from ground_fusion_tpu.estimator.window import empty_state
from ground_fusion_tpu.frontend.lines import (
    line_residual_raw,
    orth_to_plk,
    plk_to_orth,
    plk_transform,
)
from ground_fusion_tpu.geometry.se3 import pose_boxplus, pose_compose
from ground_fusion_tpu.geometry.so3 import quat_to_mat


F = 6          # frames
LL = 4         # line slots


def _world_lines(rng):
    """Generic 3D segments in front of the trajectory (z ∈ [2, 4])."""
    a = jnp.asarray(rng.uniform(-1.5, 1.5, (LL, 3)), jnp.float32)
    a = a.at[:, 2].set(jnp.asarray(rng.uniform(2.0, 4.0, LL), jnp.float32))
    d = jnp.asarray(rng.normal(size=(LL, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    b = a + 1.5 * d
    return a, b


def _scene(rng, noise=0.0):
    """Poses along +x with small attitude wiggle; project segment endpoints
    into each camera's normalized plane (ex_cam = identity)."""
    state = empty_state(F, jnp.float32)
    poses = []
    for k in range(F):
        dp = jnp.asarray([0.3 * k, 0.02 * k, 0.01 * k], jnp.float32)
        dth = jnp.asarray(rng.normal(scale=0.02, size=3), jnp.float32)
        poses.append(pose_boxplus(
            jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32),
            jnp.concatenate([dp, dth])))
    state = state._replace(poses=jnp.stack(poses))

    A, B = _world_lines(rng)
    obs = np.zeros((LL, F, 4), np.float32)
    for l in range(LL):
        for k in range(F):
            cam = pose_compose(state.poses[k], state.ex_cam)
            R = quat_to_mat(cam[3:7])
            t = cam[0:3]
            pa = R.T @ (A[l] - t)
            pb = R.T @ (B[l] - t)
            obs[l, k] = [pa[0] / pa[2], pa[1] / pa[2], pb[0] / pb[2], pb[1] / pb[2]]
    obs = jnp.asarray(obs) + noise * jnp.asarray(rng.normal(size=(LL, F, 4)), jnp.float32)

    # ground-truth plücker: n = A × B, v = B − A in world, expressed in the
    # anchor (frame 0) camera — the LINEINCAM parameterization
    v = B - A
    n = jnp.cross(A, B)
    plk_w = jnp.concatenate([n, v], axis=-1)
    cam0 = pose_compose(state.poses[0], state.ex_cam)
    plk_c0 = plk_transform(plk_w, cam0[3:7], cam0[0:3])
    orth_gt = plk_to_orth(plk_c0)

    lines = empty_line_tracks(LL, F)._replace(
        active=jnp.ones(LL, bool),
        obs=obs,
        obs_valid=jnp.ones((LL, F), bool),
    )
    return state, lines, orth_gt


def test_gt_line_zero_residual():
    rng = np.random.default_rng(0)
    state, lines, orth_gt = _scene(rng)
    lines = lines._replace(orth=orth_gt, solve_ok=jnp.ones(LL, bool))
    r = line_residuals(state, lines, 1.0, 1.0)
    assert float(jnp.max(jnp.abs(r))) < 1e-4


def test_linearize_lines_fd_jacobian():
    """Analytic (jacfwd) rows vs finite differences over a joint perturbation
    of anchor pose, target pose, extrinsic and orth — the reference's own
    (disabled) check methodology, on the incamera factor."""
    from ground_fusion_tpu.estimator.lines import line_residual_cam

    rng = np.random.default_rng(1)
    state, lines, orth_gt = _scene(rng)
    orth = orth_gt + 0.01 * jnp.asarray(rng.normal(size=(LL, 4)), jnp.float32)
    lines = lines._replace(orth=orth, solve_ok=jnp.ones(LL, bool))

    pose_i = state.poses[0]
    pose_j = state.poses[2]
    ex = state.ex_cam
    o = lines.orth[1]
    ob = lines.obs[1, 2]

    def r_of(d):
        return line_residual_cam(
            pose_boxplus(pose_i, d[0:6]), pose_boxplus(pose_j, d[6:12]),
            pose_boxplus(ex, d[12:18]), o + d[18:22], ob,
        )

    J = jax.jacfwd(r_of)(jnp.zeros(22, jnp.float32))
    eps = 1e-4
    for i in range(22):
        dp = jnp.zeros(22, jnp.float32).at[i].set(eps)
        fd = (r_of(dp) - r_of(-dp)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J[:, i]), np.asarray(fd),
                                   rtol=2e-2, atol=2e-3)

    # anchor observation: pose/extrinsic columns must cancel (instartframe)
    def r_anchor(d):
        return line_residual_cam(
            pose_boxplus(pose_i, d[0:6]), pose_boxplus(pose_i, d[0:6]),
            pose_boxplus(ex, d[6:12]), o + d[12:16], lines.obs[1, 0],
        )

    Ja = jax.jacfwd(r_anchor)(jnp.zeros(16, jnp.float32))
    assert float(jnp.max(jnp.abs(Ja[:, 0:12]))) < 1e-4


def test_triangulate_lines_recovers_geometry():
    rng = np.random.default_rng(2)
    state, lines, orth_gt = _scene(rng)
    out = triangulate_lines(state, lines, min_obs=3, min_cos_theta=0.9999)
    assert bool(jnp.all(out.solve_ok))
    # triangulated lines must reproject onto the observations
    r = line_residuals(state, out, 1.0, 1.0, min_obs=3)
    assert float(jnp.max(jnp.abs(r))) < 5e-3


def test_only_line_opt_refines_perturbed_lines():
    rng = np.random.default_rng(3)
    state, lines, orth_gt = _scene(rng)
    orth0 = orth_gt + 0.02 * jnp.asarray(rng.normal(size=(LL, 4)), jnp.float32)
    lines = lines._replace(orth=orth0, solve_ok=jnp.ones(LL, bool))
    c0 = float(jnp.sum(line_residuals(state, lines, 1.0, 1.0, min_obs=3) ** 2))
    out = only_line_opt(state, lines, 1.0, min_obs=3, iters=8)
    c1 = float(jnp.sum(line_residuals(state, out, 1.0, 1.0, min_obs=3) ** 2))
    assert c1 < 0.05 * c0


def test_remove_line_outliers_kills_bogus_lines():
    rng = np.random.default_rng(4)
    state, lines, orth_gt = _scene(rng)
    bad = orth_gt.at[0].add(jnp.asarray([0.5, -0.4, 0.3, 0.2], jnp.float32))
    lines = lines._replace(orth=bad, solve_ok=jnp.ones(LL, bool))
    out = remove_line_outliers(state, lines, min_obs=3, max_reproj=3.0 / 460.0)
    assert not bool(out.solve_ok[0])
    assert bool(jnp.all(out.solve_ok[1:]))


def test_slide_ops():
    rng = np.random.default_rng(5)
    state, lines, orth_gt = _scene(rng)
    lines = lines._replace(
        orth=orth_gt, solve_ok=jnp.ones(LL, bool),
        start_frame=jnp.asarray([0, 1, 0, 2], jnp.int32),
        obs_valid=lines.obs_valid.at[1, 0].set(False),
    )
    old = slide_old_lines(state, lines)
    assert old.obs.shape == lines.obs.shape
    assert int(old.start_frame[1]) == 0
    np.testing.assert_array_equal(np.asarray(old.obs[0, :-1]), np.asarray(lines.obs[0, 1:]))
    assert not bool(old.obs_valid[0, -1])
    # frame-0-anchored solved lines re-express in frame 1's camera and must
    # still reproject exactly after the roll (exact frame change)
    lines00 = lines._replace(start_frame=jnp.zeros(LL, jnp.int32))
    old00 = slide_old_lines(state, lines00)
    st1 = state._replace(poses=jnp.roll(state.poses, -1, axis=0)
                         .at[-1].set(state.poses[-1]))
    r = line_residuals(st1, old00, 1.0, 1.0, min_obs=3)
    assert float(jnp.max(jnp.abs(r))) < 1e-4

    # a line seen only at frame 0 dies on slide_old
    lonely = lines._replace(
        obs_valid=jnp.zeros((LL, F), bool).at[:, 0].set(True))
    assert not bool(slide_old_lines(state, lonely).active[0])

    new = slide_new_lines(lines)
    np.testing.assert_array_equal(np.asarray(new.obs[2, F - 2]), np.asarray(lines.obs[2, F - 1]))
    assert not bool(new.obs_valid[2, F - 1])


def test_window_solve_with_lines_improves_poses():
    """Joint solve: perturb poses, keep perfect line+point observations —
    the line factors must pull the window back (cost ↓ ≫)."""
    from ground_fusion_tpu.estimator.assembly import SolveInputs, empty_prior
    from ground_fusion_tpu.estimator.buffers import (
        empty_imu_buffer, empty_wheel_buffer,
        preintegrate_imu_window, preintegrate_wheel_window,
    )
    from ground_fusion_tpu.estimator.solver import SolverParams, solve_window
    from ground_fusion_tpu.preintegration.imu import noise_cov
    from ground_fusion_tpu.preintegration.wheel import wheel_noise_cov

    rng = np.random.default_rng(6)
    state_gt, lines, orth_gt = _scene(rng)
    lines = triangulate_lines(state_gt, lines, min_obs=3, min_cos_theta=0.9999)

    layout = StateLayout(F, 8, LL)
    dtype = jnp.float32
    # perturb poses 1..F-1 (frame 0 is the gauge)
    poses = state_gt.poses
    for k in range(1, F):
        poses = poses.at[k].set(pose_boxplus(
            poses[k],
            jnp.asarray(rng.normal(scale=0.01, size=6), dtype)))
    state0 = state_gt._replace(poses=poses)

    from ground_fusion_tpu.estimator.window import empty_tracks

    tracks = empty_tracks(8, F, dtype)
    imu_buf = empty_imu_buffer(F, 4, dtype)
    wheel_buf = empty_wheel_buffer(F, 4, dtype)
    n18 = noise_cov(0.1, 0.01, 1e-3, 1e-4, dtype)
    n12 = wheel_noise_cov(0.1, 0.02, dtype)
    free = np.ones(layout.total, np.float32)
    free[layout.ex_cam: layout.ex_cam + 6] = 0.0   # extrinsic fixed
    free[layout.td] = 0.0
    free[layout.ex_wheel: layout.nx] = 0.0
    inp = SolveInputs(
        imu_pre=preintegrate_imu_window(imu_buf, state0.sbs, n18),
        imu_valid=jnp.zeros(F, bool),
        wheel_pre=preintegrate_wheel_window(wheel_buf, state0.s_wheel, state0.td_wheel, n12),
        wheel_valid=jnp.zeros(F, bool),
        plane_valid=jnp.zeros(F, bool),
        td_obs=jnp.zeros(F, dtype),
        prior=empty_prior(layout, F, dtype),
        g=jnp.asarray([0, 0, 9.805], dtype),
        free_mask=jnp.asarray(free),
        lines=lines, line_min_obs=3,
    )
    params = SolverParams(
        sqrt_info_scale=jnp.asarray(460 / 1.5, dtype),
        cauchy_delta=jnp.asarray(1.0, dtype),
        plane_sqrt_info=jnp.asarray([100.0, 100.0, 100.0], dtype),
        lm_lambda0=jnp.asarray(1e-4, dtype),
        lm_up=jnp.asarray(3.0, dtype),
        lm_down=jnp.asarray(1.0 / 3.0, dtype),
    )
    c0 = float(jnp.sum(line_residuals(state0, lines, 460 / 1.5, 1.0, min_obs=3) ** 2))
    st1, tr1, ln1, cost = solve_window(
        state0, tracks, inp, layout, params, num_iters=8, lines=lines)
    c1 = float(jnp.sum(line_residuals(st1, ln1, 460 / 1.5, 1.0, min_obs=3) ** 2))
    assert np.isfinite(float(cost))
    assert c1 < 0.05 * c0


def test_marginalize_old_with_lines_prior_sane():
    """Frame-0 line factors fold into the sqrt prior; the prior must stay
    finite and PSD, and must not touch landmark/line columns (camera block
    only)."""
    from ground_fusion_tpu.estimator.assembly import SolveInputs, empty_prior
    from ground_fusion_tpu.estimator.buffers import (
        empty_imu_buffer, empty_wheel_buffer,
        preintegrate_imu_window, preintegrate_wheel_window,
    )
    from ground_fusion_tpu.estimator.marginalization import marginalize_old
    from ground_fusion_tpu.estimator.window import empty_tracks
    from ground_fusion_tpu.preintegration.imu import noise_cov
    from ground_fusion_tpu.preintegration.wheel import wheel_noise_cov

    rng = np.random.default_rng(7)
    state, lines, orth_gt = _scene(rng)
    lines = lines._replace(orth=orth_gt, solve_ok=jnp.ones(LL, bool),
                           start_frame=jnp.zeros(LL, jnp.int32))

    layout = StateLayout(F, 8, LL)
    dtype = jnp.float32
    tracks = empty_tracks(8, F, dtype)
    imu_buf = empty_imu_buffer(F, 4, dtype)
    imu_buf = imu_buf._replace(
        dts=jnp.full_like(imu_buf.dts, 0.01),
        acc=imu_buf.acc.at[..., 2].set(9.805),
        valid=jnp.ones_like(imu_buf.valid),
    )
    wheel_buf = empty_wheel_buffer(F, 4, dtype)
    n18 = noise_cov(0.1, 0.01, 1e-3, 1e-4, dtype)
    n12 = wheel_noise_cov(0.1, 0.02, dtype)
    inp = SolveInputs(
        imu_pre=preintegrate_imu_window(imu_buf, state.sbs, n18),
        imu_valid=jnp.ones(F, bool),
        wheel_pre=preintegrate_wheel_window(wheel_buf, state.s_wheel, state.td_wheel, n12),
        wheel_valid=jnp.zeros(F, bool),
        plane_valid=jnp.zeros(F, bool),
        td_obs=jnp.zeros(F, dtype),
        prior=empty_prior(layout, F, dtype),
        g=jnp.asarray([0, 0, 9.805], dtype),
        free_mask=jnp.ones(layout.total, dtype),
        line_min_obs=3,
    )
    prior = marginalize_old(state, tracks, inp, layout, 460 / 1.5, 1.0,
                            jnp.asarray([100.0, 100.0, 100.0], dtype),
                            lines=lines)
    J0 = np.asarray(prior.J0)
    assert np.all(np.isfinite(J0))
    assert bool(prior.valid)
    H = J0.T @ J0
    evals = np.linalg.eigvalsh(0.5 * (H + H.T))
    # f32 sqrt-refactorization roundoff scales with the largest eigenvalue
    assert evals.min() > -1e-7 * max(evals.max(), 1.0)
    # prior spans only the camera block
    assert J0.shape == (layout.nx, layout.nx)


@pytest.mark.slow
def test_e2e_pipeline_with_lines():
    """Host pipeline with ``use_line``: stream synthetic points + line
    segments; line slots must fill, triangulate, and ATE must stay low
    (golden-replay analog of the reference's line-enabled runs)."""
    from ground_fusion_tpu.pipeline import Estimator, FrameFeature
    from ground_fusion_tpu.sim.synthetic import (
        SimParams, body_T_cam, gt_pose7, imu_sample, make_landmarks,
        make_segments, project_landmarks, project_segments, wheel_sample,
    )
    from ground_fusion_tpu.utils.evaluate import ate_rmse

    DT = jnp.float64
    ex = body_T_cam(DT)
    exn = np.asarray(ex)
    cfg = Config(use_line=True)
    cfg = dataclasses.replace(
        cfg,
        lines=dataclasses.replace(cfg.lines, max_lines=16, min_obs=4),
        # the estimator must know the rig's body_T_cam (setParameter,
        # estimator.cpp:168-211) — world-frame lines expose any mismatch
        camera=dataclasses.replace(
            cfg.camera, t_ic=tuple(exn[0:3]), q_ic=tuple(exn[3:7])),
    )
    sp = SimParams()
    est = Estimator(cfg, dtype=DT)
    pts_w = jnp.asarray(make_landmarks(200, sp, seed=1), DT)
    segs_w = jnp.asarray(make_segments(12, sp, seed=2), DT)

    frame_dt = 1.0 / sp.frame_rate
    imu_dt = 1.0 / sp.imu_rate
    wheel_dt = 1.0 / sp.wheel_rate
    t0 = 0.0
    a, g = np.asarray(imu_sample(t0, sp), dtype=np.float64)
    est.input_imu(t0, a, g)
    v, wg = np.asarray(wheel_sample(t0, sp), dtype=np.float64)
    est.input_wheel(t0, v, wg)

    gt = []
    for k in range(30):
        t = t0 + k * frame_dt
        if k > 0:
            tp = t - frame_dt
            for ti in np.arange(tp + imu_dt, t + 0.5 * imu_dt, imu_dt):
                a, g = np.asarray(imu_sample(ti, sp), dtype=np.float64)
                est.input_imu(float(ti), a, g)
            for ti in np.arange(tp + wheel_dt, t + 0.5 * wheel_dt, wheel_dt):
                v, wg = np.asarray(wheel_sample(ti, sp), dtype=np.float64)
                est.input_wheel(float(ti), v, wg)
        uv, z, vis = project_landmarks(gt_pose7(t, sp), ex, pts_w)
        uv, z, vis = np.asarray(uv), np.asarray(z), np.asarray(vis)
        feats = {
            int(i): FrameFeature(x=float(uv[i, 0]), y=float(uv[i, 1]),
                                 depth=float(z[i]))
            for i in np.nonzero(vis)[0]
        }
        obs4, lvis = project_segments(gt_pose7(t, sp), ex, segs_w)
        obs4, lvis = np.asarray(obs4), np.asarray(lvis)
        line_obs = {int(i): obs4[i] for i in np.nonzero(lvis)[0]}
        est.input_frame(t, feats, line_obs=line_obs)
        gt.append((t, np.asarray(gt_pose7(t, sp))))
    gt = dict(gt)

    assert len(est.trajectory) >= 15, "estimator never left initialization"
    # line slots must be in use and some must have triangulated (the robot
    # circles past the segments, so only currently-visible slots stay active)
    ln = est.core.lines
    assert int(np.sum(np.asarray(ln.active))) >= 2
    assert int(np.sum(np.asarray(ln.active) & np.asarray(ln.solve_ok))) >= 1
    est_xyz = np.stack([p[0:3] for _, p in est.trajectory])
    gt_xyz = np.stack([gt[t][0:3] for t, _ in est.trajectory])
    ate = ate_rmse(est_xyz, gt_xyz)
    # the point-only replay reaches ~2e-4 m; anchor-camera lines with the
    # prior-valid warm-up gate match it (see estimator/lines.py docstring)
    assert ate < 0.02, f"ATE {ate:.4f} m with lines enabled"


def test_full_step_with_lines_compiles_and_runs():
    from ground_fusion_tpu.estimator.step import make_window_step
    from __graft_entry__ import _example_core_and_flags

    cfg = Config(use_line=True)
    cfg = dataclasses.replace(
        cfg,
        solver=dataclasses.replace(cfg.solver, window_size=F - 1, max_landmarks=8,
                                   max_imu_per_interval=4, max_wheel_per_interval=4),
        lines=dataclasses.replace(cfg.lines, max_lines=LL, min_obs=3),
    )
    step, layout = make_window_step(cfg)
    assert layout.max_lines == LL
    core, flags = _example_core_and_flags(cfg, jnp.float32)

    rng = np.random.default_rng(8)
    state, lines, orth_gt = _scene(rng)
    core = core._replace(state=state, lines=lines)
    out_core, out = step(core, flags)
    assert np.all(np.isfinite(np.asarray(out_core.state.poses)))
    assert np.all(np.isfinite(np.asarray(out_core.lines.orth)))
    assert out_core.lines.obs.shape == (LL, F, 4)
