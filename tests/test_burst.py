"""Burst/replay mode: K scanned window steps in one dispatch must reproduce
the sequential per-step program (the bench.py and offline-replay hot path)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ground_fusion_tpu.config import Config
from ground_fusion_tpu.estimator.step import (
    StepFlags,
    make_window_burst,
    make_window_step,
)


def _small_cfg():
    cfg = Config()
    return dataclasses.replace(
        cfg,
        solver=dataclasses.replace(cfg.solver, max_landmarks=32, max_iters=4),
    )


def _filled_core(cfg):
    from __graft_entry__ import _example_core_and_flags

    core, flags = _example_core_and_flags(cfg, jnp.float32)
    ml, f = cfg.solver.max_landmarks, cfg.num_frames
    rng = np.random.default_rng(0)
    obs = np.zeros(core.tracks.obs.shape, np.float32)
    obs[..., 0] = rng.normal(0.1, 0.02, obs.shape[:-1])
    obs[..., 1] = rng.normal(-0.05, 0.02, obs.shape[:-1])
    obs[..., 4] = 2.0
    tr = core.tracks._replace(
        active=jnp.ones(ml, bool),
        solve_ok=jnp.ones(ml, bool),
        obs=jnp.asarray(obs),
        obs_valid=jnp.ones((ml, f), bool),
        inv_depth=jnp.full((ml,), 0.5, jnp.float32),
    )
    ib = core.imu_buf._replace(
        dts=jnp.full_like(core.imu_buf.dts, 0.005),
        acc=core.imu_buf.acc.at[..., 2].set(9.805),
        valid=jnp.ones_like(core.imu_buf.valid),
    )
    wb = core.wheel_buf._replace(
        dts=jnp.full_like(core.wheel_buf.dts, 0.01),
        vel=core.wheel_buf.vel.at[..., 0].set(0.5),
        valid=jnp.ones_like(core.wheel_buf.valid),
    )
    return core._replace(tracks=tr, imu_buf=ib, wheel_buf=wb), flags


def test_pipeline_burst_replay_matches_per_frame():
    """Full host-pipeline replay with enable_burst(): the burst-ingest scanned
    program (on-device measurement writes + window step, K per dispatch) must
    reproduce the per-frame-dispatch trajectory."""
    from tests.test_pipeline import run_pipeline
    from ground_fusion_tpu.utils.evaluate import ate_rmse

    est_a, gt = run_pipeline(n_frames=24)
    est_b, _ = run_pipeline(n_frames=24, burst=5)

    assert len(est_b.trajectory) == len(est_a.trajectory)
    xyz_a = np.stack([p[0:3] for _, p in est_a.trajectory])
    xyz_b = np.stack([p[0:3] for _, p in est_b.trajectory])
    # identical inputs, identical math modulo XLA fusion differences
    np.testing.assert_allclose(xyz_b, xyz_a, atol=1e-3)
    gt_xyz = np.stack([gt[t][0:3] for t, _ in est_b.trajectory])
    assert ate_rmse(xyz_b, gt_xyz) < 0.05


def test_pipeline_live_mode_matches_per_frame():
    """LIVE/latency mode (enable_live = one fused ingest+step dispatch + one
    batched fetch per frame, host served from mirrors) must reproduce the
    per-frame pytree path exactly (VERDICT r4 #3)."""
    from tests.test_pipeline import run_pipeline
    from ground_fusion_tpu.utils.evaluate import ate_rmse

    est_a, gt = run_pipeline(n_frames=22)
    est_l, _ = run_pipeline(n_frames=22, burst=1)   # chunk=1 == enable_live

    assert len(est_l.trajectory) == len(est_a.trajectory)
    # live mode never leaves frames staged: every frame flushed immediately
    assert est_l._burst_xs == []
    assert all(s == 1 for s in est_l._burst_flushed_sizes)
    xyz_a = np.stack([p[0:3] for _, p in est_a.trajectory])
    xyz_l = np.stack([p[0:3] for _, p in est_l.trajectory])
    np.testing.assert_allclose(xyz_l, xyz_a, atol=1e-3)
    gt_xyz = np.stack([gt[t][0:3] for t, _ in est_l.trajectory])
    assert ate_rmse(xyz_l, gt_xyz) < 0.05


def test_pipeline_burst_with_lines_matches_per_frame():
    """Burst replay with ``use_line``: the line-landmark ingest (slot
    permutation writes + scrubs) scanned on device must reproduce the
    per-frame line pipeline."""
    from ground_fusion_tpu.pipeline import Estimator, FrameFeature
    from ground_fusion_tpu.sim.synthetic import (
        SimParams, body_T_cam, gt_pose7, imu_sample, make_landmarks,
        make_segments, project_landmarks, project_segments, wheel_sample,
    )

    DT = jnp.float64
    ex = body_T_cam(DT)
    exn = np.asarray(ex)
    cfg = Config(use_line=True)
    cfg = dataclasses.replace(
        cfg,
        lines=dataclasses.replace(cfg.lines, max_lines=8, min_obs=4),
        solver=dataclasses.replace(cfg.solver, max_landmarks=64, max_iters=4),
        camera=dataclasses.replace(
            cfg.camera, t_ic=tuple(exn[0:3]), q_ic=tuple(exn[3:7])),
    )
    sp = SimParams()
    pts_w = jnp.asarray(make_landmarks(100, sp, seed=1), DT)
    segs_w = jnp.asarray(make_segments(6, sp, seed=2), DT)

    def run(burst):
        est = Estimator(cfg, dtype=DT)
        if burst:
            est.enable_burst(burst)
        frame_dt = 1.0 / sp.frame_rate
        imu_dt = 1.0 / sp.imu_rate
        wheel_dt = 1.0 / sp.wheel_rate
        a, g = np.asarray(imu_sample(0.0, sp), dtype=np.float64)
        est.input_imu(0.0, a, g)
        v, wg = np.asarray(wheel_sample(0.0, sp), dtype=np.float64)
        est.input_wheel(0.0, v, wg)
        for k in range(18):
            t = k * frame_dt
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
        if burst:
            est.flush_burst()
        return est

    est_a = run(0)
    est_b = run(4)
    assert len(est_b.trajectory) == len(est_a.trajectory)
    xyz_a = np.stack([p[0:3] for _, p in est_a.trajectory])
    xyz_b = np.stack([p[0:3] for _, p in est_b.trajectory])
    np.testing.assert_allclose(xyz_b, xyz_a, atol=1e-3)
    # the line tables agree slot-for-slot (the robot has circled past most
    # segments by the end of the short run, so only ~1 slot is still active)
    act_a = np.asarray(est_a.core.lines.active)
    act_b = np.asarray(est_b.core.lines.active)
    np.testing.assert_array_equal(act_b, act_a)
    assert act_a.sum() >= 1
    np.testing.assert_allclose(
        np.asarray(est_b.core.lines.orth)[act_b],
        np.asarray(est_a.core.lines.orth)[act_a], atol=2e-3)


def test_batched_fleet_replay_matches_per_sequence():
    """make_window_burst_batched: B cores advanced in lockstep must match B
    independent single-sequence bursts."""
    from ground_fusion_tpu.estimator.step import make_window_burst_batched

    cfg = _small_cfg()
    burst, _ = make_window_burst_batched(cfg)
    single, _ = make_window_burst(cfg)

    B, K = 3, 4
    cores, fb_list = [], []
    for b in range(B):
        core, flags = _filled_core(cfg)
        # decorrelate the sequences: scale depths / observations per b
        core = core._replace(tracks=core.tracks._replace(
            inv_depth=core.tracks.inv_depth * (1.0 + 0.1 * b)))
        margs = jnp.asarray([(k + b) % 2 == 0 for k in range(K)])
        fb = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (K,) + jnp.shape(a)), flags
        )._replace(marg_old=margs)
        cores.append(core)
        fb_list.append(fb)

    cores_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cores)
    fb_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=1), *fb_list)

    cb, ob = burst(cores_b, fb_b)
    for b in range(B):
        cs, os_ = single(cores[b], fb_list[b])
        # vmapped kernels reassociate reductions, so a solve sitting on a
        # trust-region accept/reject boundary can transiently diverge a few
        # 1e-3 mid-chunk before the next solves re-attract it to the same
        # optimum (observed: 4.6e-3 at k=1 → 1.3e-4 by k=3). Assert the
        # trajectory loosely and the end-of-chunk state tightly.
        np.testing.assert_allclose(
            np.asarray(os_["pose"]), np.asarray(ob["pose"][:, b]),
            rtol=1e-2, atol=1e-2,
        )
        np.testing.assert_allclose(
            np.asarray(cs.state.poses), np.asarray(cb.state.poses[b]),
            rtol=1e-3, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(cs.tracks.inv_depth), np.asarray(cb.tracks.inv_depth[b]),
            rtol=1e-3, atol=2e-3,
        )
        np.testing.assert_array_equal(
            np.asarray(cs.wheel_buf.bad), np.asarray(cb.wheel_buf.bad[b]))


def test_burst_equals_sequential():
    cfg = _small_cfg()
    step, _ = make_window_step(cfg)
    burst, _ = make_window_burst(cfg)
    core, flags = _filled_core(cfg)

    K = 5
    # vary the per-step flags (alternate slide branches) so the scan really
    # carries per-step inputs, like a dataset replay would
    margs = jnp.asarray([True, False, True, True, False])
    flags_batch = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (K,) + jnp.shape(a)), flags
    )._replace(marg_old=margs)

    c_seq = core
    outs_seq = []
    for k in range(K):
        fl = jax.tree_util.tree_map(lambda a: a[k], flags_batch)
        c_seq, out = step(c_seq, fl)
        outs_seq.append(out)

    c_b, outs_b = burst(core, flags_batch)

    # XLA compiles the scanned and standalone programs with different fusion/
    # reassociation, so f32 results drift ~1e-4 per step through the iterative
    # solver; assert equivalence at physically-meaningful tolerances instead
    # of bitwise equality. The marginalization prior's square-root factor
    # (J0, r0) is an eigendecomposition square root — unique only up to an
    # orthogonal transform, and discontinuous under tiny input perturbations —
    # so compare its INVARIANTS (information matrix J0ᵀJ0 and information
    # vector J0ᵀr0) rather than the raw factor.
    seq_d, b_d = c_seq._asdict(), c_b._asdict()
    for name in seq_d:
        if name == "prior":
            continue
        for a, b in zip(jax.tree_util.tree_leaves(seq_d[name]),
                        jax.tree_util.tree_leaves(b_d[name])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=2e-3)
    L_seq = np.asarray(c_seq.prior.J0, np.float64)
    L_b = np.asarray(c_b.prior.J0, np.float64)
    info_seq = L_seq.T @ L_seq
    info_b = L_b.T @ L_b
    scale = max(np.abs(info_seq).max(), 1.0)
    np.testing.assert_allclose(info_b, info_seq, atol=2e-3 * scale)
    # the information vector amplifies the (tolerated) state drift through Λ:
    # |Δg| ≲ |Λ|·|Δx|, so its tolerance scales with the information magnitude
    g_seq = L_seq.T @ np.asarray(c_seq.prior.r0, np.float64)
    g_b = L_b.T @ np.asarray(c_b.prior.r0, np.float64)
    np.testing.assert_allclose(g_b, g_seq, atol=2e-3 * scale)
    np.testing.assert_array_equal(np.asarray(c_seq.prior.valid),
                                  np.asarray(c_b.prior.valid))
    for a, b in zip(jax.tree_util.tree_leaves(c_seq.prior.lin),
                    jax.tree_util.tree_leaves(c_b.prior.lin)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-3)
    for k in range(K):
        np.testing.assert_allclose(
            np.asarray(outs_seq[k]["pose"]), np.asarray(outs_b["pose"][k]),
            rtol=1e-3, atol=1e-3,
        )


def test_burst_per_frame_failure_truncates_and_reboots():
    """Failure detection runs per frame INSIDE the chunk (VERDICT r3 weak
    #6): a failing frame mid-chunk must truncate the flushed trajectory at
    that frame and reboot, matching the reference's every-frame
    failureDetection -> clearState (estimator.cpp:1140-1148, 2847-2888).
    Frames are staged under the default config, then the chunk is flushed
    through a burst program whose bias threshold sits below estimation
    noise — every scanned step reports failed, so the flush must emit no
    odometry and reboot."""
    import dataclasses
    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    import numpy as np
    from test_pipeline import run_pipeline
    from ground_fusion_tpu.config import Config
    from ground_fusion_tpu.estimator.step import make_window_burst_ingest
    from ground_fusion_tpu.pipeline import FrameFeature
    from ground_fusion_tpu.sim.synthetic import (
        SimParams, body_T_cam, gt_pose7, imu_sample, make_landmarks,
        project_landmarks, wheel_sample,
    )

    est, gt = run_pipeline(n_frames=20, burst=50)   # run_pipeline flushes
    # stage 4 more frames (chunk 50 -> they stay staged)
    import jax.numpy as jnp2

    sp = SimParams(pix_noise=0.0, seed=0)
    ex = body_T_cam(est.dtype)
    pts_w = jnp2.asarray(make_landmarks(200, sp, seed=1), est.dtype)
    frame_dt, imu_dt, wheel_dt = 1/sp.frame_rate, 1/sp.imu_rate, 1/sp.wheel_rate
    for k in range(20, 24):
        t = k * frame_dt
        tp = t - frame_dt
        for ti in np.arange(tp + imu_dt, t + 0.5*imu_dt, imu_dt):
            a, g = np.asarray(imu_sample(float(ti), sp), np.float64)
            est.input_imu(float(ti), a, g)
        for ti in np.arange(tp + wheel_dt, t + 0.5*wheel_dt, wheel_dt):
            v, w = np.asarray(wheel_sample(float(ti), sp), np.float64)
            est.input_wheel(float(ti), v, w)
        uv, z, vis = project_landmarks(gt_pose7(t, sp), ex, pts_w)
        uv, z, vis = np.asarray(uv), np.asarray(z), np.asarray(vis)
        feats = {int(i): FrameFeature(x=float(uv[i,0]), y=float(uv[i,1]),
                                      depth=float(z[i]))
                 for i in np.nonzero(vis)[0]}
        est.input_frame(t, feats)
    assert len(est._burst_xs) == 4, "frames did not stage"
    n_before = len(est.trajectory)

    # flush through a burst program with a sub-noise failure threshold:
    # the first scanned step already trips it
    cfg_tight = dataclasses.replace(
        est.cfg, solver=dataclasses.replace(est.cfg.solver,
                                            fail_bg_thresh=1e-7))
    est._burst_fn, _ = make_window_burst_ingest(cfg_tight)
    out = est.flush_burst()
    assert out is None
    assert len(est.trajectory) == n_before, "failed frames leaked odometry"
    assert est.solver_flag == est.INITIAL and est.reboots == 1


def test_packed_step_matches_pytree():
    """Latency-mode packed dispatch: the 3-blob program is numerically
    identical to the pytree program (same compiled math, different argument
    marshalling — measured 3.6x live dispatch on the TPU tunnel)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ground_fusion_tpu.config import Config
    from ground_fusion_tpu.estimator.assembly import empty_prior
    from ground_fusion_tpu.estimator.step import (
        EstimatorCore, StepFlags, make_window_step, make_window_step_packed,
    )
    from ground_fusion_tpu.sim.synthetic import SimParams, build_window_problem

    cfg = Config()
    sp = SimParams()
    step, layout = make_window_step(cfg)
    prob = build_window_problem(cfg, sp, dtype=jnp.float64)
    f = cfg.num_frames
    core = EstimatorCore(
        state=prob["state"], tracks=prob["tracks"], imu_buf=prob["imu_buf"],
        wheel_buf=prob["wheel_buf"], prior=empty_prior(layout, f, jnp.float64),
    )
    pstep, pack, unpack, _ = make_window_step_packed(cfg, core)
    flags = StepFlags(
        marg_old=jnp.asarray(True), stationary=jnp.asarray(False),
        wheel_valid=prob["interval_valid"], imu_valid=prob["interval_valid"],
        td_obs=jnp.zeros(f, jnp.float64),
        frame_dts=jnp.asarray(np.diff(prob["ts"], prepend=prob["ts"][0])),
        propagate_newest=jnp.asarray(False),
    )
    c1, o1 = step(core, flags)
    blobs = jax.jit(pack)(core)
    # codec round trip is exact
    core_rt = unpack(blobs)
    for a, b in zip(jax.tree_util.tree_leaves(core_rt),
                    jax.tree_util.tree_leaves(core)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    pb, o2 = pstep(blobs, flags)
    np.testing.assert_allclose(np.asarray(o2["pose"]), np.asarray(o1["pose"]),
                               atol=1e-12)
    c2 = unpack(pb)
    np.testing.assert_allclose(np.asarray(c2.state.poses),
                               np.asarray(c1.state.poses), atol=1e-12)
    np.testing.assert_allclose(np.asarray(c2.tracks.inv_depth),
                               np.asarray(c1.tracks.inv_depth), atol=1e-12)


def test_packed_codec_rejects_mixed_dtype_family():
    """A core mixing f32/f64 leaves would silently round-trip through the
    first leaf's dtype; the codec must refuse to build instead."""
    import jax.numpy as jnp
    import pytest

    from ground_fusion_tpu.estimator.step import make_packed_codec

    with pytest.raises(TypeError, match="mixes"):
        make_packed_codec({"a": jnp.zeros(3, jnp.float64),
                           "b": jnp.zeros(3, jnp.float32)})
