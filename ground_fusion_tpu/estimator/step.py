"""The fused per-keyframe window step — one jitted device program.

This is the TPU-native ``processImage`` → ``optimization`` → marginalize →
``slideWindow`` path (``estimator.cpp:843-1163, 2890-3795``) as a single pure
function: preintegrate all intervals, triangulate, LM-solve, re-anchor the
gauge, marginalize, slide. Both marginalization branches produce identical
pytree shapes, so the keyframe decision is a ``lax.cond`` and the whole step
compiles once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..preintegration.imu import noise_cov
from ..preintegration.wheel import wheel_noise_cov
from .assembly import MargPrior, SolveInputs
from .buffers import (
    ImuWindowBuffer,
    WheelWindowBuffer,
    preintegrate_imu_window,
    preintegrate_wheel_window,
    slide_new_imu_buffer,
    slide_new_wheel_buffer,
    slide_old_imu_buffer,
    slide_old_wheel_buffer,
)
from .layout import PER_FRAME, StateLayout
from .marginalization import marginalize_old, marginalize_second_new
from .solver import SolverParams, reanchor_yaw, solve_window
from .triangulation import triangulate_all
from .window import (
    Tracks,
    WindowState,
    slide_new_state,
    slide_new_tracks,
    slide_old_state,
    slide_old_tracks,
)


class StepFlags(NamedTuple):
    """Per-frame dynamic gates (the reference's anomaly/stationary booleans,
    ``estimator.cpp:629-654, 890-896``)."""

    marg_old: jax.Array        # bool — keyframe ⇒ MARGIN_OLD else MARGIN_SECOND_NEW
    stationary: jax.Array      # bool — freeze poses/speeds (estimator.cpp:3233-3263)
    wheel_valid: jax.Array     # [F] per-interval wheel gate (anomaly ⇒ False)
    imu_valid: jax.Array       # [F] per-interval IMU availability
    td_obs: jax.Array          # [F] td at capture per frame
    gnss_ready: jax.Array | None = None   # [] bool — GNSS-VI aligned
    frame_dts: jax.Array | None = None    # [F] Δt between adjacent frames
    propagate_newest: jax.Array | None = None  # [] bool — IMU-propagate the
                                          # fresh slot F-1 from F-2 before the
                                          # solve (processIMU, estimator.cpp:
                                          # 743-783); the slide leaves only a
                                          # copy of the previous pose there
    fix_yaw_enu: jax.Array | None = None  # [] bool — low-speed yaw freeze
                                          # (estimator.cpp:2904-2930)
    first_gnss_opt: jax.Array | None = None  # [] bool — first GNSS-enabled
                                          # solve anchors pose0 at its entry
                                          # value (estimator.cpp:2943-2951)


class EstimatorCore(NamedTuple):
    """Everything that persists across window steps."""

    state: WindowState
    tracks: Tracks
    imu_buf: ImuWindowBuffer
    wheel_buf: WheelWindowBuffer
    prior: MargPrior
    gnss_obs: object = None    # gnss.factors.GnssObsWindow when GNSS enabled
    lines: object = None       # estimator.lines.LineTracks when use_line


def base_free_mask(cfg: Config, layout: StateLayout) -> np.ndarray:
    """Static optimizability mask from config toggles (the reference's
    ``SetParameterBlockConstant`` calls for extrinsics/td/intrinsics,
    ``estimator.cpp:2953-3100``)."""
    m = np.ones(layout.total, np.float64)
    if not cfg.solver.estimate_extrinsic:
        m[layout.ex_cam : layout.ex_cam + 6] = 0.0
    if not cfg.solver.estimate_td:
        m[layout.td] = 0.0
    if not cfg.wheel.estimate_extrinsic:
        m[layout.ex_wheel : layout.ex_wheel + 6] = 0.0
    if not cfg.wheel.estimate_intrinsic:
        m[layout.s_wheel : layout.s_wheel + 3] = 0.0
    if not cfg.wheel.estimate_td:
        m[layout.td_wheel] = 0.0
    if not cfg.plane.enabled:
        m[layout.plane : layout.plane + 4] = 0.0
    if not cfg.gnss.enabled:
        m[layout.gnss_dt : layout.nx] = 0.0
    return m


def make_window_step(cfg: Config):
    """Build the jitted window step specialized on the static config."""
    step, layout = _build_step(cfg)
    # NOTE: buffer donation is deliberately off — freshly-initialized cores
    # legitimately alias zero-filled leaves (f(donate(a), donate(a)) trap).
    return jax.jit(step), layout


def make_packed_codec(template):
    """(pack, unpack) between a core pytree and THREE flat blobs (one per
    dtype family). Latency-mode dispatch optimization: pushing a ~50-leaf
    pytree through the host→device boundary costs ~3 µs of per-leaf argument
    handling; three flat buffers cut the live per-step overhead several-fold
    while the jitted program unpacks/repacks with free XLA slices/concats.
    The packed program is bit-identical to the pytree program
    (``tests/test_burst.py``/bench equivalence)."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    fam_of = {}
    for i, leaf in enumerate(leaves):
        d = jnp.asarray(leaf).dtype
        fam = ("f" if jnp.issubdtype(d, jnp.floating) else
               "b" if d == jnp.bool_ else "i")
        fam_of.setdefault(fam, []).append(i)
    fams = sorted(fam_of)                       # deterministic blob order
    fam_dtype = {f: jnp.asarray(leaves[fam_of[f][0]]).dtype for f in fams}
    for f in fams:
        # the blob round-trips every leaf through fam_dtype; a narrower blob
        # dtype would silently truncate wider leaves and break the
        # bit-identical guarantee — require dtype-uniform families
        mixed = {str(jnp.asarray(leaves[i]).dtype) for i in fam_of[f]}
        if len(mixed) > 1:
            raise TypeError(
                f"make_packed_codec: dtype family {f!r} mixes {sorted(mixed)}; "
                "packing would round-trip through one of them")
    shapes = [jnp.shape(l) for l in leaves]
    sizes = [int(np.prod(s)) if s else 1 for s in shapes]

    def pack(core):
        ls = jax.tree_util.tree_leaves(core)
        return tuple(
            jnp.concatenate([ls[i].reshape(-1).astype(fam_dtype[f])
                             for i in fam_of[f]])
            for f in fams
        )

    def unpack(blobs):
        out = [None] * len(leaves)
        for f, blob in zip(fams, blobs):
            off = 0
            for i in fam_of[f]:
                out[i] = blob[off:off + sizes[i]].reshape(shapes[i]).astype(
                    jnp.asarray(leaves[i]).dtype)
                off += sizes[i]
        return jax.tree_util.tree_unflatten(treedef, out)

    return pack, unpack


def make_window_step_packed(cfg: Config, template_core: EstimatorCore):
    """Live/latency-mode window step over packed blobs: the estimator core
    crosses the dispatch boundary as 3 flat arrays instead of ~50 leaves.
    Returns (jitted step over blobs, pack, unpack, layout).

    Historical note (round-5 correction): rounds 1-4 measured this at "5× the
    pytree live path", but that timing was a dispatch-rate artifact —
    ``block_until_ready`` did not actually block on the tunnel platform (see
    bench.py). With real completion timing the per-frame cost is one ~25 ms
    tunnel round trip + ~10 ms device step either way; argument marshalling
    is noise next to both, and the device core never leaves HBM between
    dispatches. The production live/latency path is therefore
    ``pipeline.Estimator.enable_live`` (one fused ingest+step dispatch + one
    batched fetch per frame), not blob packing; this program is kept for the
    codec round-trip guarantees (``tests/test_burst.py``) and for hosts with
    genuinely high per-leaf dispatch cost."""
    step, layout = _build_step(cfg)
    pack, unpack = make_packed_codec(template_core)

    def packed_step(blobs, flags: StepFlags):
        core, out = step(unpack(blobs), flags)
        return pack(core), out

    return jax.jit(packed_step), pack, unpack, layout


def make_window_burst(cfg: Config):
    """Burst/replay mode: a whole CHUNK of window steps fused into one device
    dispatch via ``lax.scan`` — ``burst(core, flags_batch)`` where every leaf
    of ``flags_batch`` carries a leading chunk axis K.

    Rationale (round-5 corrected timings): through the remote TPU tunnel each
    dispatch + completion fetch costs a ~25 ms round trip while the window
    step's device time is ~10 ms (bench.py chain-differenced protocol), so
    sequential per-frame dispatch wastes >2× the device time in transport.
    Scanning the step body makes K keyframes cost one dispatch, amortizing
    the round trip to ~25/K ms per frame. This is the offline/replay analog
    of the reference's measurement pump (``processMeasurements`` drains
    everything available, ``estimator.cpp:526-711``); outputs are stacked per
    step, so the full per-keyframe odometry stream is preserved.
    """
    step, layout = _build_step(cfg)

    def burst(core: EstimatorCore, flags_batch: StepFlags):
        return jax.lax.scan(lambda c, fl: step(c, fl), core, flags_batch)

    return jax.jit(burst), layout


def make_window_burst_batched(cfg: Config):
    """Fleet replay: B independent estimator cores advanced in lockstep —
    ``scan`` over K steps of a ``vmap``-ed window step body.

    The single window's matrices (~300×300 Hessian, ~3k Jacobian rows) leave
    the MXU mostly idle; batching B sequences turns every matmul, Cholesky
    and eigh into a batched op that actually fills the hardware. This is the
    offline/serving analog of batched inference: one chip replays a whole
    fleet's worth of logs concurrently (B bags at once), each with its own
    sliding window, marginalization prior and slide branches.

    ``burst(cores, flags_batch)``: every leaf of ``cores`` has leading axis B;
    every leaf of ``flags_batch`` has leading axes [K, B]. Returns the final
    batched cores and stacked outputs [K, B, ...].
    """
    step, layout = _build_step(cfg)
    vstep = jax.vmap(step)

    def burst(cores: EstimatorCore, flags_batch: StepFlags):
        return jax.lax.scan(lambda c, fl: vstep(c, fl), cores, flags_batch)

    return jax.jit(burst), layout


def make_window_burst_ingest(cfg: Config):
    """Burst replay WITH on-device measurement ingest: each scanned step first
    writes frame k's sensor interval + feature observations into the core,
    then runs the window step — so a whole replay chunk (ingest → solve →
    marginalize → slide, K times) is ONE device dispatch.

    Per-frame inputs (leading axis K), prepared host-side by
    ``pipeline.Estimator`` against its NumPy track-table mirror:

    - ``i_*`` / ``w_*`` — padded IMU/wheel interval arrays for buffer slot F-1
    - ``rows [ML]`` — a PERMUTATION of landmark-slot indices: the first
      entries are the slots written this frame, the rest are the unwritten
      slots (padding that writes values back unchanged). A permutation makes
      every scatter below collision-free and therefore well-defined.
    - ``vals [ML,5]`` — observation rows for ``rows``; ``wmask [ML]`` — which
      entries are real writes; ``nmask [ML]`` — which writes open a NEW slot
      (scrub stale columns, reset depth/flags, re-anchor at F-1)
    - ``marg_old []`` — the keyframe decision
    - when ``cfg.use_line``: ``l_rows/l_vals/l_wmask/l_nmask`` — the same
      permutation-write scheme for the line-landmark table

    Used by ``pipeline.Estimator.enable_burst``; equivalence with the
    per-frame path is asserted by ``tests/test_burst.py``.
    """
    step, layout = _build_step(cfg)
    f = cfg.num_frames
    ml = cfg.solver.max_landmarks

    def body(core: EstimatorCore, xs: dict):
        dtype = core.state.poses.dtype
        ib = core.imu_buf
        ib = ib._replace(
            dts=ib.dts.at[f - 1].set(xs["i_dts"]),
            acc=ib.acc.at[f - 1].set(xs["i_acc"]),
            gyr=ib.gyr.at[f - 1].set(xs["i_gyr"]),
            valid=ib.valid.at[f - 1].set(xs["i_valid"]),
            acc0=ib.acc0.at[f - 1].set(xs["i_acc0"]),
            gyr0=ib.gyr0.at[f - 1].set(xs["i_gyr0"]),
        )
        wb = core.wheel_buf
        wb = wb._replace(
            dts=wb.dts.at[f - 1].set(xs["w_dts"]),
            vel=wb.vel.at[f - 1].set(xs["w_vel"]),
            gyr=wb.gyr.at[f - 1].set(xs["w_gyr"]),
            valid=wb.valid.at[f - 1].set(xs["w_valid"]),
            vel0=wb.vel0.at[f - 1].set(xs["w_vel0"]),
            gyr0=wb.gyr0.at[f - 1].set(xs["w_gyr0"]),
        )

        tr = core.tracks
        rows = xs["rows"]
        wmask, nmask = xs["wmask"], xs["nmask"]
        onehot = jnp.zeros((f,), bool).at[f - 1].set(True)
        # new slots: scrub the previous tenant's columns, then write this
        # frame's observation column for every written slot
        ov = tr.obs_valid.at[rows].set(
            jnp.where(nmask[:, None], onehot[None, :], tr.obs_valid[rows])
        )
        ov = ov.at[rows, f - 1].set(wmask | ov[rows, f - 1])
        obs = tr.obs.at[rows, f - 1].set(
            jnp.where(wmask[:, None], xs["vals"].astype(dtype), tr.obs[rows, f - 1])
        )
        tr = tr._replace(
            obs=obs,
            obs_valid=ov,
            active=tr.active.at[rows].set(nmask | tr.active[rows]),
            solve_ok=tr.solve_ok.at[rows].set(~nmask & tr.solve_ok[rows]),
            depth_fixed=tr.depth_fixed.at[rows].set(~nmask & tr.depth_fixed[rows]),
            start_frame=tr.start_frame.at[rows].set(
                jnp.where(nmask, f - 1, tr.start_frame[rows])
            ),
            inv_depth=tr.inv_depth.at[rows].set(
                jnp.where(nmask, jnp.asarray(0.2, dtype), tr.inv_depth[rows])
            ),
        )

        core = core._replace(imu_buf=ib, wheel_buf=wb, tracks=tr)

        if cfg.use_line:
            ln = core.lines
            lr = xs["l_rows"]
            lw, lnw = xs["l_wmask"], xs["l_nmask"]
            lov = ln.obs_valid.at[lr].set(
                jnp.where(lnw[:, None], onehot[None, :], ln.obs_valid[lr])
            )
            lov = lov.at[lr, f - 1].set(lw | lov[lr, f - 1])
            lobs = ln.obs.at[lr, f - 1].set(
                jnp.where(lw[:, None], xs["l_vals"].astype(dtype), ln.obs[lr, f - 1])
            )
            ln = ln._replace(
                obs=lobs,
                obs_valid=lov,
                active=ln.active.at[lr].set(lnw | ln.active[lr]),
                solve_ok=ln.solve_ok.at[lr].set(~lnw & ln.solve_ok[lr]),
                start_frame=ln.start_frame.at[lr].set(
                    jnp.where(lnw, f - 1, ln.start_frame[lr])
                ),
                orth=ln.orth.at[lr].set(
                    jnp.where(lnw[:, None], 0.0, ln.orth[lr])
                ),
            )
            core = core._replace(lines=ln)

        gnss_kw = {}
        if cfg.gnss.enabled:
            # low-speed yaw freeze from the CURRENT state speed (the host
            # flag in the per-frame path is the same quantity one readback
            # older; estimator.cpp:2904-2930)
            speed = jnp.linalg.norm(core.state.sbs[f - 1, 0:3])
            gnss_kw = dict(
                gnss_ready=xs["gnss_ready"],
                frame_dts=xs["frame_dts"],
                fix_yaw_enu=speed < cfg.gnss.low_speed_yaw_fix,
                first_gnss_opt=jnp.asarray(False),
            )
        flags = StepFlags(
            marg_old=xs["marg_old"],
            stationary=jnp.asarray(False),
            wheel_valid=jnp.asarray(np.arange(f) >= 1),
            imu_valid=jnp.asarray(np.arange(f) >= 1),
            td_obs=jnp.zeros(f, dtype),
            propagate_newest=jnp.asarray(True),
            **gnss_kw,
        )
        return step(core, flags)

    def burst(core: EstimatorCore, xs_batch: dict):
        core_new, outs = jax.lax.scan(body, core, xs_batch)
        # post-chunk mirror tables, computed INSIDE the same dispatch so the
        # host reconciles its NumPy mirrors from the flush's single batched
        # fetch instead of a second round trip (live/latency mode: a chunk of
        # 1 frame then costs exactly one dispatch + one fetch)
        mirrors = [core_new.tracks.obs_valid, core_new.tracks.active,
                   core_new.tracks.obs[..., 0:2]]
        if cfg.use_line and core_new.lines is not None:
            mirrors += [core_new.lines.obs_valid, core_new.lines.active]
        return core_new, outs, tuple(mirrors)

    return jax.jit(burst), layout


def _build_step(cfg: Config):
    """The raw (un-jitted) window step body, shared by the single-step and
    burst entry points."""
    layout = StateLayout(
        cfg.num_frames, cfg.solver.max_landmarks,
        cfg.lines.max_lines if cfg.use_line else 0,
    )
    f = cfg.num_frames
    base_mask = base_free_mask(cfg, layout)

    def step(core: EstimatorCore, flags: StepFlags):
        dtype = core.state.poses.dtype
        n18 = noise_cov(cfg.imu.acc_n, cfg.imu.gyr_n, cfg.imu.acc_w, cfg.imu.gyr_w, dtype)
        n12 = wheel_noise_cov(cfg.wheel.vel_n, cfg.wheel.gyr_n, dtype)
        g = jnp.array([0.0, 0.0, cfg.imu.g_norm], dtype)

        state, tracks = core.state, core.tracks
        imu_pre = preintegrate_imu_window(core.imu_buf, state.sbs, n18)
        wheel_pre = preintegrate_wheel_window(
            core.wheel_buf, state.s_wheel, state.td_wheel, n12
        )

        # device-side anomaly/stationarity gates (estimator.cpp:614-654,
        # 870-896) — OR-combined with any host overrides arriving through
        # the flags. The newest interval's wheel-vs-IMU anomaly test runs
        # ONCE here and is PERSISTED in wheel_buf.bad, which the slides
        # carry — a contaminated interval stays excluded for its whole
        # window lifetime (gates.newest_wheel_anomaly)
        stationary = flags.stationary
        wheel_buf = core.wheel_buf
        if cfg.wdetect or cfg.stationary_detect:
            from .gates import device_frame_gates

            anomaly_dev, stationary_dev = device_frame_gates(
                state, tracks, core.imu_buf, imu_pre, wheel_pre,
                g, cfg.solver.focal,
                cfg.init.stationary_acc_var, cfg.init.stationary_parallax,
                cfg.init.wheel_stationary_dp, cfg.wheel.anomaly_thresh,
            )
            if cfg.wdetect:
                wheel_buf = wheel_buf._replace(
                    bad=wheel_buf.bad.at[f - 1].set(anomaly_dev))
                core = core._replace(wheel_buf=wheel_buf)
            if cfg.stationary_detect:
                stationary = stationary | stationary_dev

        # stationary: zero velocities, freeze all frame blocks
        sbs = state.sbs.at[:, 0:3].multiply(
            jnp.where(stationary, 0.0, 1.0).astype(dtype)
        )
        state = state._replace(sbs=sbs)
        frame_free = jnp.where(stationary, 0.0, 1.0).astype(dtype)
        free_mask = jnp.asarray(base_mask, dtype)
        free_mask = free_mask.at[: PER_FRAME * f].multiply(frame_free)
        if cfg.gnss.enabled and flags.fix_yaw_enu is not None:
            free_mask = free_mask.at[layout.yaw_enu].multiply(
                jnp.where(flags.fix_yaw_enu, 0.0, 1.0).astype(dtype)
            )

        if flags.propagate_newest is not None:
            # seed slot F-1 by propagating F-2 through the newest IMU interval
            # (the reference's processIMU runs before every processImage;
            # after slideWindow the new slot holds only a stale copy)
            from ..geometry.so3 import quat_mul, quat_normalize, quat_rotate

            i, j = f - 2, f - 1
            dt = imu_pre.sum_dt[j]
            q_i = state.poses[i, 3:7]
            p_pred = (
                state.poses[i, 0:3] + state.sbs[i, 0:3] * dt
                - 0.5 * g * dt * dt + quat_rotate(q_i, imu_pre.delta_p[j])
            )
            q_pred = quat_normalize(quat_mul(q_i, imu_pre.delta_q[j]))
            v_pred = state.sbs[i, 0:3] - g * dt + quat_rotate(q_i, imu_pre.delta_v[j])
            do_prop = flags.propagate_newest & flags.imu_valid[j] & ~stationary
            poses = state.poses.at[j].set(jnp.where(
                do_prop, jnp.concatenate([p_pred, q_pred]), state.poses[j]))
            sbs = state.sbs.at[j, 0:3].set(jnp.where(do_prop, v_pred, state.sbs[j, 0:3]))
            state = state._replace(poses=poses, sbs=sbs)
        wheel_valid = flags.wheel_valid if cfg.wheel.enabled else jnp.zeros(f, bool)
        if cfg.wheel.enabled and cfg.wdetect:
            # persistent per-interval anomaly flags: slot F-1 was just
            # evaluated; older slots keep the verdict from THEIR first solve
            # and slide/merge with the buffers (the reference skips all wheel
            # factors while its newest-interval flag is up,
            # estimator.cpp:3132-3136, then re-admits contaminated intervals
            # when it clears — here they stay out)
            wheel_valid = wheel_valid & ~wheel_buf.bad
        plane_valid = (
            jnp.ones(f, bool) if cfg.plane.enabled else jnp.zeros(f, bool)
        )

        if cfg.use_depth:
            # depth-verified first, SVD fallback (estimator.cpp:1068-1075)
            tracks = triangulate_all(state, tracks, depth_max=cfg.tracker.depth_max)
        else:
            from .triangulation import triangulate_svd

            tracks = triangulate_svd(state, tracks)

        use_lines = cfg.use_line and core.lines is not None
        lines = core.lines
        if use_lines:
            # triangulate fresh lines, refine with poses fixed, then cull
            # BEFORE the joint solve — the reference's onlyLineOpt ends with
            # removeLineOutlier (estimator.cpp:4269), so a line triangulated
            # off a bad predicted pose never contaminates the BA or the
            # marginalization prior
            from .lines import only_line_opt, remove_line_outliers, triangulate_lines

            # gate on a valid prior: the very first solve runs on raw
            # initialization poses — lines triangulated from those lock the
            # window to the init error (they pass the self-consistent cull),
            # so they wait one step for a converged window
            lines = triangulate_lines(
                state, lines, min_obs=cfg.lines.min_obs,
                min_cos_theta=cfg.lines.min_cos_theta,
                enabled=core.prior.valid,
            )
            lines = only_line_opt(
                state, lines, jnp.asarray(cfg.solver.focal / 1.5, dtype),
                min_obs=cfg.lines.min_obs, iters=cfg.lines.only_opt_iters,
            )
            lines = remove_line_outliers(
                state, lines, min_obs=cfg.lines.min_obs,
                max_reproj=cfg.lines.outlier_reproj_px / 500.0,
            )

        if cfg.use_mcc:
            from .gates import moving_consistency_check, remove_outliers

            bad = moving_consistency_check(state, tracks, focal=cfg.solver.focal)
            tracks = remove_outliers(tracks, bad)

        use_gnss = cfg.gnss.enabled and core.gnss_obs is not None
        inp = SolveInputs(
            imu_pre=imu_pre,
            imu_valid=flags.imu_valid,
            wheel_pre=wheel_pre,
            wheel_valid=wheel_valid,
            plane_valid=plane_valid,
            td_obs=flags.td_obs,
            prior=core.prior,
            g=g,
            free_mask=free_mask,
            gnss_obs=core.gnss_obs if use_gnss else None,
            gnss_ready=flags.gnss_ready if use_gnss else None,
            frame_dts=flags.frame_dts if use_gnss else None,
            ddt_weight=jnp.asarray(cfg.gnss.ddt_weight, dtype) if use_gnss else None,
            anchor_pose=state.poses[0] if use_gnss else None,
            anchor_active=(
                (flags.first_gnss_opt if flags.first_gnss_opt is not None
                 else jnp.asarray(False))
                if use_gnss else None
            ),
            line_min_obs=cfg.lines.min_obs,
            line_weight=cfg.lines.weight_scale,
        )
        params = SolverParams(
            sqrt_info_scale=jnp.asarray(cfg.solver.focal / 1.5, dtype),
            cauchy_delta=jnp.asarray(cfg.solver.huber_delta, dtype),
            plane_sqrt_info=jnp.asarray(
                [cfg.plane.roll_n_inv, cfg.plane.pitch_n_inv, cfg.plane.zpw_n_inv], dtype
            ),
            lm_lambda0=jnp.asarray(cfg.solver.lm_lambda0, dtype),
            lm_up=jnp.asarray(cfg.solver.lm_lambda_factor, dtype),
            lm_down=jnp.asarray(1.0 / cfg.solver.lm_lambda_factor, dtype),
        )

        state_before = state
        if use_lines:
            state, tracks, lines, cost = solve_window(
                state, tracks, inp, layout, params,
                num_iters=cfg.solver.max_iters, lines=lines,
                method=cfg.solver.method,
                linear_solver=cfg.solver.linear_solver,
            )
        else:
            state, tracks, cost = solve_window(
                state, tracks, inp, layout, params,
                num_iters=cfg.solver.max_iters, method=cfg.solver.method,
                linear_solver=cfg.solver.linear_solver,
            )
        # anchor-camera lines (LINEINCAM) are gauge-invariant: the yaw/position
        # re-anchor below carries them along with their anchor pose for free
        state = reanchor_yaw(state_before, state)
        if use_lines:
            # post-solve cull (estimator.cpp:4580)
            lines = remove_line_outliers(
                state, lines, min_obs=cfg.lines.min_obs,
                max_reproj=cfg.lines.outlier_reproj_px / 500.0,
            )

        def _slide_gnss_old(o):
            if o is None:
                return None
            return jax.tree_util.tree_map(
                lambda a: jnp.roll(a, -1, axis=0).at[-1].set(jnp.zeros_like(a[-1])), o
            )

        def _slide_gnss_new(o):
            if o is None:
                return None
            fz = o.valid.shape[0]
            return jax.tree_util.tree_map(
                lambda a: a.at[fz - 2].set(a[fz - 1]).at[fz - 1].set(jnp.zeros_like(a[fz - 1])), o
            )

        if use_lines:
            from .lines import slide_new_lines, slide_old_lines

        def do_old(_):
            prior = marginalize_old(
                state, tracks, inp, layout, params.sqrt_info_scale,
                params.cauchy_delta, params.plane_sqrt_info,
                lines=lines if use_lines else None,
            )
            return EstimatorCore(
                state=slide_old_state(state),
                tracks=slide_old_tracks(state, tracks),
                imu_buf=slide_old_imu_buffer(core.imu_buf),
                wheel_buf=slide_old_wheel_buffer(core.wheel_buf),
                prior=prior,
                gnss_obs=_slide_gnss_old(core.gnss_obs),
                lines=slide_old_lines(state, lines) if use_lines else None,
            )

        def do_new(_):
            prior = marginalize_second_new(state, core.prior, layout)
            return EstimatorCore(
                state=slide_new_state(state),
                tracks=slide_new_tracks(tracks),
                imu_buf=slide_new_imu_buffer(core.imu_buf),
                wheel_buf=slide_new_wheel_buffer(core.wheel_buf),
                prior=prior,
                gnss_obs=_slide_gnss_new(core.gnss_obs),
                lines=slide_new_lines(lines) if use_lines else None,
            )

        core_new = jax.lax.cond(flags.marg_old, do_old, do_new, None)
        # device-side failure flag (failureDetection's active bias checks,
        # estimator.cpp:2847-2888) — lets burst replay detect a mid-chunk
        # explosion at PER-FRAME granularity instead of per flush
        failed = (jnp.linalg.norm(state.sbs[f - 1, 3:6]) > cfg.solver.fail_ba_thresh) | \
                 (jnp.linalg.norm(state.sbs[f - 1, 6:9]) > cfg.solver.fail_bg_thresh)
        # solved (pre-slide) newest pose is the odometry output of this step
        return core_new, {"pose": state.poses[f - 1], "sb": state.sbs[f - 1], "cost": cost,
                          "poses": state.poses, "failed": failed}

    return step, layout
