"""Batched factor linearization → dense Jacobian row-blocks → one MXU matmul.

The reference walks a heterogeneous factor graph per solve, evaluating each
Ceres cost function's analytic Jacobian and scattering into Ceres' internal
sparse structures (``estimator.cpp:2890-3300``). TPU-first redesign: every
factor class is vmapped over its batch, its small Jacobian is scattered into a
dense row-block ``[rows, TOTAL]`` of the flat tangent layout, rows of invalid
(masked) factors are zeroed, and the full normal equations are one matmul
``H = JᵀJ`` — dense, static-shape, MXU-tiled. At window scale (TOTAL ≈ 300,
R ≈ 3000) this is microseconds on the MXU and removes every host-side graph
walk from the hot loop.

The landmark (inverse-depth) columns live in the trailing ``ML`` columns, so
the same rows feed either a joint dense solve or the Schur-complement path
(:mod:`.schur`) — each visual factor touches exactly one landmark column.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..preintegration.imu import ImuPreint
from ..preintegration.wheel import WheelPreint
from .factors import (
    cauchy_weight,
    imu_factor,
    plane_factor,
    pose_anchor_factor,
    proj21_factor,
    wheel_factor,
)
from .layout import PER_FRAME, StateLayout
from .window import Tracks, WindowState, boxminus


class MargPrior(NamedTuple):
    """Square-root marginalization prior over the camera block.

    ``r(x) = r0 + J0 · (x ⊟ lin)`` — the reference's linearized prior factor
    (``marginalization_factor.cpp:344-392``) with first-estimate Jacobians.
    Rows are padded to NX; absent blocks have zero columns.
    """

    J0: jax.Array        # [NX, NX]
    r0: jax.Array        # [NX]
    lin: WindowState
    valid: jax.Array     # [] bool


def empty_prior(layout: StateLayout, num_frames: int, dtype=jnp.float32) -> MargPrior:
    from .window import empty_state

    nx = layout.nx
    return MargPrior(
        J0=jnp.zeros((nx, nx), dtype),
        r0=jnp.zeros((nx,), dtype),
        lin=empty_state(num_frames, dtype),
        valid=jnp.zeros((), bool),
    )


def rows_to_dense(J_block: jax.Array, col_idx: jax.Array, r: jax.Array,
                  row_valid: jax.Array, total: int):
    """Scatter per-factor small Jacobians ``[B, r, n]`` with global column
    indices ``[B, n]`` into dense rows ``[B·r, total]``; invalid factors zero.
    """
    b, rr, n = J_block.shape
    # where-based masking, NOT multiply: a masked-out factor may carry NaN/inf
    # payloads (e.g. padded observations) and 0·NaN would poison the system
    ok = row_valid[:, None, None]
    Jm = jnp.where(ok, J_block, 0.0)
    rm = jnp.where(row_valid[:, None], r, 0.0)
    Jd = jnp.zeros((b, rr, total), J_block.dtype)
    Jd = Jd.at[
        jnp.arange(b)[:, None, None], jnp.arange(rr)[None, :, None], col_idx[:, None, :]
    ].set(Jm)
    return Jd.reshape(b * rr, total), rm.reshape(-1)


def rows_to_dense_add(J_block: jax.Array, col_idx: jax.Array, r: jax.Array,
                      row_valid: jax.Array, total: int):
    """Like :func:`rows_to_dense` but with an ADDITIVE scatter: a factor whose
    column indices coincide (e.g. the line anchor observation, where pose_i
    and pose_j are the same block) accumulates the correct total derivative
    instead of an undefined last-write."""
    b, rr, n = J_block.shape
    ok = row_valid[:, None, None]
    Jm = jnp.where(ok, J_block, 0.0)
    rm = jnp.where(row_valid[:, None], r, 0.0)
    Jd = jnp.zeros((b, rr, total), J_block.dtype)
    Jd = Jd.at[
        jnp.arange(b)[:, None, None], jnp.arange(rr)[None, :, None], col_idx[:, None, :]
    ].add(Jm)
    return Jd.reshape(b * rr, total), rm.reshape(-1)


# ---------------------------------------------------------------------------
# Per-class linearizers
# ---------------------------------------------------------------------------


def linearize_imu(state: WindowState, pre: ImuPreint, interval_valid: jax.Array,
                  g: jax.Array, layout: StateLayout):
    """IMU factors between adjacent frames. ``pre`` has leading axis F; slot k
    covers interval (k-1, k]; slot 0 is ignored. (imu_factor.h <15,7,9,7,9>)"""
    f = state.poses.shape[0]
    ks = jnp.arange(1, f)
    pre_k = jax.tree_util.tree_map(lambda a: a[1:], pre)

    def one(k, p):
        return imu_factor(state.poses[k - 1], state.sbs[k - 1], state.poses[k], state.sbs[k], p, g)

    r, J = jax.vmap(one)(ks, pre_k)            # [F-1,15], [F-1,15,30]
    base = PER_FRAME * (ks - 1)
    col_idx = base[:, None] + jnp.arange(30)[None, :]
    return rows_to_dense(J, col_idx, r, interval_valid[1:], layout.total)


def linearize_wheel(state: WindowState, pre: WheelPreint, interval_valid: jax.Array,
                    layout: StateLayout):
    """Wheel odometer factors (wheel_factor.h <6,7,7,7,1,1,1,1>); anomaly
    gating (estimator.cpp:3132-3136) arrives through ``interval_valid``."""
    f = state.poses.shape[0]
    ks = jnp.arange(1, f)
    pre_k = jax.tree_util.tree_map(lambda a: a[1:], pre)
    sx, sy, sw = state.s_wheel[0], state.s_wheel[1], state.s_wheel[2]

    def one(k, p):
        return wheel_factor(
            state.poses[k - 1], state.poses[k], state.ex_wheel, sx, sy, sw, state.td_wheel, p
        )

    r, J = jax.vmap(one)(ks, pre_k)            # [F-1,6], [F-1,6,22]
    pose_cols = jnp.concatenate(
        [
            (PER_FRAME * (ks - 1))[:, None] + jnp.arange(6)[None, :],
            (PER_FRAME * ks)[:, None] + jnp.arange(6)[None, :],
        ],
        axis=1,
    )  # [F-1, 12]
    fixed = jnp.array(
        [layout.ex_wheel + i for i in range(6)]
        + [layout.s_wheel, layout.s_wheel + 1, layout.s_wheel + 2, layout.td_wheel],
        jnp.int32,
    )
    col_idx = jnp.concatenate([pose_cols, jnp.tile(fixed, (f - 1, 1))], axis=1)  # [F-1, 22]
    return rows_to_dense(J, col_idx, r, interval_valid[1:], layout.total)


def linearize_visual(state: WindowState, tracks: Tracks, td_obs: jax.Array,
                     layout: StateLayout, sqrt_info_scale, cauchy_delta: float,
                     min_track: int = 4, lm_filter: jax.Array | None = None):
    """All (landmark, target-frame) reprojection factors, flattened to
    ``[ML·F]``; each row pair touches pose_i (gathered by anchor), pose_j,
    ex_cam, its own depth column, and td. Mirrors the factor enumeration of
    ``estimator.cpp:3265-3297`` with the ``used_num ≥ 4`` gate.
    """
    ml, f = tracks.obs_valid.shape
    dtype = state.poses.dtype
    used_num = jnp.sum(tracks.obs_valid, axis=1)
    lm_ok = tracks.active & tracks.solve_ok & (used_num >= min_track)
    if lm_filter is not None:
        lm_ok = lm_ok & lm_filter

    ls = jnp.repeat(jnp.arange(ml), f)
    js = jnp.tile(jnp.arange(f), ml)
    si = tracks.start_frame[ls]
    valid = (
        lm_ok[ls]
        & tracks.obs_valid[ls, js]
        & tracks.obs_valid[ls, si]
        & (js > si)
    )

    ob_i = tracks.obs[ls, si]   # [B,5]
    ob_j = tracks.obs[ls, js]
    zeros = jnp.zeros((ml * f,), dtype)
    ones = jnp.ones((ml * f,), dtype)
    obs_pack = jnp.stack(
        [
            ob_i[:, 0], ob_i[:, 1], ones,
            ob_j[:, 0], ob_j[:, 1], ones,
            ob_i[:, 2], ob_i[:, 3], zeros,
            ob_j[:, 2], ob_j[:, 3], zeros,
            td_obs[si], td_obs[js],
        ],
        axis=-1,
    )  # [B, 14]

    def one(l, i, j, pack):
        return proj21_factor(
            state.poses[i], state.poses[j], state.ex_cam, tracks.inv_depth[l],
            state.td, pack, sqrt_info_scale,
        )

    r, J = jax.vmap(one)(ls, si, js, obs_pack)   # [B,2], [B,2,20]

    # Cauchy robust reweighting (ceres::CauchyLoss on visual factors,
    # estimator.cpp:3280; rescale as marginalization_factor.cpp:46-77)
    w = cauchy_weight(jnp.sum(r * r, axis=-1), cauchy_delta)[:, None]
    r = r * w
    J = J * w[:, :, None]

    # depth column masked out for RGBD-measured (held-constant) depths
    dep_free = jnp.where(tracks.depth_fixed[ls], 0.0, 1.0).astype(dtype)
    J = J.at[:, :, 18].multiply(dep_free[:, None])

    # --- scatter-free dense placement (TPU: a dynamic scatter here measured
    # ~4x the factor evaluation itself; every column position except the
    # anchor frame ``si`` is static, so the rows assemble from one-hot
    # einsums + static concatenation instead) ---
    b = ml * f
    J = jnp.where(valid[:, None, None], J, 0.0)
    r = jnp.where(valid[:, None], r, 0.0)
    onehot_i = (si[:, None] == jnp.arange(f)[None, :]).astype(dtype)   # [B,F]
    onehot_j = (js[:, None] == jnp.arange(f)[None, :]).astype(dtype)   # const
    frame6 = (jnp.einsum("bf,brc->brfc", onehot_i, J[:, :, 0:6])
              + jnp.einsum("bf,brc->brfc", onehot_j, J[:, :, 6:12]))   # [B,2,F,6]
    frame_cols = jnp.concatenate(
        [frame6, jnp.zeros((b, 2, f, PER_FRAME - 6), dtype)], axis=-1
    ).reshape(b, 2, PER_FRAME * f)
    onehot_l = (ls[:, None] == jnp.arange(ml)[None, :]).astype(dtype)  # const
    depth_cols = J[:, :, 18:19] * onehot_l[:, None, :]                 # [B,2,ML]
    # layout: [frames | ex_cam(6) td(1) | gap.. | depths | line tail]
    gap = layout.depth0 - (layout.td + 1)
    Jd = jnp.concatenate(
        [
            frame_cols,
            J[:, :, 12:18],                       # ex_cam (cols ex_cam..+6)
            J[:, :, 19:20],                       # td     (col td)
            jnp.zeros((b, 2, gap), dtype),
            depth_cols,
            jnp.zeros((b, 2, layout.total - layout.depth0 - ml), dtype),
        ],
        axis=-1,
    )
    return Jd.reshape(b * 2, layout.total), r.reshape(-1)


def linearize_plane(state: WindowState, frame_valid: jax.Array, sqrt_info_diag,
                    layout: StateLayout):
    """Per-frame ground-plane factors (plane_factor.h:26-56)."""
    f = state.poses.shape[0]
    ks = jnp.arange(f)

    def one(k):
        return plane_factor(
            state.poses[k], state.ex_wheel, state.plane_q, state.plane_z, sqrt_info_diag
        )

    r, J = jax.vmap(one)(ks)   # [F,3], [F,3,16]
    col_idx = jnp.concatenate(
        [
            (PER_FRAME * ks)[:, None] + jnp.arange(6)[None, :],
            jnp.tile(jnp.arange(layout.ex_wheel, layout.ex_wheel + 6), (f, 1)),
            jnp.tile(jnp.arange(layout.plane, layout.plane + 4), (f, 1)),
        ],
        axis=1,
    )
    return rows_to_dense(J, col_idx, r, frame_valid, layout.total)


def linearize_pose_anchor(state: WindowState, anchor_pose: jax.Array,
                          active: jax.Array, layout: StateLayout):
    """Pose0 anchor rows, gated by ``active`` (estimator.cpp:2943-2951 adds
    this at the first GNSS-enabled solve; :3562-3570 seeds the very first
    marginalization prior with it)."""
    r, J6 = pose_anchor_factor(state.poses[0], anchor_pose)
    w = active.astype(state.poses.dtype)
    Jd = jnp.zeros((6, layout.total), state.poses.dtype).at[:, :6].set(J6 * w)
    return Jd, r * w


def linearize_prior(state: WindowState, prior: MargPrior, layout: StateLayout):
    """Marginalization prior rows: r = r0 + J0 (x ⊟ lin), J = J0 — embedded
    in the first NX columns (marginalization_factor.cpp:344-392)."""
    dx = boxminus(state, prior.lin, layout)
    r = prior.r0 + prior.J0 @ dx
    w = prior.valid.astype(state.poses.dtype)
    nx = layout.nx
    Jd = jnp.zeros((nx, layout.total), state.poses.dtype)
    Jd = Jd.at[:, :nx].set(prior.J0 * w)
    return Jd, r * w


# ---------------------------------------------------------------------------
# Full-system assembly
# ---------------------------------------------------------------------------


class SolveInputs(NamedTuple):
    """Everything the window solve consumes besides the state itself."""

    imu_pre: ImuPreint          # leading axis F (slot k = interval (k-1, k])
    imu_valid: jax.Array        # [F] bool
    wheel_pre: WheelPreint
    wheel_valid: jax.Array      # [F] bool (anomaly-gated)
    plane_valid: jax.Array      # [F] bool
    td_obs: jax.Array           # [F] td value at capture time per frame
    prior: MargPrior
    g: jax.Array                # [3] gravity in world
    free_mask: jax.Array        # [TOTAL] 1.0 = optimizable, 0.0 = frozen
    # --- optional GNSS block (None ⇒ GNSS factors compiled out) ---
    gnss_obs: object = None     # gnss.factors.GnssObsWindow | None
    gnss_ready: jax.Array | None = None   # [] bool — gnss_ready gate
    frame_dts: jax.Array | None = None    # [F] Δt between adjacent frames
    ddt_weight: jax.Array | None = None   # [] GNSS_DDT_WEIGHT
    # --- pose0 anchor (first GNSS-enabled solve, estimator.cpp:2943-2951) ---
    anchor_pose: jax.Array | None = None  # [7] anchor value for pose0
    anchor_active: jax.Array | None = None  # [] bool
    # --- optional line landmarks (None ⇒ line factors compiled out) ---
    lines: object = None                  # estimator.lines.LineTracks | None
    line_min_obs: int = 5                 # LINE_MIN_OBS (static)
    line_weight: float = 1.0              # lines.weight_scale (static)


def assemble_rows(state: WindowState, tracks: Tracks, inp: SolveInputs,
                  layout: StateLayout, sqrt_info_scale, cauchy_delta,
                  plane_sqrt_info):
    """Linearize every factor class at ``state`` → stacked dense rows."""
    Ji, ri = linearize_imu(state, inp.imu_pre, inp.imu_valid, inp.g, layout)
    Jw, rw = linearize_wheel(state, inp.wheel_pre, inp.wheel_valid, layout)
    Jv, rv = linearize_visual(
        state, tracks, inp.td_obs, layout, sqrt_info_scale, cauchy_delta
    )
    Jp, rp = linearize_plane(state, inp.plane_valid, plane_sqrt_info, layout)
    Jm, rm = linearize_prior(state, inp.prior, layout)
    rows = [(Ji, ri), (Jw, rw), (Jv, rv), (Jp, rp), (Jm, rm)]
    if inp.gnss_obs is not None:
        from ..gnss.factors import linearize_clock_chain, linearize_gnss_psr_dopp

        rows.append(linearize_gnss_psr_dopp(state, inp.gnss_obs, inp.gnss_ready, layout))
        rows.append(linearize_clock_chain(state, inp.frame_dts, inp.gnss_ready,
                                          inp.ddt_weight, layout))
    if inp.anchor_pose is not None:
        rows.append(linearize_pose_anchor(state, inp.anchor_pose,
                                          inp.anchor_active, layout))
    if inp.lines is not None:
        from .lines import linearize_lines

        rows.append(linearize_lines(
            state, inp.lines, layout, sqrt_info_scale * inp.line_weight,
            cauchy_delta, min_obs=inp.line_min_obs))
    J = jnp.concatenate([a for a, _ in rows], axis=0)
    r = jnp.concatenate([b for _, b in rows], axis=0)
    return J * inp.free_mask[None, :], r


def normal_equations(J: jax.Array, r: jax.Array):
    """H = JᵀJ, g = Jᵀr — one matmul pair on the MXU."""
    return J.T @ J, J.T @ r


def assemble_residuals(state: WindowState, tracks: Tracks, inp: SolveInputs,
                       layout: StateLayout, sqrt_info_scale, cauchy_delta,
                       plane_sqrt_info):
    """Residual-only evaluation (no Jacobians, no dense scatter) — the cheap
    cost probe for LM accept/reject; must match :func:`assemble_rows`'s
    whitening + robust reweighting exactly."""
    from ..preintegration.imu import ImuPreint  # noqa: F401  (doc aid)
    from .factors import (
        imu_residual_raw, plane_residual_raw, proj21_residual_raw,
        sqrt_info_from_cov, wheel_residual_from_delta, wheel_corrected_delta,
    )
    from ..geometry.se3 import pose_boxplus  # noqa: F401

    f = state.poses.shape[0]
    dtype = state.poses.dtype
    parts = []

    # IMU
    pre_k = jax.tree_util.tree_map(lambda a: a[1:], inp.imu_pre)

    def imu_one(k, p):
        S = sqrt_info_from_cov(p.covariance)
        return S @ imu_residual_raw(state.poses[k - 1], state.sbs[k - 1],
                                    state.poses[k], state.sbs[k], p, inp.g)

    ri = jax.vmap(imu_one)(jnp.arange(1, f), pre_k)
    parts.append(jnp.where(inp.imu_valid[1:, None], ri, 0.0).reshape(-1))

    # wheel
    wpre_k = jax.tree_util.tree_map(lambda a: a[1:], inp.wheel_pre)
    sx, sy, sw = state.s_wheel[0], state.s_wheel[1], state.s_wheel[2]

    def wheel_one(k, p):
        S = sqrt_info_from_cov(p.covariance)
        dp, dq = wheel_corrected_delta(p, sx, sy, sw, state.td_wheel)
        return S @ wheel_residual_from_delta(
            state.poses[k - 1], state.poses[k], state.ex_wheel, dp, dq)

    rw = jax.vmap(wheel_one)(jnp.arange(1, f), wpre_k)
    parts.append(jnp.where(inp.wheel_valid[1:, None], rw, 0.0).reshape(-1))

    # visual
    ml = tracks.obs_valid.shape[0]
    used_num = jnp.sum(tracks.obs_valid, axis=1)
    lm_ok = tracks.active & tracks.solve_ok & (used_num >= 4)
    ls = jnp.repeat(jnp.arange(ml), f)
    js = jnp.tile(jnp.arange(f), ml)
    si = tracks.start_frame[ls]
    valid = lm_ok[ls] & tracks.obs_valid[ls, js] & tracks.obs_valid[ls, si] & (js > si)
    ob_i = tracks.obs[ls, si]
    ob_j = tracks.obs[ls, js]

    def vis_one2(l, i, j, oi, oj, tdi, tdj):
        return sqrt_info_scale * proj21_residual_raw(
            state.poses[i], state.poses[j], state.ex_cam,
            tracks.inv_depth[l], state.td,
            jnp.concatenate([oi[0:2], jnp.ones(1, dtype)]),
            jnp.concatenate([oj[0:2], jnp.ones(1, dtype)]),
            jnp.concatenate([oi[2:4], jnp.zeros(1, dtype)]),
            jnp.concatenate([oj[2:4], jnp.zeros(1, dtype)]),
            tdi, tdj,
        )

    rv = jax.vmap(vis_one2)(ls, si, js, ob_i, ob_j, inp.td_obs[si], inp.td_obs[js])
    w = cauchy_weight(jnp.sum(rv * rv, axis=-1), cauchy_delta)[:, None]
    parts.append(jnp.where(valid[:, None], rv * w, 0.0).reshape(-1))

    # plane
    if True:
        from .factors import plane_residual_raw as _pr

        def plane_one(k):
            return plane_sqrt_info * _pr(state.poses[k], state.ex_wheel,
                                         state.plane_q, state.plane_z)

        rp = jax.vmap(plane_one)(jnp.arange(f))
        parts.append(jnp.where(inp.plane_valid[:, None], rp, 0.0).reshape(-1))

    # prior
    dx = boxminus(state, inp.prior.lin, layout)
    rm = (inp.prior.r0 + inp.prior.J0 @ dx) * inp.prior.valid.astype(dtype)
    parts.append(rm)

    # GNSS
    if inp.gnss_obs is not None:
        from ..gnss.factors import linearize_clock_chain, linearize_gnss_psr_dopp

        _, rg = linearize_gnss_psr_dopp(state, inp.gnss_obs, inp.gnss_ready, layout)
        _, rc = linearize_clock_chain(state, inp.frame_dts, inp.gnss_ready,
                                      inp.ddt_weight, layout)
        parts.extend([rg, rc])

    # pose0 anchor
    if inp.anchor_pose is not None:
        from .factors import pose_anchor_residual_raw, POSE_ANCHOR_SQRT_INFO

        ra = POSE_ANCHOR_SQRT_INFO * pose_anchor_residual_raw(
            state.poses[0], inp.anchor_pose
        )
        parts.append(ra * inp.anchor_active.astype(dtype))

    # lines
    if inp.lines is not None:
        from .lines import line_residuals

        parts.append(line_residuals(
            state, inp.lines, sqrt_info_scale * inp.line_weight,
            cauchy_delta, min_obs=inp.line_min_obs))
    return jnp.concatenate(parts)
