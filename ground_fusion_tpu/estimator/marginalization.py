"""Schur marginalization → square-root prior, fully on-device.

The reference re-evaluates every factor touching frame 0, assembles a dense
normal-equation system with 4 pthreads, Schur-eliminates the dropped block via
an eigendecomposition with eigenvalue clipping, and stores a linearized
sqrt-prior (``marginalization_factor.cpp:119-308``). Here the same pipeline is
three matmuls and two ``eigh`` calls on static shapes:

1. the dropped-frame factor subset linearizes with the exact same vmapped
   kernels as the solver (:mod:`.assembly`) — no separate evaluation path;
2. anchored landmark depths are scalar blocks touching only camera columns,
   so their elimination is one batched rank-1 down-date (an einsum), the
   TPU-native analog of ``ThreadsConstructA``'s partial-H accumulation;
3. the 15-dim frame block is eliminated with a clipped-``eigh`` pseudo-inverse
   and the kept system re-factorized into ``J0 = S^{1/2} Vᵀ``,
   ``r0 = S^{-1/2} Vᵀ b`` (``marginalization_factor.cpp:278-302``).

The address-shift across the slide (``estimator.cpp:3500-3528``) becomes a
static column permutation into the post-slide layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .assembly import (
    MargPrior,
    SolveInputs,
    linearize_imu,
    linearize_plane,
    linearize_pose_anchor,
    linearize_prior,
    linearize_visual,
    linearize_wheel,
)
from .layout import PER_FRAME, StateLayout
from .window import Tracks, WindowState, boxminus, slide_new_state, slide_old_state


def _clipped_pinv(A: jax.Array, eps: float = 1e-8):
    """Eigendecomposition pseudo-inverse with small-eigenvalue clipping
    (marginalization_factor.cpp:278-285 ``saes.eigenvalues().array() > eps``)."""
    A = 0.5 * (A + A.T)
    s, V = jnp.linalg.eigh(A)
    s_inv = jnp.where(s > eps, 1.0 / jnp.where(s > eps, s, 1.0), 0.0)
    return (V * s_inv[None, :]) @ V.T


def _sqrt_factorize(H: jax.Array, b: jax.Array, eps: float = 1e-8):
    """H → (J0, r0) with J0ᵀJ0 = H, J0ᵀ r0 = b
    (marginalization_factor.cpp:294-302).

    The prior is consumed only through the quadratic form J0ᵀJ0 / J0ᵀr0, so
    ANY square root is equivalent; the reference's eigendecomposition is the
    TPU's weakest dense op (eigh(245) ≈ 1.8 ms vs Cholesky ≈ 0.07 ms on v5e),
    so the fast path is a Cholesky of the ridge-stabilised system (J0 = Lᵀ,
    r0 = L⁻¹b) and the clipped-eigh factorization survives as a ``lax.cond``
    fallback taken only when rounding leaves H indefinite enough that the
    Cholesky produces non-finite entries."""
    H = 0.5 * (H + H.T)
    n = H.shape[0]
    dtype = H.dtype
    # relative ridge: covers rank-deficiency + f32 rounding of the Schur
    # down-dates; ~1e-5 of the diagonal scale adds negligible information
    # next to sqrt_info-scaled factor blocks
    scale = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(H))), 1.0)
    delta = (64.0 * jnp.finfo(dtype).eps) * scale + eps
    L = jnp.linalg.cholesky(H + delta * jnp.eye(n, dtype=dtype))
    finite = jnp.all(jnp.isfinite(L))

    def chol_path(_):
        r0 = jax.scipy.linalg.solve_triangular(L, b, lower=True)
        return L.T, r0

    def eigh_path(_):
        s, V = jnp.linalg.eigh(H)
        ok = s > eps
        sqrt_s = jnp.sqrt(jnp.where(ok, s, 1.0))
        J0 = jnp.where(ok[:, None], sqrt_s[:, None] * V.T, 0.0)
        r0 = jnp.where(ok, (V.T @ b) / sqrt_s, 0.0)
        return J0, r0

    return jax.lax.cond(finite, chol_path, eigh_path, None)


def _schur_drop(H: jax.Array, b: jax.Array, drop: np.ndarray, keep: np.ndarray,
                eps: float = 1e-8):
    """Eliminate the static index set ``drop`` from (H, b).

    The 2-D sub-block extraction is done with a constant permutation matmul
    (``P H Pᵀ`` + contiguous slices), not ``np.ix_`` gathers — on TPU a
    fancy-indexed gather of a [245²] block measured ~0.5 ms while the
    equivalent 245³ permutation matmul is single-digit µs on the MXU."""
    n = H.shape[0]
    nd = drop.shape[0]
    order = np.concatenate([drop, keep])
    P = np.zeros((n, n), np.float32)
    P[np.arange(n), order] = 1.0                       # compile-time constant
    P = jnp.asarray(P, H.dtype)
    Hp = P @ H @ P.T
    bp = P @ b
    Amm_inv = _clipped_pinv(Hp[:nd, :nd], eps)
    Akm = Hp[nd:, :nd]
    Hk = Hp[nd:, nd:] - Akm @ Amm_inv @ Akm.T
    bk = bp[nd:] - Akm @ (Amm_inv @ bp[:nd])
    return Hk, bk


def marginalize_old(
    state: WindowState,
    tracks: Tracks,
    inp: SolveInputs,
    layout: StateLayout,
    sqrt_info_scale,
    cauchy_delta,
    plane_sqrt_info,
    lines=None,
) -> MargPrior:
    """Drop frame 0 (pose+speed-bias) and the depths of landmarks anchored
    there; return the prior already permuted into the POST-slide layout with
    the post-slide linearization point (``estimator.cpp:3334-3535``).

    When ``lines`` is given, line factors of lines anchored at frame 0 join
    the dropped subset with their 4-dim orthonormal blocks eliminated
    (``estimator.cpp:4680-4712`` — drop set ``{2}``, observations at the
    dropped frame itself are skipped outright)."""
    f = state.poses.shape[0]
    nx = layout.nx
    ml = layout.max_landmarks
    dtype = state.poses.dtype

    only1 = (jnp.arange(f) == 1)
    only0 = (jnp.arange(f) == 0)
    Ji, ri = linearize_imu(state, inp.imu_pre, inp.imu_valid & only1, inp.g, layout)
    Jw, rw = linearize_wheel(state, inp.wheel_pre, inp.wheel_valid & only1, layout)
    anchored0 = tracks.active & (tracks.start_frame == 0)
    Jv, rv = linearize_visual(
        state, tracks, inp.td_obs, layout, sqrt_info_scale, cauchy_delta,
        lm_filter=anchored0,
    )
    Jp, rp = linearize_plane(state, inp.plane_valid & only0, plane_sqrt_info, layout)
    Jm, rm = linearize_prior(state, inp.prior, layout)
    # very first marginalization (no prior yet): seed with a pose0 anchor at
    # its current value instead of the prior factor (estimator.cpp:3562-3570)
    Ja, ra = linearize_pose_anchor(state, state.poses[0], ~inp.prior.valid, layout)
    rows = [(Ji, ri), (Jw, rw), (Jv, rv), (Jp, rp), (Jm, rm), (Ja, ra)]
    if inp.gnss_obs is not None:
        # GNSS factors of the dropped frame: slot-0 epochs + clock pair (0,1)
        # (estimator.cpp:3398-3434)
        from ..gnss.factors import linearize_clock_chain, linearize_gnss_psr_dopp

        rows.append(linearize_gnss_psr_dopp(
            state, inp.gnss_obs, inp.gnss_ready, layout, slot_filter=only0))
        rows.append(linearize_clock_chain(
            state, inp.frame_dts, inp.gnss_ready, inp.ddt_weight, layout,
            pair_filter=only1))
    if lines is not None:
        # line factors of frame-0 lines; the frame-0 observation itself is
        # skipped (drop_set={2} only — estimator.cpp:4690-4699)
        from .lines import linearize_lines

        line0 = lines.active & (lines.start_frame == 0)
        rows.append(linearize_lines(
            state, lines, layout, sqrt_info_scale * inp.line_weight,
            cauchy_delta, min_obs=inp.line_min_obs, lm_filter=line0,
            frame_filter=jnp.arange(f) >= 1))
    J = jnp.concatenate([a for a, _ in rows], axis=0) * inp.free_mask[None, :]
    r = jnp.concatenate([b for _, b in rows], axis=0)

    Jc, Jl = J[:, :nx], J[:, nx : nx + ml]
    Hcc = Jc.T @ Jc
    bc = Jc.T @ r
    Hll = jnp.sum(Jl * Jl, axis=0)                      # depth blocks are scalars
    Hcl = Jc.T @ Jl                                     # [NX, ML]
    bl = Jl.T @ r
    w = jnp.where(Hll > 1e-8, 1.0 / jnp.where(Hll > 1e-8, Hll, 1.0), 0.0)
    Hred = Hcc - (Hcl * w[None, :]) @ Hcl.T             # batched rank-1 down-dates
    bred = bc - Hcl @ (w * bl)

    if layout.max_lines > 0:
        # 4-dim line blocks: batched 4×4 block down-dates. No factor row
        # touches both a depth and a line column, so eliminating depths then
        # lines independently is exact.
        Jn = J[:, nx + ml :].reshape(J.shape[0], layout.max_lines, 4)
        Hnn = jnp.einsum("rla,rlb->lab", Jn, Jn)        # [LL,4,4]
        Hcn = jnp.einsum("rc,rla->lca", Jc, Jn)         # [LL,NX,4]
        bn = jnp.einsum("rla,r->la", Jn, r)             # [LL,4]
        inv = jax.vmap(_clipped_pinv)(Hnn)
        Hred = Hred - jnp.einsum("lca,lab,ldb->cd", Hcn, inv, Hcn)
        bred = bred - jnp.einsum("lca,lab,lb->c", Hcn, inv, bn)

    # drop set: pose0+sb0 tangent (15) + frame-0 GNSS clock dt (4) and ddt (1)
    # (estimator.cpp:3351-3420 drop_set construction)
    drop = np.concatenate([
        np.arange(PER_FRAME),
        layout.gnss_dt + np.arange(4),
        np.array([layout.gnss_ddt]),
    ])
    keep = np.setdiff1d(np.arange(nx), drop)
    Hk, bk = _schur_drop(Hred, bred, drop, keep)
    J_keep, r_keep = _sqrt_factorize(Hk, bk)            # [nk, nk]

    # --- address shift into the post-slide layout (estimator.cpp:3500-3528):
    # frame cols shift down one slot; per-frame GNSS dt/ddt likewise; calib,
    # yaw_enu and anchor stay put ---
    nk = keep.shape[0]
    new_col = keep.copy()
    frame_cols = keep < PER_FRAME * f
    new_col[frame_cols] -= PER_FRAME
    dt_cols = (keep >= layout.gnss_dt) & (keep < layout.gnss_dt + 4 * f)
    new_col[dt_cols] -= 4
    ddt_cols = (keep >= layout.gnss_ddt) & (keep < layout.gnss_ddt + f)
    new_col[ddt_cols] -= 1
    # constant projection matmul, not a scatter (TPU: scatter-add of a
    # [225×245] block measured ~0.7 ms; the matmul is µs on the MXU).
    # Additive semantics preserved: colliding columns (second-new map) sum.
    Pc = np.zeros((nk, nx), np.float32)
    Pc[np.arange(nk), new_col] = 1.0
    J0 = jnp.zeros((nx, nx), dtype).at[:nk, :].set(J_keep @ jnp.asarray(Pc, dtype))
    r0 = jnp.zeros((nx,), dtype).at[:nk].set(r_keep)
    return MargPrior(J0=J0, r0=r0, lin=slide_old_state(state), valid=jnp.ones((), bool))


def marginalize_second_new(
    state: WindowState, prior: MargPrior, layout: StateLayout
) -> MargPrior:
    """Drop only ``pose[F-2]`` from the existing prior (``estimator.cpp:
    3536-3631`` — drop set is exactly ``para_Pose[WINDOW_SIZE-1]``; the
    matching assert guarantees its speed-bias is never in the prior). When the
    prior has no columns there the Schur step is a no-op, reproducing the
    reference's skip branch without a branch. Returns the prior in the
    post-slide layout."""
    f = state.poses.shape[0]
    nx = layout.nx
    dtype = state.poses.dtype

    dx = boxminus(state, prior.lin, layout)
    r_cur = prior.r0 + prior.J0 @ dx
    H = prior.J0.T @ prior.J0
    b = prior.J0.T @ r_cur

    # drop set: pose(F-2) tangent only (estimator.cpp:3546-3552; slot F-2's
    # GNSS dt/ddt cols are provably zero and shift away with the same map)
    p = PER_FRAME * (f - 2)
    drop = np.arange(p, p + 6)
    keep = np.setdiff1d(np.arange(nx), drop)
    Hk, bk = _schur_drop(H, b, drop, keep)
    J_keep, r_keep = _sqrt_factorize(Hk, bk)

    # address map (estimator.cpp:3583-3618): i==F-2 skipped, i==F-1 →
    # slot F-2 for pose/sb and GNSS dt/ddt; all else identity
    nk = keep.shape[0]
    new_col = keep.copy()
    old_f1 = PER_FRAME * (f - 1)
    mv = (keep >= old_f1) & (keep < old_f1 + PER_FRAME)
    new_col[mv] -= PER_FRAME
    dt_f1 = layout.gnss_dt + 4 * (f - 1)
    mv = (keep >= dt_f1) & (keep < dt_f1 + 4)
    new_col[mv] -= 4
    ddt_f1 = layout.gnss_ddt + (f - 1)
    mv = keep == ddt_f1
    new_col[mv] -= 1
    # constant projection matmul, not a scatter (see marginalize_old): old
    # frame F-1's sb cols land on slot F-2's kept (provably zero) sb cols —
    # the matmul sums the collision exactly like the scatter-add did
    Pc = np.zeros((nk, nx), np.float32)
    Pc[np.arange(nk), new_col] = 1.0
    J0 = jnp.zeros((nx, nx), dtype).at[:nk, :].set(J_keep @ jnp.asarray(Pc, dtype))
    r0 = jnp.zeros((nx,), dtype).at[:nk].set(r_keep)
    # the reference re-linearizes the kept prior at the *current* values
    # (preMarginalize copies parameter_block_data from live state)
    lin_new = slide_new_state(state)
    pr = MargPrior(J0=J0, r0=r0, lin=lin_new, valid=prior.valid)
    # without a valid prior there is nothing to marginalize — pass through
    return jax.tree_util.tree_map(
        lambda new, old: jnp.where(prior.valid, new, old), pr,
        MargPrior(prior.J0, prior.r0, lin_new, prior.valid),
    )
