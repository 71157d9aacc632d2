"""Fixed-iteration trust-region window solvers (LM and Powell dogleg).

Replaces Ceres ``DENSE_SCHUR``+``DOGLEG`` with ≤8-iteration / 40 ms budget
(``estimator.cpp:3303-3318``) by a trust-region scan: always relinearize at
the current accepted state, solve the dense normal equations (one Cholesky of
a ~300×300 system), accept/reject by cost, adapt the region — every iteration
identical in shape so the whole solve is one ``lax.scan`` under jit. Two
strategies, selected statically (``SolverConfig.method``):

- ``lm`` — Levenberg–Marquardt with multiplicative damping;
- ``dogleg`` — Powell's dogleg matching Ceres'
  ``trust_region_strategy_type = DOGLEG`` (``estimator.cpp:3306``): blend the
  Gauss–Newton step with the Cauchy (steepest-descent) point inside an
  adaptive radius, gain-ratio controlled.

Gauge handling matches ``double2vector`` (``estimator.cpp:2440-2569``): after
the solve, yaw and position of frame 0 are re-anchored to their pre-solve
values by a rigid yaw-rotation + translation of the whole window.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.so3 import mat_to_ypr, quat_mul, quat_normalize, quat_rotate, quat_to_mat, yaw_to_mat, mat_to_quat
from .assembly import SolveInputs, assemble_residuals, assemble_rows, normal_equations
from .layout import StateLayout
from .window import Tracks, WindowState, retract


class SolverParams(NamedTuple):
    sqrt_info_scale: jax.Array   # FOCAL/1.5 (estimator.cpp:193-198)
    cauchy_delta: jax.Array
    plane_sqrt_info: jax.Array   # [3]
    lm_lambda0: jax.Array
    lm_up: jax.Array
    lm_down: jax.Array


def _cost(J, r):
    # J unused; robust reweighting is already folded into r's rows
    return 0.5 * jnp.sum(r * r)


def _solve_delta(H, g, lam, free_mask):
    """(H + λ·diag(H) + εI) δ = -g, frozen columns pinned to zero."""
    n = H.shape[0]
    eps = jnp.asarray(1e-8, H.dtype)
    damp = lam * jnp.diagonal(H) + eps
    # pin frozen vars with a unit diagonal so the system stays SPD
    damp = damp + (1.0 - free_mask)
    Hd = H + jnp.diag(damp)
    L = jnp.linalg.cholesky(Hd)
    delta = jax.scipy.linalg.cho_solve((L, True), -g)
    return delta * free_mask


def _solve_delta_schur(H, g, lam, free_mask, layout: StateLayout):
    """Same damped system solved via the Schur complement (ceres
    ``DENSE_SCHUR``): landmark inverse-depth columns are mutually-orthogonal
    scalar blocks and line blocks are independent 4×4s, so eliminating them
    costs two batched down-dates and shrinks the Cholesky from
    ``total×total`` to ``nx×nx``."""
    nx, ml, llq = layout.nx, layout.max_landmarks, 4 * layout.max_lines
    eps = jnp.asarray(1e-8, H.dtype)
    damp = lam * jnp.diagonal(H) + eps + (1.0 - free_mask)
    Hd = H + jnp.diag(damp)
    gn = -g * free_mask

    Hcc = Hd[:nx, :nx]
    bc = gn[:nx]

    # scalar depth blocks
    Hcd = Hd[:nx, nx : nx + ml]
    hdd = jnp.diagonal(Hd)[nx : nx + ml]
    bd = gn[nx : nx + ml]
    wd = 1.0 / hdd                                   # damped ⇒ > 0
    Hcc = Hcc - (Hcd * wd[None, :]) @ Hcd.T
    bc = bc - Hcd @ (wd * bd)

    if llq:
        from .lines import _solve_spd4

        LL = llq // 4
        Hcl = Hd[:nx, nx + ml :].reshape(nx, LL, 4)
        Hll = (
            Hd[nx + ml :, nx + ml :]
            .reshape(LL, 4, LL, 4)[jnp.arange(LL), :, jnp.arange(LL), :]
        )                                            # [LL,4,4] diagonal blocks
        bl = gn[nx + ml :].reshape(LL, 4)
        sol_bl = jax.vmap(_solve_spd4)(Hll, bl)      # Hll⁻¹ bl
        # Hll⁻¹ Hclᵀ: one unrolled-Cholesky solve per (line, camera column)
        sol_Hcl = jax.vmap(
            lambda A, B: jax.vmap(lambda col: _solve_spd4(A, col))(B)
        )(Hll, jnp.swapaxes(Hcl, 0, 1))              # [LL,nx,4]
        Hcc = Hcc - jnp.einsum("cla,lna->cn", Hcl, sol_Hcl)
        bc = bc - jnp.einsum("cla,la->c", Hcl, sol_bl)

    L = jnp.linalg.cholesky(Hcc)
    dc = jax.scipy.linalg.cho_solve((L, True), bc)

    dd = wd * (bd - Hcd.T @ dc)
    parts = [dc, dd]
    if llq:
        rhs_l = bl - jnp.einsum("cla,c->la", Hcl, dc)
        dl = jax.vmap(_solve_spd4)(Hll, rhs_l)
        parts.append(dl.reshape(-1))
    return jnp.concatenate(parts) * free_mask


def _dogleg_step(H, g, free_mask, h_gn, radius):
    """Powell dogleg inside ``radius``: GN step if it fits, else the blend of
    the Cauchy point and GN on the trust boundary."""
    gm = g * free_mask
    gHg = gm @ (H @ gm)
    alpha = jnp.where(gHg > 1e-12, (gm @ gm) / jnp.maximum(gHg, 1e-12), 0.0)
    h_sd = -alpha * gm
    n_gn = jnp.linalg.norm(h_gn)
    n_sd = jnp.linalg.norm(h_sd)

    # boundary blend h_sd + beta (h_gn − h_sd) with |h| = radius
    d = h_gn - h_sd
    a = jnp.maximum(d @ d, 1e-18)
    b = h_sd @ d
    c = h_sd @ h_sd - radius * radius
    disc = jnp.maximum(b * b - a * c, 0.0)
    beta = (-b + jnp.sqrt(disc)) / a
    h_blend = h_sd + jnp.clip(beta, 0.0, 1.0) * d

    h_sd_clip = h_sd * (radius / jnp.maximum(n_sd, 1e-12))
    h = jnp.where(
        n_gn <= radius, h_gn,
        jnp.where(n_sd >= radius, h_sd_clip, h_blend),
    )
    return h * free_mask


def solve_window(
    state: WindowState,
    tracks: Tracks,
    inp: SolveInputs,
    layout: StateLayout,
    params: SolverParams,
    num_iters: int = 8,
    lines=None,
    method: str = "lm",
    linear_solver: str = "dense",
):
    """Run LM for ``num_iters`` fixed iterations; returns (state', tracks',
    final_cost) — or (state', tracks', lines', final_cost) when ``lines`` is
    given. Landmark depths (and line orthonormal blocks, when present) update
    jointly through the trailing columns.
    """
    nx = layout.nx
    ml = layout.max_landmarks
    with_lines = lines is not None

    def apply_delta(st: WindowState, tr: Tracks, ln, delta):
        st2 = retract(st, delta[:nx], layout)
        inv2 = tr.inv_depth + delta[nx : nx + ml]
        ln2 = ln._replace(orth=ln.orth + delta[nx + ml :].reshape(-1, 4)) \
            if with_lines else ln
        return st2, tr._replace(inv_depth=inv2), ln2

    def lin_cost(st, tr, ln):
        J, r = assemble_rows(
            st, tr, inp._replace(lines=ln) if with_lines else inp,
            layout, params.sqrt_info_scale, params.cauchy_delta,
            params.plane_sqrt_info,
        )
        return J, r, _cost(J, r)

    def cost_only(st, tr, ln):
        # residual-only probe (no Jacobian build) for LM accept/reject
        r = assemble_residuals(
            st, tr, inp._replace(lines=ln) if with_lines else inp,
            layout, params.sqrt_info_scale, params.cauchy_delta,
            params.plane_sqrt_info,
        )
        # frozen columns never move, so free_mask does not change r
        return 0.5 * jnp.sum(r * r)

    if linear_solver == "schur":
        def lin_solve(H, g, lam):
            return _solve_delta_schur(H, g, lam, inp.free_mask, layout)
    else:
        def lin_solve(H, g, lam):
            return _solve_delta(H, g, lam, inp.free_mask)

    def step(carry, _):
        st, tr, ln, reg, _ = carry
        J, r, c0 = lin_cost(st, tr, ln)
        H, g = normal_equations(J, r)
        if method == "dogleg":
            # Powell dogleg (ceres DOGLEG, estimator.cpp:3306): `reg` is the
            # trust radius, gain-ratio controlled. The GN step carries a tiny
            # RELATIVE Tikhonov floor: until the first marginalization prior
            # exists the window Hessian has a 4-dim gauge nullspace
            # (yaw+position are re-anchored only after the solve), and an
            # exactly undamped solve lets rounding-scale gradient components
            # explode along it (observed: 0.40 m E2E ATE vs 0.0004 m with
            # the floor); Ceres likewise regularizes its dogleg GN solve
            h_gn = lin_solve(H, g, jnp.asarray(1e-6, H.dtype))
            delta = _dogleg_step(H, g, inp.free_mask, h_gn, reg)
        else:
            delta = lin_solve(H, g, reg)
        st_new, tr_new, ln_new = apply_delta(st, tr, ln, delta)
        c1 = cost_only(st_new, tr_new, ln_new)
        accept = c1 < c0
        st = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, b, a), st, st_new)
        tr = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, b, a), tr, tr_new)
        if with_lines:
            ln = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, b, a), ln, ln_new)
        if method == "dogleg":
            pred = -(g @ delta + 0.5 * delta @ (H @ delta))
            rho = (c0 - c1) / jnp.maximum(pred, 1e-18)
            step_norm = jnp.linalg.norm(delta)
            reg = jnp.where(
                accept & (rho > 0.75), jnp.maximum(reg, 3.0 * step_norm),
                jnp.where(accept & (rho >= 0.25), reg, reg * 0.5),
            )
            reg = jnp.clip(reg, 1e-8, 1e8)
        else:
            reg = jnp.where(accept, reg * params.lm_down, reg * params.lm_up)
            reg = jnp.clip(reg, 1e-10, 1e6)
        return (st, tr, ln, reg, jnp.where(accept, c1, c0)), None

    reg0 = (jnp.asarray(1.0, state.poses.dtype) if method == "dogleg"
            else params.lm_lambda0)
    _, _, c_init = lin_cost(state, tracks, lines)
    (state, tracks, lines, _, cost), _ = jax.lax.scan(
        step, (state, tracks, lines, reg0, c_init), None, length=num_iters
    )
    if with_lines:
        return state, tracks, lines, cost
    return state, tracks, cost


def gauge_transform(state_before: WindowState, state_after: WindowState):
    """The rigid yaw-gauge correction (R, t, q) with ``x' = R x + t`` that
    restores frame 0's pre-solve yaw and position (``double2vector``,
    ``estimator.cpp:2440-2569``)."""
    R0_before = quat_to_mat(state_before.poses[0, 3:7])
    R0_after = quat_to_mat(state_after.poses[0, 3:7])
    y_before = mat_to_ypr(R0_before)[0]
    y_after = mat_to_ypr(R0_after)[0]
    rot_diff = yaw_to_mat(y_before - y_after)
    q_diff = mat_to_quat(rot_diff)
    t = state_before.poses[0, 0:3] - rot_diff @ state_after.poses[0, 0:3]
    return rot_diff, t, q_diff


def reanchor_yaw(state_before: WindowState, state_after: WindowState) -> WindowState:
    """Undo the yaw/position gauge drift of the solve (``double2vector``,
    ``estimator.cpp:2440-2569``): rotate the optimized window about the origin
    so frame 0 recovers its pre-solve yaw and position."""
    rot_diff, t, q_diff = gauge_transform(state_before, state_after)
    new_p = (rot_diff @ state_after.poses[:, 0:3].T).T + t
    new_q = quat_normalize(quat_mul(q_diff, state_after.poses[:, 3:7]))
    new_v = (rot_diff @ state_after.sbs[:, 0:3].T).T
    sbs = state_after.sbs.at[:, 0:3].set(new_v)
    return state_after._replace(
        poses=jnp.concatenate([new_p, new_q], axis=-1), sbs=sbs
    )
