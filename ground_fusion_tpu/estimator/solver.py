"""Fixed-iteration Levenberg–Marquardt window solver.

Replaces Ceres ``DENSE_SCHUR``+``DOGLEG`` with ≤8-iteration / 40 ms budget
(``estimator.cpp:3303-3318``) by a trust-region LM scan: always relinearize at
the current accepted state, solve the damped dense normal equations (one
Cholesky of a ~300×300 system), accept/reject by cost, adapt λ — every
iteration identical in shape so the whole solve is one ``lax.scan`` under jit.

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


def solve_window(
    state: WindowState,
    tracks: Tracks,
    inp: SolveInputs,
    layout: StateLayout,
    params: SolverParams,
    num_iters: int = 8,
):
    """Run LM for ``num_iters`` fixed iterations; returns (state', tracks',
    final_cost). Landmark depths update jointly through the trailing columns.
    """
    nx = layout.nx

    def apply_delta(st: WindowState, tr: Tracks, delta):
        st2 = retract(st, delta[:nx], layout)
        inv2 = tr.inv_depth + delta[nx:]
        return st2, tr._replace(inv_depth=inv2)

    def lin_cost(st, tr):
        J, r = assemble_rows(
            st, tr, inp, layout, params.sqrt_info_scale, params.cauchy_delta,
            params.plane_sqrt_info,
        )
        return J, r, _cost(J, r)

    def cost_only(st, tr):
        # residual-only probe (no Jacobian build) for LM accept/reject
        r = assemble_residuals(
            st, tr, inp, layout, params.sqrt_info_scale, params.cauchy_delta,
            params.plane_sqrt_info,
        )
        # frozen columns never move, so free_mask does not change r
        return 0.5 * jnp.sum(r * r)

    def step(carry, _):
        st, tr, lam, _ = carry
        J, r, c0 = lin_cost(st, tr)
        H, g = normal_equations(J, r)
        delta = _solve_delta(H, g, lam, inp.free_mask)
        st_new, tr_new = apply_delta(st, tr, delta)
        c1 = cost_only(st_new, tr_new)
        accept = c1 < c0
        st = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, b, a), st, st_new)
        tr = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, b, a), tr, tr_new)
        lam = jnp.where(accept, lam * params.lm_down, lam * params.lm_up)
        lam = jnp.clip(lam, 1e-10, 1e6)
        return (st, tr, lam, jnp.where(accept, c1, c0)), None

    lam0 = params.lm_lambda0
    _, _, c_init = lin_cost(state, tracks)
    (state, tracks, _, cost), _ = jax.lax.scan(
        step, (state, tracks, lam0, c_init), None, length=num_iters
    )
    return state, tracks, cost


def reanchor_yaw(state_before: WindowState, state_after: WindowState) -> WindowState:
    """Undo the yaw/position gauge drift of the solve (``double2vector``,
    ``estimator.cpp:2440-2569``): rotate the optimized window about the origin
    so frame 0 recovers its pre-solve yaw and position."""
    R0_before = quat_to_mat(state_before.poses[0, 3:7])
    R0_after = quat_to_mat(state_after.poses[0, 3:7])
    y_before = mat_to_ypr(R0_before)[0]
    y_after = mat_to_ypr(R0_after)[0]
    rot_diff = yaw_to_mat(y_before - y_after)
    q_diff = mat_to_quat(rot_diff)

    p0_after = state_after.poses[0, 0:3]
    p0_before = state_before.poses[0, 0:3]
    new_p = (rot_diff @ (state_after.poses[:, 0:3] - p0_after).T).T + p0_before
    new_q = quat_normalize(quat_mul(q_diff, state_after.poses[:, 3:7]))
    new_v = (rot_diff @ state_after.sbs[:, 0:3].T).T
    sbs = state_after.sbs.at[:, 0:3].set(new_v)
    return state_after._replace(
        poses=jnp.concatenate([new_p, new_q], axis=-1), sbs=sbs
    )
