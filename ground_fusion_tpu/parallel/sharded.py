"""Landmark-sharded bundle adjustment over a device mesh.

The scaling axis of the window problem is the landmark dimension: every
visual factor touches exactly one inverse-depth block, so each device can own
a landmark shard, linearize its factors, Schur-eliminate its depths locally,
and ``psum`` its contribution to the reduced camera system — the ICI-native
analog of the reference's 4-pthread partial-H accumulation
(``marginalization_factor.cpp:150-181,269-274`` ThreadsConstructA) and of
Ceres' DENSE_SCHUR. The camera system (≈ NX² with NX ≈ 186) is tiny, so it is
solved replicated on every device; landmark back-substitution is local.

Single-program usage::

    mesh = jax.make_mesh((n,), ("lm",))
    solve = make_sharded_gn(cfg, mesh, iters=8)
    state, tracks = solve(state, tracks, inp)   # tracks sharded on axis 0
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..estimator.assembly import (
    SolveInputs,
    linearize_imu,
    linearize_plane,
    linearize_prior,
    linearize_wheel,
)
from ..estimator.factors import cauchy_weight, proj21_factor
from ..estimator.layout import PER_FRAME, StateLayout
from ..estimator.solver import SolverParams
from ..estimator.window import Tracks, WindowState, retract


def _visual_schur_local(state: WindowState, tracks: Tracks, td_obs, nx: int,
                        ex_col: int, td_col: int,
                        sqrt_info_scale, cauchy_delta, min_track: int = 4):
    """Linearize this device's landmark shard and Schur-eliminate its depths.

    Returns (Hred [NX,NX], bred [NX], Hll [mlᵢ], Hcl [NX,mlᵢ], bl [mlᵢ]) —
    Hred/bred are this shard's contribution to the reduced camera system.
    """
    ml, f = tracks.obs_valid.shape
    dtype = state.poses.dtype
    used_num = jnp.sum(tracks.obs_valid, axis=1)
    lm_ok = tracks.active & tracks.solve_ok & (used_num >= min_track)

    ls = jnp.repeat(jnp.arange(ml), f)
    js = jnp.tile(jnp.arange(f), ml)
    si = tracks.start_frame[ls]
    valid = lm_ok[ls] & tracks.obs_valid[ls, js] & tracks.obs_valid[ls, si] & (js > si)

    ob_i = tracks.obs[ls, si]
    ob_j = tracks.obs[ls, js]
    ones = jnp.ones((ml * f,), dtype)
    zeros = jnp.zeros((ml * f,), dtype)
    pack = jnp.stack(
        [ob_i[:, 0], ob_i[:, 1], ones, ob_j[:, 0], ob_j[:, 1], ones,
         ob_i[:, 2], ob_i[:, 3], zeros, ob_j[:, 2], ob_j[:, 3], zeros,
         td_obs[si], td_obs[js]],
        axis=-1,
    )

    def one(l, i, j, pk):
        return proj21_factor(state.poses[i], state.poses[j], state.ex_cam,
                             tracks.inv_depth[l], state.td, pk, sqrt_info_scale)

    r, J = jax.vmap(one)(ls, si, js, pack)            # [B,2], [B,2,20]
    w = cauchy_weight(jnp.sum(r * r, axis=-1), cauchy_delta)[:, None]
    w = w * valid[:, None].astype(dtype)
    r = r * w
    J = J * w[:, :, None]
    dep_free = jnp.where(tracks.depth_fixed[ls], 0.0, 1.0).astype(dtype)
    Jl = J[:, :, 18] * dep_free[:, None]              # [B,2] depth column
    Jc_small = jnp.concatenate([J[:, :, 0:18], J[:, :, 19:20]], axis=-1)  # [B,2,19]

    # scatter the 19 camera-touching columns into dense NX rows
    col_idx = jnp.concatenate(
        [
            (PER_FRAME * si)[:, None] + jnp.arange(6)[None, :],
            (PER_FRAME * js)[:, None] + jnp.arange(6)[None, :],
            jnp.tile(jnp.arange(ex_col, ex_col + 6), (ml * f, 1)),    # ex_cam block
            jnp.full((ml * f, 1), td_col, jnp.int32),                 # td
        ],
        axis=1,
    )
    b2 = ml * f
    Jc = jnp.zeros((b2, 2, nx), dtype)
    Jc = Jc.at[jnp.arange(b2)[:, None, None], jnp.arange(2)[None, :, None],
               col_idx[:, None, :]].set(Jc_small)
    Jc = Jc.reshape(b2 * 2, nx)
    Jl = Jl.reshape(b2 * 2)
    rf = r.reshape(b2 * 2)
    row_lm = jnp.repeat(ls, 2)                        # local landmark per row

    Hcc = Jc.T @ Jc
    bc = Jc.T @ rf
    onehot = (row_lm[:, None] == jnp.arange(ml)[None, :]).astype(dtype)
    Hll = jnp.sum((Jl * Jl)[:, None] * onehot, axis=0)          # [ml]
    Hcl = Jc.T @ (Jl[:, None] * onehot)                          # [NX, ml]
    bl = jnp.sum((Jl * rf)[:, None] * onehot, axis=0)
    wl = jnp.where(Hll > 1e-8, 1.0 / jnp.where(Hll > 1e-8, Hll, 1.0), 0.0)
    Hred = Hcc - (Hcl * wl[None, :]) @ Hcl.T
    bred = bc - Hcl @ (wl * bl)
    return Hred, bred, wl, Hcl, bl


def make_sharded_gn(cfg: Config, mesh: Mesh, iters: int = 8, damping: float = 1e-6):
    """Build the mesh-sharded Gauss–Newton window solve. ``tracks`` arrives
    sharded on its landmark axis (PartitionSpec('lm')); everything else is
    replicated. Collective cost per iteration: one ``psum`` of an
    [NX, NX]+[NX] pair over ICI."""
    layout = StateLayout(cfg.num_frames, cfg.solver.max_landmarks)
    nx = layout.nx
    sqrt_info = cfg.solver.focal / 1.5
    cdelta = cfg.solver.huber_delta
    plane_si = jnp.asarray([cfg.plane.roll_n_inv, cfg.plane.pitch_n_inv, cfg.plane.zpw_n_inv])


    def gn_iteration(state, tracks_shard, inp: SolveInputs):
        # camera-only factor classes: identical on every device (cheap)
        Ji, ri = linearize_imu(state, inp.imu_pre, inp.imu_valid, inp.g, layout)
        Jw, rw = linearize_wheel(state, inp.wheel_pre, inp.wheel_valid, layout)
        Jp, rp = linearize_plane(state, inp.plane_valid, plane_si.astype(state.dtype), layout)
        Jm, rm = linearize_prior(state, inp.prior, layout)
        Jcam = jnp.concatenate([Ji, Jw, Jp, Jm])[:, :nx] * inp.free_mask[None, :nx]
        rcam = jnp.concatenate([ri, rw, rp, rm])
        H_cam = Jcam.T @ Jcam
        b_cam = Jcam.T @ rcam

        Hred, bred, wl, Hcl, bl = _visual_schur_local(
            state, tracks_shard, inp.td_obs, nx, layout.ex_cam, layout.td,
            jnp.asarray(sqrt_info, state.dtype), jnp.asarray(cdelta, state.dtype),
        )
        mask = inp.free_mask[:nx]
        Hred = Hred * mask[:, None] * mask[None, :]
        bred = bred * mask
        Hcl = Hcl * mask[:, None]
        # ICI collective: reduce camera system over landmark shards
        H = H_cam + jax.lax.psum(Hred, "lm")
        b = b_cam + jax.lax.psum(bred, "lm")

        damp = damping * jnp.diagonal(H) + 1e-9 + (1.0 - mask)
        L = jnp.linalg.cholesky(H + jnp.diag(damp))
        dxc = jax.scipy.linalg.cho_solve((L, True), -b) * mask

        # local landmark back-substitution: δλ = w (−bl − Hclᵀ δxc)
        dlam = wl * (-bl - Hcl.T @ dxc)
        state = retract(state, dxc, layout)
        tracks_shard = tracks_shard._replace(inv_depth=tracks_shard.inv_depth + dlam)
        return state, tracks_shard

    @partial(
        jax.shard_map,
        mesh=mesh,
        # pytree-prefix specs: tracks fully sharded on the landmark axis,
        # state and solve inputs replicated
        in_specs=(P(), P("lm"), P()),
        out_specs=(P(), P("lm")),
    )
    def solve(state, tracks_shard, inp):
        def body(carry, _):
            st, tr = carry
            st, tr = gn_iteration(st, tr, inp)
            return (st, tr), None

        (state, tracks_shard), _ = jax.lax.scan(body, (state, tracks_shard), None, length=iters)
        return state, tracks_shard

    return jax.jit(solve)


def shard_tracks(tracks: Tracks, mesh: Mesh) -> Tracks:
    """Place a Tracks pytree with its landmark axis sharded over the mesh."""
    spec = NamedSharding(mesh, P("lm"))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, spec), tracks)


# ---------------------------------------------------------------------------
# Edge-sharded 4-DoF pose graph (the keyframe-range scale-out axis)
# ---------------------------------------------------------------------------


def make_sharded_pose_graph(mesh: Mesh, n_nodes: int, iters: int = 5,
                            axis: str = "lm"):
    """Mesh-sharded 4-DoF pose-graph relaxation.

    The unbounded keyframe graph is the second scaling axis (SURVEY §5
    long-context analog: keyframe ranges sharded across devices/hosts with
    boundary-pose exchange). Here the EDGE set shards over the mesh — each
    device linearizes its edge shard (``linearize_edges``, the same code the
    single-device solve uses) and contributes H = JᵀJ of shape [4N, 4N] via
    one ``psum`` per GN iteration; the dense solve is replicated. Node count
    is padded-static; multi-host runs place edge shards host-local so the
    only cross-host traffic is the reduced system.

    Usage::

        solve = make_sharded_pose_graph(mesh, n_nodes=MAX_KF)
        yaws, ts = solve(yaws, ts, node_valid, fixed, edges_sharded)
    """
    from functools import partial as _partial

    from ..global_layers.pose_graph import GraphEdges, linearize_edges

    @_partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis)),
        out_specs=(P(), P()),
    )
    def solve(yaws, ts, node_valid, fixed, edges_shard: GraphEdges):
        dtype = ts.dtype
        free = (node_valid & ~fixed).astype(dtype)
        free4 = jnp.repeat(free, 4)

        def gn(carry, _):
            yaws, ts = carry
            Jd, r = linearize_edges(yaws, ts, edges_shard, n_nodes)
            Jd = Jd * free4[None, :]
            H = jax.lax.psum(Jd.T @ Jd, axis)
            g = jax.lax.psum(Jd.T @ r, axis)
            damp = 1e-6 * jnp.diagonal(H) + 1e-8 + (1.0 - free4)
            L = jnp.linalg.cholesky(H + jnp.diag(damp))
            dx = jax.scipy.linalg.cho_solve((L, True), -g) * free4
            dx = dx.reshape(n_nodes, 4)
            return (yaws + dx[:, 0], ts + dx[:, 1:4]), None

        (yaws, ts), _ = jax.lax.scan(gn, (yaws, ts), None, length=iters)
        return yaws, ts

    return jax.jit(solve)


def shard_edges(edges, mesh: Mesh, axis: str = "lm"):
    """Pad the edge table to a multiple of the mesh size and shard it."""
    n_dev = mesh.shape[axis]
    e = edges.i.shape[0]
    pad = (-e) % n_dev

    def pad_leaf(a):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths)

    padded = jax.tree_util.tree_map(pad_leaf, edges)
    padded = padded._replace(
        valid=jnp.pad(edges.valid, (0, pad), constant_values=False))
    spec = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, spec), padded)
