"""Batched landmark triangulation (plain + RGBD depth-verified).

Re-designs ``FeatureManager::triangulate`` (``feature_manager.cpp:669-724``,
per-feature Jacobi SVD loops) and ``triangulateWithDepth`` (``:726-799``,
cross-frame depth-consistency voting) as fully batched tensor programs over
the padded ``Tracks`` table: the SVD null-vector becomes an ``eigh`` of the
4×4 normal matrix per landmark, and the depth-verification double loop over
observation pairs becomes one masked ``[ML, F, F]`` tensor reduce — no
per-feature host iteration anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.se3 import pose_compose, rot, trans
from ..geometry.so3 import quat_conj, quat_mul, quat_rotate, quat_rotate_inv
from .window import Tracks, WindowState

INIT_DEPTH = 5.0  # parameters.cpp INIT_DEPTH


def _cam_poses(state: WindowState) -> jax.Array:
    """world_T_cam per frame [F, 7]."""
    return pose_compose(state.poses, state.ex_cam[None, :])


def triangulate_with_depth(
    state: WindowState,
    tracks: Tracks,
    depth_min: float = 0.1,
    depth_max: float = 3.0,
    reproj_thresh: float = 10.0 / 460.0,
) -> Tracks:
    """Depth-verified triangulation (``feature_manager.cpp:726-799``): for
    every observation pair (i, j) of a landmark where i carries a valid RGBD
    depth, back-project i's depth, reproject into j, and where the residual
    passes the gate, vote the implied anchor-frame depth; the landmark takes
    the mean of verified votes and is flagged depth-fixed (estimate_flag=1 →
    ``SetParameterBlockConstant``, ``estimator.cpp:3291``)."""
    ml, f = tracks.obs_valid.shape
    dtype = tracks.obs.dtype
    cams = _cam_poses(state)                       # [F,7]
    need = tracks.active & ~tracks.solve_ok & (jnp.sum(tracks.obs_valid, axis=1) >= 4)

    rays = jnp.concatenate([tracks.obs[..., 0:2], jnp.ones((ml, f, 1), dtype)], axis=-1)
    depths = tracks.obs[..., 4]                    # [ML,F]
    depth_ok = tracks.obs_valid & (depths > depth_min) & (depths < depth_max)

    # 3-D point from obs i's depth, in world:  [ML, F, 3]
    pts_cam_i = rays * depths[..., None]
    pts_w = quat_rotate(rot(cams)[None, :, :], pts_cam_i) + trans(cams)[None, :, :]

    # reproject into every frame j:  [ML, F(i), F(j), 3]
    pts_cj = quat_rotate_inv(
        rot(cams)[None, None, :, :], pts_w[:, :, None, :] - trans(cams)[None, None, :, :]
    )
    proj = pts_cj[..., 0:2] / jnp.maximum(pts_cj[..., 2:3], 1e-6)
    resid = jnp.linalg.norm(proj - tracks.obs[:, None, :, 0:2], axis=-1)   # [ML,F,F]

    ij_ok = (
        depth_ok[:, :, None]
        & tracks.obs_valid[:, None, :]
        & (jnp.arange(f)[None, :, None] != jnp.arange(f)[None, None, :])
        & (resid < reproj_thresh)
        & (pts_cj[..., 2] > 1e-3)
    )

    # anchor-frame depth implied by obs i (independent of j): [ML, F]
    anchor_cam = cams[tracks.start_frame]          # [ML,7]
    z_anchor = quat_rotate_inv(rot(anchor_cam)[:, None, :], pts_w - trans(anchor_cam)[:, None, :])[..., 2]
    votes = jnp.sum(ij_ok, axis=2)                 # [ML,F] — one vote per verified (i,j)
    n_votes = jnp.sum(votes, axis=1)
    depth_ave = jnp.sum(z_anchor * votes, axis=1) / jnp.maximum(n_votes, 1)

    good = need & (n_votes > 0) & (depth_ave > depth_min)
    inv_depth = jnp.where(good, 1.0 / jnp.maximum(depth_ave, 1e-3), tracks.inv_depth)
    return tracks._replace(
        inv_depth=inv_depth,
        solve_ok=tracks.solve_ok | good,
        depth_fixed=jnp.where(need & good, True, tracks.depth_fixed),
    )


def triangulate_svd(state: WindowState, tracks: Tracks) -> Tracks:
    """Multi-view linear triangulation for landmarks still lacking depth
    (``feature_manager.cpp:669-724``). Each observation contributes two DLT
    rows in the anchor-camera frame; the homogeneous solution is the smallest
    eigenvector of the batched 4×4 normal matrix AᵀA."""
    ml, f = tracks.obs_valid.shape
    dtype = tracks.obs.dtype
    cams = _cam_poses(state)
    need = tracks.active & ~tracks.solve_ok & (jnp.sum(tracks.obs_valid, axis=1) >= 4)

    anchor_cam = cams[tracks.start_frame]                        # [ML,7]
    # relative projection anchor_cam_T_cam_j -> P = [R^T | -R^T t] of cam j in anchor
    q_rel = quat_mul(quat_conj(rot(anchor_cam))[:, None, :], rot(cams)[None, :, :])
    t_rel = quat_rotate_inv(
        rot(anchor_cam)[:, None, :], trans(cams)[None, :, :] - trans(anchor_cam)[:, None, :]
    )                                                            # [ML,F,3]
    # rows of P: x_cam_j = R_rel^T (X - t_rel)
    from ..geometry.so3 import quat_to_mat

    R_rel = quat_to_mat(q_rel)                                   # [ML,F,3,3]
    P_rot = jnp.swapaxes(R_rel, -1, -2)                          # R_rel^T
    P_t = -jnp.einsum("mfij,mfj->mfi", P_rot, t_rel)             # [ML,F,3]
    P = jnp.concatenate([P_rot, P_t[..., None]], axis=-1)        # [ML,F,3,4]

    ray = jnp.concatenate([tracks.obs[..., 0:2], jnp.ones((ml, f, 1), dtype)], axis=-1)
    fdir = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    row0 = fdir[..., 0:1] * P[..., 2, :] - fdir[..., 2:3] * P[..., 0, :]
    row1 = fdir[..., 1:2] * P[..., 2, :] - fdir[..., 2:3] * P[..., 1, :]
    w = tracks.obs_valid[..., None].astype(dtype)
    A = jnp.concatenate([row0 * w, row1 * w], axis=1)            # [ML, 2F, 4]

    AtA = jnp.einsum("mri,mrj->mij", A, A)
    s, V = jnp.linalg.eigh(AtA)                                  # ascending
    v = V[..., 0]                                                # smallest eigvec [ML,4]
    depth = v[:, 2] / jnp.where(jnp.abs(v[:, 3]) > 1e-12, v[:, 3], 1e-12)

    good = need & (depth > 0.1)
    new_depth = jnp.where(good, depth, INIT_DEPTH)
    inv_depth = jnp.where(need, 1.0 / jnp.maximum(new_depth, 1e-3), tracks.inv_depth)
    return tracks._replace(inv_depth=inv_depth, solve_ok=tracks.solve_ok | need)


def triangulate_all(state: WindowState, tracks: Tracks, depth_max: float = 3.0) -> Tracks:
    """The reference's per-frame order: depth-verified first, SVD fallback
    (``estimator.cpp:1068-1075`` processImage NON_LINEAR branch)."""
    tracks = triangulate_with_depth(state, tracks, depth_max=depth_max)
    return triangulate_svd(state, tracks)
