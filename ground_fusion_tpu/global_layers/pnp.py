"""Batched PnP with fixed-round RANSAC for loop geometric verification.

Replaces ``cv::solvePnPRansac`` in ``KeyFrame::PnPRANSAC``
(``dense_map/src/keyframe.cpp:273-329``: reprojection gate 10/460, 0.99
confidence, iterative refinement seeded at the drift-corrected VIO pose).
RANSAC's data-dependent loop becomes a fixed bank of hypotheses scored in
parallel: every hypothesis Gauss-Newton-refines the seed pose on its own
4-point minimal set (vmapped), inliers are counted with the same gate, and the
winner is re-refined on all inliers — identical decision surface, constant
shapes."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.se3 import pose_apply_inv, pose_boxplus


def _reproj_residuals(pose, pts3d, obs2d):
    """Normalized-plane reprojection residuals [N,2] of world points under a
    world_T_cam pose."""
    pc = pose_apply_inv(pose, pts3d)
    z = jnp.maximum(pc[..., 2], 1e-6)
    return pc[..., 0:2] / z[..., None] - obs2d


def pnp_gn(pose0, pts3d, obs2d, weights, iters: int = 8):
    """Weighted GN refinement of a camera pose on 2D-3D correspondences."""

    def step(pose, _):
        def r_of(delta):
            return (_reproj_residuals(pose_boxplus(pose, delta), pts3d, obs2d)
                    * weights[:, None]).reshape(-1)

        z = jnp.zeros(6, pose.dtype)
        r = r_of(z)
        J = jax.jacfwd(r_of)(z)
        H = J.T @ J + 1e-6 * jnp.eye(6, dtype=pose.dtype)
        delta = jnp.linalg.solve(H, -J.T @ r)
        return pose_boxplus(pose, delta), None

    pose, _ = jax.lax.scan(step, pose0, None, length=iters)
    return pose


@partial(jax.jit, static_argnames=("n_hyp", "iters"))
def pnp_ransac(pose0, pts3d, obs2d, valid, key, n_hyp: int = 64,
               inlier_thresh: float = 10.0 / 460.0, iters: int = 6,
               min_inliers: int = 25):
    """Fixed-round parallel RANSAC PnP.

    pose0: seed world_T_cam [7]; pts3d [N,3]; obs2d [N,2] normalized; valid
    [N]. Returns (pose [7], inlier_mask [N], ok scalar) — ok mirrors the
    reference's MIN_LOOP_NUM inlier gate (keyframe.cpp:341)."""
    n = pts3d.shape[0]
    dtype = pts3d.dtype
    w_all = valid.astype(dtype)

    # random 4-point minimal sets (biased to valid entries by weighted gumbel)
    keys = jax.random.split(key, n_hyp)

    def one_hyp(k):
        noise = jax.random.gumbel(k, (n,), dtype)
        scores = jnp.where(valid, noise, -jnp.inf)
        idx = jax.lax.top_k(scores, 4)[1]
        sel = jnp.zeros((n,), dtype).at[idx].set(1.0)
        pose = pnp_gn(pose0, pts3d, obs2d, sel * w_all, iters)
        r = _reproj_residuals(pose, pts3d, obs2d)
        inl = valid & (jnp.linalg.norm(r, axis=-1) < inlier_thresh)
        return pose, jnp.sum(inl)

    poses, counts = jax.vmap(one_hyp)(keys)
    best = jnp.argmax(counts)
    pose_best = poses[best]

    r = _reproj_residuals(pose_best, pts3d, obs2d)
    inliers = valid & (jnp.linalg.norm(r, axis=-1) < inlier_thresh)
    pose_ref = pnp_gn(pose_best, pts3d, obs2d, inliers.astype(dtype), iters)
    r2 = _reproj_residuals(pose_ref, pts3d, obs2d)
    inliers = valid & (jnp.linalg.norm(r2, axis=-1) < inlier_thresh)
    ok = jnp.sum(inliers) >= min_inliers
    return pose_ref, inliers, ok
