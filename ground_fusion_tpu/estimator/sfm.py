"""Visual initialization: relative pose, global SfM, frame PnP.

Re-design of ``initial/solve_5pts.cpp`` (essential-matrix relative pose
:207-243, PnP-with-depth :244+), ``initial/initial_sfm.cpp``
(GlobalSFM::construct/constructWithDepth) and the pivot-frame search of
``Estimator::relativePose`` (``estimator.cpp:2057-2127``): data-dependent
RANSAC loops become fixed banks of vmapped hypotheses, the SfM's incremental
triangulate-PnP chain becomes batched two-view triangulation + batched PnP per
frame, and the final bundle refinement reuses the window solver with all
inertial factors masked off — one code path for SfM and VIO.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.se3 import pose as make_pose, pose_apply_inv, pose_boxplus, pose_compose, pose_inverse
from ..geometry.so3 import mat_to_quat, quat_to_mat
from ..global_layers.pnp import pnp_gn, pnp_ransac
from .window import Tracks, WindowState


def _essential_8pt(xi: jax.Array, xj: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted 8-point essential matrix from normalized correspondences
    ([N,2] each). Returns E [3,3] (up to scale)."""
    n = xi.shape[0]
    ones = jnp.ones((n,), xi.dtype)
    A = jnp.stack(
        [
            xj[:, 0] * xi[:, 0], xj[:, 0] * xi[:, 1], xj[:, 0],
            xj[:, 1] * xi[:, 0], xj[:, 1] * xi[:, 1], xj[:, 1],
            xi[:, 0], xi[:, 1], ones,
        ],
        axis=-1,
    ) * w[:, None]
    _, V = jnp.linalg.eigh(A.T @ A)
    E = V[:, 0].reshape(3, 3)
    # project to the essential manifold: singular values (1, 1, 0)
    U, s, Vt = jnp.linalg.svd(E)
    return U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], E.dtype)) @ Vt


def _decompose_essential(E: jax.Array):
    """Four (R, t) candidates from E."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    return (R1, t), (R1, -t), (R2, t), (R2, -t)


def _triangulate_pair(R, t, xi, xj):
    """Midpoint-free linear triangulation of points in frame i; camera j is
    (R, t): x_j = R x_i + t. Returns depths in frame i + reproj validity."""
    # DLT per point: rows from both views
    n = xi.shape[0]
    ones = jnp.ones((n, 1), xi.dtype)
    ri = jnp.concatenate([xi, ones], axis=-1)          # ray in frame i
    # solve z_i minimizing |cross(x_j_hat, R (z ri) + t)|
    Rri = ri @ R.T                                     # [N,3]
    xjh = jnp.concatenate([xj, ones], axis=-1)
    # cross(xjh, z*Rri + t) = 0 → z * cross(xjh, Rri) = -cross(xjh, t)
    a = jnp.cross(xjh, Rri)
    b = -jnp.cross(xjh, jnp.broadcast_to(t, Rri.shape))
    z = jnp.sum(a * b, axis=-1) / jnp.maximum(jnp.sum(a * a, axis=-1), 1e-12)
    p_i = ri * z[:, None]
    p_j = p_i @ R.T + t
    return z, p_j[:, 2]


@partial(jax.jit, static_argnames=("n_hyp",))
def relative_pose_ransac(xi: jax.Array, xj: jax.Array, valid: jax.Array,
                         key, n_hyp: int = 32, thresh: float = 0.3 / 460.0):
    """Fixed-round RANSAC over 8-point minimal sets + cheirality selection
    (MotionEstimator::solveRelativeRT, solve_5pts.cpp:207-243).

    Returns (pose_j_in_i [7] with unit translation, inliers, ok)."""
    n = xi.shape[0]
    dtype = xi.dtype
    keys = jax.random.split(key, n_hyp)
    w_all = valid.astype(dtype)

    def sampson(E, a, b):
        ah = jnp.concatenate([a, jnp.ones((n, 1), dtype)], axis=-1)
        bh = jnp.concatenate([b, jnp.ones((n, 1), dtype)], axis=-1)
        Ea = ah @ E.T
        Etb = bh @ E
        num = jnp.sum(bh * Ea, axis=-1) ** 2
        den = Ea[:, 0] ** 2 + Ea[:, 1] ** 2 + Etb[:, 0] ** 2 + Etb[:, 1] ** 2
        return num / jnp.maximum(den, 1e-12)

    def one_hyp(k):
        noise = jax.random.gumbel(k, (n,), dtype)
        idx = jax.lax.top_k(jnp.where(valid, noise, -jnp.inf), 8)[1]
        sel = jnp.zeros((n,), dtype).at[idx].set(1.0)
        E = _essential_8pt(xi, xj, sel)
        d = sampson(E, xi, xj)
        inl = valid & (d < thresh * thresh)
        return E, jnp.sum(inl)

    Es, counts = jax.vmap(one_hyp)(keys)
    best = jnp.argmax(counts)
    E = Es[best]
    # refit on inliers
    d = sampson(E, xi, xj)
    inl = valid & (d < thresh * thresh)
    E = _essential_8pt(xi, xj, inl.astype(dtype))
    d = sampson(E, xi, xj)
    inl = valid & (d < thresh * thresh)

    # cheirality: pick the candidate with most positive depths
    cands = _decompose_essential(E)

    def score(c):
        R, t = c
        zi, zj = _triangulate_pair(R, t, xi, xj)
        return jnp.sum(inl & (zi > 0) & (zj > 0))

    scores = jnp.stack([score(c) for c in cands])
    bi = jnp.argmax(scores)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    R, t = Rs[bi], ts[bi]
    # camera j pose in frame i: x_j = R x_i + t ⇒ T_i_j = (Rᵀ, −Rᵀ t)
    pose_ij = make_pose(-R.T @ t, mat_to_quat(R.T))
    ok = (jnp.sum(inl) >= 15) & (scores[bi] > 0.7 * jnp.sum(inl))
    return pose_ij, inl, ok


def find_pivot_frame(tracks: Tracks, min_parallax: float = 30.0 / 460.0,
                     min_corr: int = 20):
    """The reference's pivot search (``Estimator::relativePose``,
    estimator.cpp:2057-2127): earliest frame l with enough correspondences to
    the newest frame and mean parallax above 30/460. Host-side (tiny)."""
    ov = np.asarray(tracks.obs_valid)
    obs = np.asarray(tracks.obs)
    ml, f = ov.shape
    newest = f - 1
    for l in range(f - 1):
        both = ov[:, l] & ov[:, newest]
        if both.sum() < min_corr:
            continue
        par = np.linalg.norm(obs[both, l, 0:2] - obs[both, newest, 0:2], axis=1)
        if par.mean() > min_parallax:
            return l
    return -1


def sfm_construct(tracks: Tracks, key, dtype=jnp.float64, use_depth: bool = False):
    """Global SfM over the window (initial_sfm.cpp construct): pivot two-view
    relative pose → triangulate → PnP every other frame → triangulate all.
    With ``use_depth`` the monocular-scale cloud is rescaled to metric by the
    median ratio of measured RGBD depths to triangulated depths at the pivot
    frame — the role of ``GlobalSFM::constructWithDepth`` (initial_sfm.cpp) /
    ``relativePoseWithDepth`` (estimator.cpp:2057-2127), re-designed: one
    robust global scale instead of per-point depth substitution.
    Returns (poses [F,7] — cam frames, world = pivot cam; ok)."""
    ml, f = np.asarray(tracks.obs_valid).shape
    l = find_pivot_frame(tracks)
    if l < 0:
        return None, False
    newest = f - 1
    ov = jnp.asarray(tracks.obs_valid)
    obs = jnp.asarray(tracks.obs, dtype)

    both = ov[:, l] & ov[:, newest]
    pose_rel, inl, ok = relative_pose_ransac(
        obs[:, l, 0:2], obs[:, newest, 0:2], both, key
    )
    if not bool(ok):
        return None, False

    # triangulate pivot-pair points (world = pivot camera frame)
    R = quat_to_mat(pose_rel[3:7]).T            # x_new = R x_l + t
    t = -R @ pose_rel[0:3]
    zi, _ = _triangulate_pair(R, t, obs[:, l, 0:2], obs[:, newest, 0:2])
    pts_ok = both & inl & (zi > 0.1)

    if use_depth:
        meas_d = obs[:, l, 4]
        d_ok = np.asarray(pts_ok & (meas_d > 0.1) & (meas_d < 20.0))
        if d_ok.sum() >= 8:
            ratio = np.asarray(meas_d)[d_ok] / np.asarray(zi)[d_ok]
            s_med = float(np.median(ratio))
            if s_med > 1e-3:
                zi = zi * s_med
                pose_rel = pose_rel.at[0:3].multiply(s_med)

    poses = jnp.tile(make_pose(jnp.zeros(3, dtype), jnp.asarray([1.0, 0, 0, 0], dtype)), (f, 1))
    poses = poses.at[newest].set(pose_rel)
    rays = jnp.concatenate([obs[:, l, 0:2], jnp.ones((ml, 1), dtype)], axis=-1)
    pts_w = rays * zi[:, None]

    # Incremental resection ↔ intersection, the reference's construct order
    # (initial_sfm.cpp: PnP frame i from known points, triangulate (i,
    # newest), then frames before l backwards, then triangulate all) recast
    # as fixed passes of {PnP every resectable frame; batched multi-view
    # re-triangulation of every track over the known poses}.
    known = np.zeros(f, bool)
    known[l] = known[newest] = True
    for _ in range(3):
        for k in range(f):
            if known[k]:
                continue
            vis = pts_ok & ov[:, k]
            if int(jnp.sum(vis)) < 6:
                continue
            near = min((kk for kk in range(f) if known[kk]), key=lambda kk: abs(kk - k))
            pose_k = pnp_gn(poses[near], pts_w, obs[:, k, 0:2],
                            vis.astype(dtype), iters=10)
            poses = poses.at[k].set(pose_k)
            known[k] = True
        pts_w, pts_ok = _sfm_triangulate_all(poses, jnp.asarray(known), obs, ov)
        if known.all():
            # one more intersection so the final cloud uses every pose
            pts_w, pts_ok = _sfm_triangulate_all(poses, jnp.asarray(known), obs, ov)
            break
    return poses, bool(known.all())


def _sfm_triangulate_all(poses, known, obs, ov, reproj_thresh: float = 10.0 / 460.0):
    """Batched multi-view DLT of every track over the frames whose SfM pose
    is known (the intersection half of initial_sfm.cpp's construct loop):
    two rows per observation, smallest eigenvector of the 4×4 normal matrix,
    validity by observation count, cheirality and reprojection error."""
    ml, f = ov.shape
    dtype = obs.dtype
    R = quat_to_mat(poses[:, 3:7])                        # [F,3,3] world_R_cam
    Rt = jnp.swapaxes(R, -1, -2)
    Pt = -jnp.einsum("fij,fj->fi", Rt, poses[:, 0:3])
    P = jnp.concatenate([Rt, Pt[..., None]], axis=-1)     # [F,3,4]

    ray = jnp.concatenate([obs[..., 0:2], jnp.ones((ml, f, 1), dtype)], axis=-1)
    fdir = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    row0 = fdir[..., 0:1] * P[None, :, 2, :] - fdir[..., 2:3] * P[None, :, 0, :]
    row1 = fdir[..., 1:2] * P[None, :, 2, :] - fdir[..., 2:3] * P[None, :, 1, :]
    use = ov & known[None, :]
    w = use[..., None].astype(dtype)
    A = jnp.concatenate([row0 * w, row1 * w], axis=1)     # [ML,2F,4]
    AtA = jnp.einsum("mri,mrj->mij", A, A)
    _, V = jnp.linalg.eigh(AtA)
    v = V[..., 0]
    wpt = v[:, 0:3] / jnp.where(jnp.abs(v[:, 3:4]) > 1e-9, v[:, 3:4], 1e-9)

    # cheirality + reprojection gate over the known observing frames
    pc = jnp.einsum("fij,mfj->mfi", Rt, wpt[:, None, :] - poses[None, :, 0:3])
    proj = pc[..., 0:2] / jnp.maximum(pc[..., 2:3], 1e-6)
    resid = jnp.linalg.norm(proj - obs[..., 0:2], axis=-1)
    obs_good = use & (pc[..., 2] > 0.05) & (resid < reproj_thresh)
    n_good = jnp.sum(obs_good, axis=1)
    ok = (n_good >= 2) & (n_good >= jnp.sum(use, axis=1) - 1)
    return wpt, ok
