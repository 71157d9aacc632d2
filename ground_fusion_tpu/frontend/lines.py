"""Line features: geometry (Plücker/orthonormal), projection factor, tracking.

Re-design of the line stack (``utility/line_geometry.{h,cpp}`` plücker↔orth;
``factor/line_projection_factor.cpp:18-52`` point-to-line residual of the
projected line against observed segment endpoints; ``linefeatureTracker/``
LSD + LBD, #4/#11/#17):

- geometry/factor: batched jnp twins of the reference formulas; Jacobians by
  forward-mode AD against the 4-dim orthonormal tangent (the reference's
  ``LineOrthParameterization``).
- detection: the custom-LSD fork becomes a tile-PCA segment detector —
  structure-tensor anisotropy per tile, eigen-direction line fit, collinear
  tile merging. Same role (segments ≥ min length), branch-free batched math
  instead of region growing; a documented divergence.
- description/matching: simplified LBD — banded gradient statistics sampled
  along the segment, matched by descriptor distance + angle/overlap gates
  (linefeature_tracker.cpp:77-135).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.so3 import quat_to_mat, skew


# ---------------------------------------------------------------------------
# Plücker / orthonormal conversions (line_geometry.cpp:56-110)
# ---------------------------------------------------------------------------


def plk_to_orth(plk: jax.Array) -> jax.Array:
    n, v = plk[..., 0:3], plk[..., 3:6]
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    nv = jnp.linalg.norm(v, axis=-1, keepdims=True)
    u1 = n / jnp.maximum(nn, 1e-12)
    u2 = v / jnp.maximum(nv, 1e-12)
    u3 = jnp.cross(u1, u2)
    t0 = jnp.arctan2(u2[..., 2], u3[..., 2])
    t1 = jnp.arcsin(jnp.clip(-u1[..., 2], -1.0, 1.0))
    t2 = jnp.arctan2(u1[..., 1], u1[..., 0])
    w = jnp.concatenate([nn, nv], axis=-1)
    w = w / jnp.linalg.norm(w, axis=-1, keepdims=True)
    phi = jnp.arcsin(jnp.clip(w[..., 1], -1.0, 1.0))
    return jnp.stack([t0, t1, t2, phi], axis=-1)


def orth_to_plk(orth: jax.Array) -> jax.Array:
    s1, c1 = jnp.sin(orth[..., 0]), jnp.cos(orth[..., 0])
    s2, c2 = jnp.sin(orth[..., 1]), jnp.cos(orth[..., 1])
    s3, c3 = jnp.sin(orth[..., 2]), jnp.cos(orth[..., 2])
    u1 = jnp.stack([c2 * c3, c2 * s3, -s2], axis=-1)
    u2 = jnp.stack([s1 * s2 * c3 - c1 * s3, s1 * s2 * s3 + c1 * c3, s1 * c2], axis=-1)
    w1 = jnp.cos(orth[..., 3])[..., None]
    w2 = jnp.sin(orth[..., 3])[..., None]
    return jnp.concatenate([w1 * u1, w2 * u2], axis=-1)


def plk_transform(plk_w: jax.Array, q_cw: jax.Array, t_cw: jax.Array) -> jax.Array:
    """plk_from_pose (line_geometry.cpp): world plücker → camera frame given
    camera pose (R_wc, t_wc) — i.e. n_c = R_cwᵀ... reference plk_from_pose
    takes (Rcw? naming is world-from-cam); following Evaluate's usage:
    line_b = plk_from_pose(line_w, R_wb, t_wb): n_b = Rᵀ n_w − [Rᵀ t]ₓ Rᵀ v_w,
    v_b = Rᵀ v_w."""
    R = quat_to_mat(q_cw)                       # world_R_frame
    n_w, v_w = plk_w[..., 0:3], plk_w[..., 3:6]
    Rt = jnp.swapaxes(R, -1, -2)
    n = jnp.einsum("...ij,...j->...i", Rt, n_w)
    v = jnp.einsum("...ij,...j->...i", Rt, v_w)
    t_in = jnp.einsum("...ij,...j->...i", Rt, t_cw)
    n = n - jnp.cross(t_in, v)
    return jnp.concatenate([n, v], axis=-1)


def line_residual_raw(pose_i, ex, orth, obs4):
    """lineProjectionFactor::Evaluate (:18-52): world orth line → body →
    camera; residual = signed distances of both observed endpoints to the
    projected infinite line nc, normalized."""
    plk_w = orth_to_plk(orth)
    line_b = plk_transform(plk_w, pose_i[3:7], pose_i[0:3])
    line_c = plk_transform(line_b, ex[3:7], ex[0:3])
    nc = line_c[0:3]
    l_norm = jnp.sqrt(jnp.maximum(nc[0] ** 2 + nc[1] ** 2, 1e-12))
    e1 = obs4[0] * nc[0] + obs4[1] * nc[1] + nc[2]
    e2 = obs4[2] * nc[0] + obs4[3] * nc[1] + nc[2]
    return jnp.stack([e1, e2]) / l_norm


def line_factor(pose_i, ex, orth, obs4, sqrt_info_scale):
    """Whitened residual + Jacobian wrt [δpose(6), δex(6), δorth(4)] →
    (r[2], J[2,16])."""

    def r_of(d):
        from ..geometry.se3 import pose_boxplus

        return sqrt_info_scale * line_residual_raw(
            pose_boxplus(pose_i, d[0:6]), pose_boxplus(ex, d[6:12]),
            orth + d[12:16], obs4,
        )

    z = jnp.zeros(16, pose_i.dtype)
    return r_of(z), jax.jacfwd(r_of)(z)


def triangulate_line(obs_i4, obs_j4, cam_i_pose, cam_j_pose):
    """Two-view line triangulation: plane(cam_i, endpoints_i) ∩
    plane(cam_j, endpoints_j) → world plücker (pipi_plk,
    line_geometry.cpp)."""
    from ..geometry.se3 import pose_apply

    def plane_of(obs4, cam):
        p1 = pose_apply(cam, jnp.array([obs4[0], obs4[1], 1.0], obs4.dtype))
        p2 = pose_apply(cam, jnp.array([obs4[2], obs4[3], 1.0], obs4.dtype))
        c = cam[0:3]
        nrm = jnp.cross(p1 - c, p2 - c)
        d = -jnp.dot(nrm, c)
        return jnp.concatenate([nrm, d[None]])

    pi1 = plane_of(obs_i4, cam_i_pose)
    pi2 = plane_of(obs_j4, cam_j_pose)
    # dual Plücker matrix from two planes: L* = π1 π2ᵀ − π2 π1ᵀ;
    # the moment n sits in the top-right column, the direction v in the
    # skew-symmetric 3×3 part (pipi_plk, line_geometry.cpp)
    M = pi1[:, None] * pi2[None, :] - pi2[:, None] * pi1[None, :]
    n = M[0:3, 3]
    v = jnp.stack([M[2, 1], M[0, 2], M[1, 0]])
    return jnp.concatenate([n, v])


# ---------------------------------------------------------------------------
# Tile-PCA segment detection + banded descriptor
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("tile", "max_lines"))
def detect_segments(img: jax.Array, tile: int = 16, max_lines: int = 64,
                    aniso_thresh: float = 0.75, mag_thresh: float = 8.0):
    """Line segments from per-tile structure-tensor PCA. Returns endpoints
    [max_lines, 4] (x1,y1,x2,y2) px, strengths, valid."""
    h, w = img.shape
    gx = jnp.zeros_like(img).at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    gy = jnp.zeros_like(img).at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))
    mag = jnp.sqrt(gx * gx + gy * gy)
    strong = mag > mag_thresh

    th, tw = h // tile, w // tile

    def tile_stats(a):
        return a[: th * tile, : tw * tile].reshape(th, tile, tw, tile).transpose(0, 2, 1, 3)

    GX, GY, M, S = map(tile_stats, (gx, gy, mag, strong.astype(img.dtype)))
    # structure tensor per tile over strong pixels
    w11 = jnp.sum(GX * GX * S, axis=(2, 3))
    w12 = jnp.sum(GX * GY * S, axis=(2, 3))
    w22 = jnp.sum(GY * GY * S, axis=(2, 3))
    cnt = jnp.sum(S, axis=(2, 3))
    tr = w11 + w22
    det = w11 * w22 - w12 * w12
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))
    lam1 = 0.5 * (tr + disc)
    lam2 = 0.5 * (tr - disc)
    aniso = (lam1 - lam2) / jnp.maximum(lam1 + lam2, 1e-9)
    good = (aniso > aniso_thresh) & (cnt > tile)

    # gradient direction = dominant eigvec; LINE direction is orthogonal.
    # Two algebraically-equivalent eigvec forms — each degenerates for a
    # different edge orientation, so pick the better-conditioned one per tile
    exa, eya = w12, lam1 - w11
    exb, eyb = lam1 - w22, w12
    na = exa * exa + eya * eya
    nb = exb * exb + eyb * eyb
    use_a = na >= nb
    ex_ = jnp.where(use_a, exa, exb)
    ey_ = jnp.where(use_a, eya, eyb)
    nrm = jnp.sqrt(jnp.maximum(ex_ * ex_ + ey_ * ey_, 1e-12))
    gdir_x, gdir_y = ex_ / nrm, ey_ / nrm
    ldir_x, ldir_y = -gdir_y, gdir_x

    # strong-pixel centroid per tile (weighted by magnitude)
    ys = jnp.arange(tile, dtype=img.dtype)
    cx_loc = jnp.sum(M * S * ys[None, None, None, :], axis=(2, 3)) / jnp.maximum(
        jnp.sum(M * S, axis=(2, 3)), 1e-9)
    cy_loc = jnp.sum(M * S * ys[None, None, :, None], axis=(2, 3)) / jnp.maximum(
        jnp.sum(M * S, axis=(2, 3)), 1e-9)
    cx = cx_loc + jnp.arange(tw)[None, :] * tile
    cy = cy_loc + jnp.arange(th)[:, None] * tile

    half = tile * 0.5
    x1 = cx - ldir_x * half
    y1 = cy - ldir_y * half
    x2 = cx + ldir_x * half
    y2 = cy + ldir_y * half
    seg = jnp.stack([x1, y1, x2, y2], axis=-1).reshape(-1, 4)
    strength = jnp.where(good, lam1, 0.0).reshape(-1)
    top = jax.lax.top_k(strength, max_lines)
    return seg[top[1]], top[0], top[0] > 0


@partial(jax.jit, static_argnames=("n_samples", "n_bands"))
def lbd_describe(img: jax.Array, segs: jax.Array, n_samples: int = 16,
                 n_bands: int = 5):
    """Simplified LBD: gradient means/stds in parallel bands along each
    segment → [L, n_bands*4] float descriptor (binary_descriptor_custom
    statistics layer)."""
    h, w = img.shape
    gx = jnp.zeros_like(img).at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    gy = jnp.zeros_like(img).at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))

    def one(seg):
        p1, p2 = seg[0:2], seg[2:4]
        d = p2 - p1
        ln = jnp.maximum(jnp.linalg.norm(d), 1e-6)
        ud = d / ln
        un = jnp.stack([-ud[1], ud[0]])
        ts = jnp.linspace(0.0, 1.0, n_samples)
        offs = jnp.arange(n_bands, dtype=img.dtype) - (n_bands - 1) / 2.0
        pts = (p1[None, None, :] + ts[:, None, None] * d[None, None, :]
               + offs[None, :, None] * 2.0 * un[None, None, :])
        xi = jnp.clip(jnp.round(pts[..., 0]).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(jnp.round(pts[..., 1]).astype(jnp.int32), 0, h - 1)
        gpar = gx[yi, xi] * ud[0] + gy[yi, xi] * ud[1]      # [S, B]
        gperp = gx[yi, xi] * un[0] + gy[yi, xi] * un[1]
        feats = jnp.concatenate([
            gpar.mean(0), gpar.std(0), gperp.mean(0), gperp.std(0)
        ])
        return feats / jnp.maximum(jnp.linalg.norm(feats), 1e-9)

    return jax.vmap(one)(segs)


class LineTracker:
    """Frame-to-frame line tracking with persistent ids — the
    ``LineFeatureTracker::readImage`` role (linefeature_tracker.cpp:77-135):
    detect segments, describe, match against the previous frame; matched
    segments keep their id, new segments get fresh ids. Returns id →
    normalized-plane endpoints [x1,y1,x2,y2] (the ``lineobs`` payload)."""

    def __init__(self, fx: float, fy: float, cx: float, cy: float,
                 max_lines: int = 64, min_len_px: float = 60.0):
        self.K = (fx, fy, cx, cy)
        self.max_lines = max_lines
        self.min_len_px = min_len_px
        self.prev = None            # (segs, desc, ok, ids)
        self._next_id = 0

    def _normalize(self, seg: np.ndarray) -> np.ndarray:
        fx, fy, cx, cy = self.K
        return np.array([
            (seg[0] - cx) / fx, (seg[1] - cy) / fy,
            (seg[2] - cx) / fx, (seg[3] - cy) / fy,
        ], np.float64)

    def track(self, img: np.ndarray) -> dict:
        import numpy as _np

        imj = jnp.asarray(img, jnp.float32)
        segs, strength, ok = detect_segments(imj, max_lines=self.max_lines)
        desc = lbd_describe(imj, segs)
        segs_np = _np.asarray(segs)
        ok_np = _np.asarray(ok)
        seg_len = _np.hypot(segs_np[:, 2] - segs_np[:, 0], segs_np[:, 3] - segs_np[:, 1])
        ok_np = ok_np & (seg_len >= self.min_len_px * 0.25)  # tile-limited lengths

        ids = _np.full(len(segs_np), -1, _np.int64)
        if self.prev is not None:
            psegs, pdesc, pok, pids = self.prev
            idx, matched = match_lines(desc, segs, jnp.asarray(ok_np),
                                       pdesc, psegs, jnp.asarray(pok))
            idx, matched = _np.asarray(idx), _np.asarray(matched)
            used = set()
            for i in _np.nonzero(matched & ok_np)[0]:
                j = int(idx[i])
                if j in used:
                    continue
                used.add(j)
                ids[i] = pids[j]
        for i in _np.nonzero(ok_np & (ids < 0))[0]:
            ids[i] = self._next_id
            self._next_id += 1
        self.prev = (segs, desc, ok_np, ids)
        return {int(ids[i]): self._normalize(segs_np[i])
                for i in _np.nonzero(ok_np)[0]}


@jax.jit
def match_lines(desc_a, segs_a, ok_a, desc_b, segs_b, ok_b,
                desc_thresh: float = 0.35, angle_thresh: float = 0.2,
                max_midpoint_dist: float = 60.0):
    """Descriptor NN with angle + spatial-proximity consistency gates
    (the reference's matcher combines LBD distance with geometric
    constraints, linefeature_tracker.cpp:77-135). Returns (idx [La],
    matched [La])."""
    d = jnp.linalg.norm(desc_a[:, None, :] - desc_b[None, :, :], axis=-1)

    def ang(s):
        return jnp.arctan2(s[..., 3] - s[..., 1], s[..., 2] - s[..., 0])

    def mid(s):
        return 0.5 * jnp.stack([s[..., 0] + s[..., 2], s[..., 1] + s[..., 3]], -1)

    da = ang(segs_a)[:, None] - ang(segs_b)[None, :]
    da = jnp.abs(jnp.arctan2(jnp.sin(da), jnp.cos(da)))
    da = jnp.minimum(da, jnp.pi - da)                 # direction-agnostic
    dm = jnp.linalg.norm(mid(segs_a)[:, None, :] - mid(segs_b)[None, :, :], axis=-1)
    # proximity participates in the cost so equal descriptors break ties
    # toward the spatially-nearest candidate
    cost = d + 1e-3 * dm
    cost = jnp.where(ok_b[None, :] & (da < angle_thresh)
                     & (dm < max_midpoint_dist), cost, 1e9)
    idx = jnp.argmin(cost, axis=1)
    best_desc = jnp.take_along_axis(d, idx[:, None], axis=1)[:, 0]
    picked = jnp.take_along_axis(cost, idx[:, None], axis=1)[:, 0] < 1e8
    return idx, ok_a & picked & (best_desc < desc_thresh)
