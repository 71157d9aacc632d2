"""Pyramidal Lucas–Kanade optical flow, batched over features on device.

TPU-native re-design of the reference's front-end hot loop
(``featureTracker/feature_tracker.cpp:103-372`` trackImage: prediction-seeded
``cv::calcOpticalFlowPyrLK`` :118-133, reverse-flow consistency check
:137-153, min-dist mask :60-83, ``goodFeaturesToTrack`` refill :198): the
whole feature batch advances together — every level/iteration is a fixed-shape
``fori_loop`` over vmapped bilinear patch gathers, so one jitted call tracks
all features forward, all features backward, and scores the refill corners.

Layout notes for TPU: patches are gathered with dynamic indices (VPU-bound);
the structure-tensor refill is pure elementwise + reduce-window (VPU/MXU
friendly). A Pallas double-buffered gather kernel is the planned upgrade for
the patch loop; the JAX version is the correctness reference.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


def build_pyramid(img: jax.Array, levels: int) -> list[jax.Array]:
    """[H, W] float image -> list of `levels` images, 2× downsampled each
    (cv::buildOpticalFlowPyramid analog, 2x2 average pooling)."""
    pyr = [img]
    for _ in range(levels - 1):
        a = pyr[-1]
        h2, w2 = (a.shape[0] // 2) * 2, (a.shape[1] // 2) * 2
        a = a[:h2, :w2]
        pyr.append(0.25 * (a[0::2, 0::2] + a[1::2, 0::2] + a[0::2, 1::2] + a[1::2, 1::2]))
    return pyr


def _bilinear_patch(img: jax.Array, center: jax.Array, half: int) -> jax.Array:
    """Gather a (2·half+1)² patch around ``center`` (x, y) with bilinear
    interpolation; out-of-bounds clamps to the border."""
    h, w = img.shape
    n = 2 * half + 1
    dx = jnp.arange(-half, half + 1, dtype=img.dtype)
    gx = center[0] + dx[None, :]
    gy = center[1] + dx[:, None]
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = gx - x0
    fy = gy - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 2)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 2)
    i00 = img[y0i, x0i]
    i01 = img[y0i, x0i + 1]
    i10 = img[y0i + 1, x0i]
    i11 = img[y0i + 1, x0i + 1]
    return (
        i00 * (1 - fx) * (1 - fy)
        + i01 * fx * (1 - fy)
        + i10 * (1 - fx) * fy
        + i11 * fx * fy
    )


def _lk_level(prev_img, cur_img, pts_prev, pts_cur, valid, half: int, iters: int,
              min_eig: float = 1e-4):
    """One pyramid level of LK for the whole feature batch.

    pts are (x, y) at THIS level's scale. Returns updated pts_cur and a
    convergence mask (structure tensor conditioning, like the OpenCV
    minEigThreshold path)."""
    dtype = prev_img.dtype

    def track_one(pp, pc, ok):
        patch_t = _bilinear_patch(prev_img, pp, half + 1)          # template + border
        # Scharr-style central-difference gradients of the template
        gx = 0.5 * (patch_t[1:-1, 2:] - patch_t[1:-1, :-2])
        gy = 0.5 * (patch_t[2:, 1:-1] - patch_t[:-2, 1:-1])
        t = patch_t[1:-1, 1:-1]
        a11 = jnp.sum(gx * gx)
        a12 = jnp.sum(gx * gy)
        a22 = jnp.sum(gy * gy)
        det = a11 * a22 - a12 * a12
        tr = a11 + a22
        eig_min = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
        n = (2 * half + 1) ** 2
        good = ok & (eig_min / n > min_eig)
        inv = jnp.where(det > 1e-12, 1.0 / jnp.where(det > 1e-12, det, 1.0), 0.0)

        def body(_, p):
            patch_c = _bilinear_patch(cur_img, p, half)
            e = patch_c - t
            b1 = jnp.sum(e * gx)
            b2 = jnp.sum(e * gy)
            dx = inv * (a22 * b1 - a12 * b2)
            dy = inv * (-a12 * b1 + a11 * b2)
            return p - jnp.stack([dx, dy])

        p_new = jax.lax.fori_loop(0, iters, body, pc)
        return jnp.where(good, p_new, pc), good

    return jax.vmap(track_one)(pts_prev, pts_cur, valid)


def _lk_level_auto(prev_img, cur_img, pp, pts, ok, half: int, iters: int):
    """Dispatch one LK level: the Pallas per-feature kernel on TPU (16× the
    vmapped-gather version — see ``ops.pallas.klt``), the JAX reference
    elsewhere. Both agree to ~1e-3 px (tests/test_pallas_klt.py)."""
    h, w = prev_img.shape
    if jax.default_backend() == "tpu" and min(h, w) >= 48:
        from ..ops.pallas.klt import lk_level_pallas

        return lk_level_pallas(prev_img, cur_img, pp, pts, ok,
                               half=half, iters=iters)
    return _lk_level(prev_img, cur_img, pp, pts, ok, half, iters)


@partial(jax.jit, static_argnames=("levels", "half", "iters"))
def track_pyramidal(prev_pyr_stack, cur_pyr_stack, pts_prev, pts_seed, valid,
                    levels: int, half: int = 10, iters: int = 10):
    """Coarse-to-fine LK over stacked pyramids.

    ``*_pyr_stack`` are tuples of per-level images (finest first). ``pts_*``
    are pixel coords at full resolution; ``pts_seed`` is the prediction-seeded
    initial guess (``feature_tracker.cpp:118-133``). Returns (pts, ok)."""
    pts = pts_seed / (2.0 ** (levels - 1))
    ok = valid
    for lvl in range(levels - 1, -1, -1):
        scale = 2.0 ** lvl
        pp = pts_prev / scale
        pts, ok_lvl = _lk_level_auto(prev_pyr_stack[lvl], cur_pyr_stack[lvl],
                                     pp, pts, ok, half, iters)
        ok = ok & ok_lvl
        if lvl > 0:
            pts = pts * 2.0
    h, w = cur_pyr_stack[0].shape
    inb = (pts[:, 0] >= 1) & (pts[:, 0] < w - 2) & (pts[:, 1] >= 1) & (pts[:, 1] < h - 2)
    return pts, ok & inb


@partial(jax.jit, static_argnames=("levels", "half", "iters"))
def track_bidirectional(prev_pyr, cur_pyr, pts_prev, pts_seed, valid,
                        levels: int, half: int = 10, iters: int = 10,
                        fb_thresh: float = 0.5):
    """Forward + reverse flow with consistency gate
    (``feature_tracker.cpp:137-153``: reverse LK seeded at the forward result,
    keep if the round trip lands within 0.5 px)."""
    fwd, ok_f = track_pyramidal(prev_pyr, cur_pyr, pts_prev, pts_seed, valid,
                                levels, half, iters)
    back, ok_b = track_pyramidal(cur_pyr, prev_pyr, fwd, pts_prev, ok_f,
                                 levels, half, iters)
    dist = jnp.linalg.norm(back - pts_prev, axis=-1)
    ok = ok_f & ok_b & (dist <= fb_thresh)
    return fwd, ok


# ---------------------------------------------------------------------------
# Shi-Tomasi corner refill with min-dist suppression
# ---------------------------------------------------------------------------


def shi_tomasi_response(img: jax.Array, window: int = 3) -> jax.Array:
    """Min-eigenvalue corner response (cv::goodFeaturesToTrack's score)."""
    gx = jnp.zeros_like(img).at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    gy = jnp.zeros_like(img).at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))
    k = jnp.ones((window, window), img.dtype) / (window * window)

    def box(a):
        return jax.lax.conv_general_dilated(
            a[None, None], k[None, None], (1, 1), "SAME",
        )[0, 0]

    a11 = box(gx * gx)
    a12 = box(gx * gy)
    a22 = box(gy * gy)
    tr = a11 + a22
    det = a11 * a22 - a12 * a12
    return 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0)))


@partial(jax.jit, static_argnames=("max_new", "min_dist", "border"))
def refill_corners(img: jax.Array, existing_pts: jax.Array, existing_valid: jax.Array,
                   max_new: int, min_dist: int = 30, border: int = 5,
                   quality: float = 0.01):
    """Top-``max_new`` Shi-Tomasi corners at least ``min_dist`` from every
    existing feature and from each other (the min-dist mask of
    ``feature_tracker.cpp:60-83`` + ``goodFeaturesToTrack`` :198).

    Suppression trick (TPU-shaped): dilate the response with a min_dist-sized
    max-pool; a pixel is a candidate iff it equals the dilated max (local
    peak in its neighborhood), which enforces pairwise min-dist among picks
    in one shot instead of the reference's sequential mask painting."""
    h, w = img.shape
    resp = shi_tomasi_response(img)

    # mask borders
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inb = (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    resp = jnp.where(inb, resp, -jnp.inf)

    # mask around existing features: scatter a min_dist box of -inf
    def mask_one(r, pt_ok):
        pt, ok = pt_ok
        d = min_dist
        yy = jnp.clip(jnp.arange(-d, d + 1) + pt[1].astype(jnp.int32), 0, h - 1)
        xx = jnp.clip(jnp.arange(-d, d + 1) + pt[0].astype(jnp.int32), 0, w - 1)
        val = jnp.where(ok, -jnp.inf, 0.0)
        return r.at[yy[:, None], xx[None, :]].add(val), None

    resp, _ = jax.lax.scan(mask_one, resp, (existing_pts, existing_valid))

    # non-max suppression over the min_dist neighborhood
    dil = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (2 * min_dist + 1, 2 * min_dist + 1),
        (1, 1), "SAME",
    )
    peak = (resp == dil) & jnp.isfinite(resp) & (resp > quality * jnp.max(resp))
    score = jnp.where(peak, resp, -jnp.inf).reshape(-1)
    top = jax.lax.top_k(score, max_new)
    idx = top[1]
    pts = jnp.stack([(idx % w).astype(img.dtype), (idx // w).astype(img.dtype)], axis=-1)
    ok = jnp.isfinite(top[0])
    return pts, ok


@jax.jit
def sample_depth(depth_img: jax.Array, pts: jax.Array) -> jax.Array:
    """Nearest-neighbor depth lookup at feature pixels
    (``feature_tracker.cpp:360-366``)."""
    h, w = depth_img.shape
    x = jnp.clip(jnp.round(pts[:, 0]).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(jnp.round(pts[:, 1]).astype(jnp.int32), 0, h - 1)
    return depth_img[y, x]
