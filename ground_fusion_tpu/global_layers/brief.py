"""FAST corner detection + BRIEF binary descriptors, batched on device.

TPU-native equivalents of the keyframe descriptor path
(``dense_map/src/keyframe.cpp:160-186`` computeBRIEFPoint: cv::FAST threshold
20 + DVision BRIEF; ``ThirdParty/DVision/BRIEF.cpp``): FAST's 16-point circle
test becomes a stack of rolled comparisons over the whole image (pure VPU
elementwise work), and the 256 BRIEF pairwise intensity tests become one
gather + compare per keypoint batch, packed into 8 × uint32 words so Hamming
distance is XOR + popcount — int ops the VPU chews through.

The test-pair pattern is generated from a fixed RNG seed (the reference ships
a learned .yml pattern; any fixed pattern works as long as both frames use the
same one — documented divergence)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# 16-point Bresenham circle of radius 3 (cv::FAST)
_CIRCLE = np.array(
    [(0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
     (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3)],
    np.int32,
)


def fast_score(img: jax.Array, threshold: float = 20.0, arc: int = 9) -> jax.Array:
    """FAST-N corner response: a pixel is a corner if ≥ ``arc`` contiguous
    circle pixels are all brighter (or all darker) than center ± threshold.
    Returns a response map (sum of absolute differences over the passing arc,
    0 where not a corner)."""
    h, w = img.shape
    rolled = jnp.stack(
        [jnp.roll(img, (-int(dy), -int(dx)), axis=(0, 1)) for dx, dy in _CIRCLE]
    )                                                       # [16, H, W]
    brighter = rolled > img[None] + threshold
    darker = rolled < img[None] - threshold

    def arc_ok(mask):
        # contiguous run of length >= arc on the 16-cycle: AND of `arc`
        # consecutive rotations, OR over start offsets
        runs = []
        for s in range(16):
            acc = jnp.ones_like(mask[0], dtype=bool)
            for k in range(arc):
                acc = acc & mask[(s + k) % 16]
            runs.append(acc)
        return jnp.any(jnp.stack(runs), axis=0)

    is_corner = arc_ok(brighter) | arc_ok(darker)
    sad = jnp.sum(jnp.abs(rolled - img[None]), axis=0)
    resp = jnp.where(is_corner, sad, 0.0)
    # clear the 3px border (circle would wrap)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    edge = (ys < 3) | (ys >= h - 3) | (xs < 3) | (xs >= w - 3)
    return jnp.where(edge, 0.0, resp)


@partial(jax.jit, static_argnames=("max_kp", "nms"))
def fast_detect(img: jax.Array, threshold: float = 20.0, max_kp: int = 500,
                nms: int = 3):
    """FAST keypoints with local non-max suppression → top-``max_kp``.
    Returns (pts [K,2] xy, ok [K])."""
    resp = fast_score(img, threshold)
    dil = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max,
                                (2 * nms + 1, 2 * nms + 1), (1, 1), "SAME")
    peak = (resp == dil) & (resp > 0)
    h, w = img.shape
    score = jnp.where(peak, resp, -jnp.inf).reshape(-1)
    vals, idx = jax.lax.top_k(score, max_kp)
    pts = jnp.stack([(idx % w).astype(img.dtype), (idx // w).astype(img.dtype)], -1)
    return pts, jnp.isfinite(vals) & (vals > 0)


def brief_pattern(n_bits: int = 256, patch: int = 24, seed: int = 7):
    """Fixed Gaussian test-pair pattern (DVision BRIEF uses a learned pattern
    loaded from brief_pattern.yml; a fixed random pattern is functionally
    equivalent for matching within this system)."""
    rng = np.random.default_rng(seed)
    sigma = patch / 5.0
    a = np.clip(rng.normal(0, sigma, (n_bits, 2)), -patch // 2, patch // 2)
    b = np.clip(rng.normal(0, sigma, (n_bits, 2)), -patch // 2, patch // 2)
    return a.astype(np.float32), b.astype(np.float32)


@partial(jax.jit, static_argnames=())
def brief_describe(img: jax.Array, pts: jax.Array, pat_a: jax.Array,
                   pat_b: jax.Array) -> jax.Array:
    """256-bit BRIEF descriptors packed as [K, 8] uint32.

    Smoothed intensity comparisons I(p+a) < I(p+b) per test pair (BRIEF.cpp
    operator()); sampling is nearest-pixel on a lightly box-blurred image."""
    # 3x3 box blur ≈ the reference's Gaussian smoothing
    k = jnp.ones((3, 3), img.dtype) / 9.0
    sm = jax.lax.conv_general_dilated(img[None, None], k[None, None], (1, 1), "SAME")[0, 0]
    h, w = img.shape

    def sample(centers, offs):
        x = jnp.clip(jnp.round(centers[:, None, 0] + offs[None, :, 0]).astype(jnp.int32), 0, w - 1)
        y = jnp.clip(jnp.round(centers[:, None, 1] + offs[None, :, 1]).astype(jnp.int32), 0, h - 1)
        return sm[y, x]                                     # [K, 256]

    ia = sample(pts, pat_a)
    ib = sample(pts, pat_b)
    bits = (ia < ib).astype(jnp.uint32)                     # [K, 256]
    words = bits.reshape(bits.shape[0], 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts[None, None, :], axis=-1)  # [K, 8] uint32


def hamming_matrix(da: jax.Array, db: jax.Array) -> jax.Array:
    """Pairwise Hamming distances between packed descriptor sets
    ([Ka,8] × [Kb,8] uint32 → [Ka,Kb] int32) via XOR + popcount
    (keyframe.cpp HammingDis)."""
    x = da[:, None, :] ^ db[None, :, :]
    # popcount via jnp bitwise ops (no native popcount primitive on u32 vecs)
    c = x - ((x >> 1) & 0x55555555)
    c = (c & 0x33333333) + ((c >> 2) & 0x33333333)
    c = (c + (c >> 4)) & 0x0F0F0F0F
    # shift-add byte sum (the 0x01010101-multiply trick assumes 32-bit
    # wraparound, which x64-promoted uints break)
    c = c + (c >> 8)
    c = (c + (c >> 16)) & 0x3F
    return jnp.sum(c, axis=-1).astype(jnp.int32)


@jax.jit
def match_brief(desc_cur: jax.Array, ok_cur: jax.Array, desc_old: jax.Array,
                ok_old: jax.Array, thresh: int = 80):
    """Best-match search with Hamming gate (keyframe.cpp:194-244
    searchInAera/searchByBRIEFDes): for every current descriptor, the nearest
    old descriptor if dist < 80. Returns (idx [Kc], matched [Kc]).

    Uses the MXU bit-matmul distance (``ops.pallas.hamming``) — exact, and
    ~5× the SWAR broadcast on TPU; the Pallas XOR+popcount tile kernel is the
    VPU alternative for when the MXU is busy."""
    from ..ops.pallas.hamming import hamming_matrix_mxu

    d = hamming_matrix_mxu(desc_cur, desc_old)
    d = jnp.where(ok_old[None, :], d, 10_000)
    idx = jnp.argmin(d, axis=1)
    best = jnp.take_along_axis(d, idx[:, None], axis=1)[:, 0]
    return idx, ok_cur & (best < thresh)
