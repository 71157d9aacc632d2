"""Pallas LK level kernel vs the JAX reference (CPU interpret mode)."""

import jax.numpy as jnp
import numpy as np

from ground_fusion_tpu.frontend.klt import _lk_level
from ground_fusion_tpu.ops.pallas.klt import lk_level_pallas


def _textured(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.normal(0, 1, (h, w))
    # separable box blur for smooth gradients (no scipy dependency)
    k = np.ones(5) / 5.0
    for axis in (0, 1):
        base = np.apply_along_axis(lambda m: np.convolve(m, k, mode="same"),
                                   axis, base)
    return base * 400 + 128


def test_lk_level_pallas_matches_jax():
    h, w = 200, 280
    tex = _textured(h, w)
    prev = jnp.asarray(tex, jnp.float32)
    cur = jnp.asarray(np.roll(tex, (3, -2), (0, 1)), jnp.float32)
    rng = np.random.default_rng(1)
    n = 24
    pts = jnp.asarray(
        np.stack([rng.uniform(40, w - 40, n), rng.uniform(40, h - 40, n)], -1),
        jnp.float32)
    vv = jnp.ones(n, bool)

    ref_pts, ref_ok = _lk_level(prev, cur, pts, pts, vv, half=10, iters=10)
    pal_pts, pal_ok = lk_level_pallas(prev, cur, pts, pts, vv, half=10, iters=10)
    ref_pts, ref_ok = np.asarray(ref_pts), np.asarray(ref_ok)
    pal_pts, pal_ok = np.asarray(pal_pts), np.asarray(pal_ok)
    both = ref_ok & pal_ok
    assert both.sum() >= n // 2
    d = np.linalg.norm(ref_pts - pal_pts, axis=1)
    assert d[both].max() < 1e-2, d[both].max()
    # the integer roll must be recovered: points moved by (-2, +3) → track
    # lands at p + (dx, dy) of the content shift
    shift_err = np.linalg.norm(
        pal_pts[both] - (np.asarray(pts)[both] + np.array([-2.0, 3.0])), axis=1)
    assert np.median(shift_err) < 0.1, np.median(shift_err)


def test_lk_level_pallas_rejects_flat():
    h, w = 128, 160
    prev = jnp.full((h, w), 100.0, jnp.float32)
    cur = prev
    pts = jnp.asarray([[80.0, 64.0], [40.0, 40.0]], jnp.float32)
    vv = jnp.ones(2, bool)
    _, ok = lk_level_pallas(prev, cur, pts, pts, vv)
    assert not bool(ok.any())  # zero-texture patches gate out on min-eig
