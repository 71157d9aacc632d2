"""Pallas TPU kernel: per-feature Lucas–Kanade tracking on gathered windows.

The front-end hot loop (``feature_tracker.cpp:103-372`` — OpenCV
calcOpticalFlowPyrLK over ~150 patches per frame). TPU-native split of labor:
XLA performs the irregular part — a vmapped ``dynamic_slice`` gathers one
fixed-size search window per feature around its seed (arbitrary offsets are
exactly what XLA's gather lowering is for; Mosaic DMA requires tile-aligned
offsets) — and the Pallas kernel runs the whole 10-iteration LK solve per
feature on the VPU/MXU with zero HBM traffic in the loop.

Subpixel patch extraction inside the kernel: every pixel of a patch shares
the same fractional offset, so bilinear sampling at a dynamic integer corner
is two one-hot selection matmuls ``Syᵀ·win·Sx`` (static shapes, MXU) followed
by four statically-shifted adds. Matches :func:`...frontend.klt._lk_level`
for interior features; window-edge clamping differs at image borders where
the caller culls anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

WIN = 48           # search window per feature (±(WIN/2 − patch) px of motion)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _bilinear_from_window(win, iy, ix, fy, fx, size: int):
    """(size × size) patch at integer corner (iy, ix) + fraction (fy, fx),
    where the fraction is shared by every pixel of the patch."""
    s1 = size + 1
    dtype = win.dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (WIN, s1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (WIN, s1), 1)
    Sy = (rows == cols + iy).astype(dtype)            # [WIN, s1]
    Sx = (rows == cols + ix).astype(dtype)            # [WIN, s1]
    sub = jnp.dot(
        jnp.dot(Sy.T, win, preferred_element_type=jnp.float32).astype(dtype),
        Sx, preferred_element_type=jnp.float32,
    ).astype(dtype)                                    # [s1, s1]
    w00 = (1.0 - fx) * (1.0 - fy)
    w01 = fx * (1.0 - fy)
    w10 = (1.0 - fx) * fy
    w11 = fx * fy
    return (w00 * sub[:-1, :-1] + w01 * sub[:-1, 1:]
            + w10 * sub[1:, :-1] + w11 * sub[1:, 1:])


def _make_kernel(half: int, iters: int, min_eig: float):
    p = 2 * half + 1          # patch size
    pb = p + 2                # template with 1px gradient border

    def kernel(rel_ref, prev_win_ref, cur_win_ref, out_ref):
        import jax.experimental.pallas as pl

        i = pl.program_id(0)
        prev_win = prev_win_ref[0]
        cur_win = cur_win_ref[0]

        # template patch (+1px border) at the prev point, window-relative
        px_prev = rel_ref[i, 0]
        py_prev = rel_ref[i, 1]
        gx0 = px_prev - (half + 1)
        gy0 = py_prev - (half + 1)
        ix0 = jnp.floor(gx0)
        iy0 = jnp.floor(gy0)
        fx0 = gx0 - ix0
        fy0 = gy0 - iy0
        ix0 = jnp.clip(ix0.astype(jnp.int32), 0, WIN - pb - 1)
        iy0 = jnp.clip(iy0.astype(jnp.int32), 0, WIN - pb - 1)
        patch_t = _bilinear_from_window(prev_win, iy0, ix0, fy0, fx0, pb)

        gx = 0.5 * (patch_t[1:-1, 2:] - patch_t[1:-1, :-2])
        gy = 0.5 * (patch_t[2:, 1:-1] - patch_t[:-2, 1:-1])
        t = patch_t[1:-1, 1:-1]
        a11 = jnp.sum(gx * gx)
        a12 = jnp.sum(gx * gy)
        a22 = jnp.sum(gy * gy)
        det = a11 * a22 - a12 * a12
        tr = a11 + a22
        eig_min = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
        n = jnp.asarray(p * p, t.dtype)
        good = (eig_min / n > min_eig)
        inv = jnp.where(det > 1e-12, 1.0 / jnp.where(det > 1e-12, det, 1.0), 0.0)

        # LK iterations on the current window (seed, window-relative)
        px0 = rel_ref[i, 2]
        py0 = rel_ref[i, 3]

        def body(_, pq):
            px, py = pq
            gxc = px - half
            gyc = py - half
            ixc = jnp.floor(gxc)
            iyc = jnp.floor(gyc)
            fxc = gxc - ixc
            fyc = gyc - iyc
            ixc = jnp.clip(ixc.astype(jnp.int32), 0, WIN - p - 1)
            iyc = jnp.clip(iyc.astype(jnp.int32), 0, WIN - p - 1)
            patch_c = _bilinear_from_window(cur_win, iyc, ixc, fyc, fxc, p)
            e = patch_c - t
            b1 = jnp.sum(e * gx)
            b2 = jnp.sum(e * gy)
            dx = inv * (a22 * b1 - a12 * b2)
            dy = inv * (-a12 * b1 + a11 * b2)
            return (px - dx, py - dy)

        px, py = jax.lax.fori_loop(0, iters, body, (px0, py0))
        # result packed into lane 0:3 of this feature's (8, 128) output tile
        # (Mosaic block shapes must be tile-multiples; 3 scalars ride one
        # tile; built with iota masks — scatter doesn't lower on TPU)
        rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        val = jnp.where(cols == 0, px,
                        jnp.where(cols == 1, py, good.astype(px.dtype)))
        out_ref[0] = jnp.where((rows == 0) & (cols < 3), val, 0.0)

    return kernel


@functools.partial(jax.jit, static_argnames=("half", "iters", "min_eig"))
def lk_level_pallas(prev_img, cur_img, pts_prev, pts_cur, valid,
                    half: int = 10, iters: int = 10, min_eig: float = 1e-4):
    """One pyramid level of LK for the whole batch, Pallas-accelerated.

    Same contract as ``frontend.klt._lk_level``: returns (pts, ok) with
    non-converged/low-texture features left at their seed."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pts_prev.shape[0]
    h, w = prev_img.shape
    dtype = prev_img.dtype

    def origin(pts):
        oy = jnp.clip(jnp.round(pts[:, 1]).astype(jnp.int32) - WIN // 2, 0,
                      max(h - WIN, 0))
        ox = jnp.clip(jnp.round(pts[:, 0]).astype(jnp.int32) - WIN // 2, 0,
                      max(w - WIN, 0))
        return oy, ox

    # XLA-side irregular gather: one [WIN, WIN] window per feature
    oy_p, ox_p = origin(pts_prev)
    oy_c, ox_c = origin(pts_cur)

    def slice_win(img, oy, ox):
        return jax.lax.dynamic_slice(img, (oy, ox), (WIN, WIN))

    prev_wins = jax.vmap(slice_win, in_axes=(None, 0, 0))(prev_img, oy_p, ox_p)
    cur_wins = jax.vmap(slice_win, in_axes=(None, 0, 0))(cur_img, oy_c, ox_c)

    # window-relative coordinates [N, 4]: prev point, cur seed
    rel = jnp.stack(
        [pts_prev[:, 0] - ox_p.astype(dtype), pts_prev[:, 1] - oy_p.astype(dtype),
         pts_cur[:, 0] - ox_c.astype(dtype), pts_cur[:, 1] - oy_c.astype(dtype)],
        axis=-1,
    )

    kernel = _make_kernel(half, iters, min_eig)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,               # rel coords live in SMEM
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, WIN, WIN), lambda i, rel: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WIN, WIN), lambda i, rel: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i, rel: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 8, 128), dtype),
        interpret=_interpret(),
    )(rel, prev_wins, cur_wins)

    pts = out[:, 0, 0:2] + jnp.stack([ox_c, oy_c], -1).astype(dtype)
    ok = valid & (out[:, 0, 2] > 0.5)
    pts = jnp.where(ok[:, None], pts, pts_cur)
    return pts, ok
