"""Pallas TPU kernel: pairwise Hamming distance over packed BRIEF descriptors.

The loop-closure hot op (``dense_map/src/keyframe.cpp`` HammingDis inside the
``searchByBRIEFDes`` double loop — reference walks Ka×Kb descriptor pairs on
one CPU core). TPU-native design: descriptors are [K, 8] uint32 (256 bits);
the distance matrix tiles onto a (TN, TM) grid where each program XORs its
[TN, 8] × [TM, 8] word blocks, popcounts with the SWAR ladder on the VPU, and
reduces over words — no HBM intermediate, one int32 [TN, TM] tile out.

A second entry point (:func:`hamming_matrix_mxu`) uses the identity
``d(a,b) = |a| + |b| − 2·a·b`` on unpacked ±bit planes so the 256-dim
contraction rides the MXU as a bf16 matmul — faster for large K but inexact
beyond 2^8 accumulation only in theory (bf16 holds integers ≤ 256 exactly, so
it is exact here). Both match :func:`...global_layers.brief.hamming_matrix`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TILE = 128
WORDS = 8  # 256-bit descriptors


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _popcount32(x: jax.Array) -> jax.Array:
    """SWAR popcount on uint32 lanes (VPU int ops only)."""
    c = x - ((x >> 1) & jnp.uint32(0x55555555))
    c = (c & jnp.uint32(0x33333333)) + ((c >> 2) & jnp.uint32(0x33333333))
    c = (c + (c >> 4)) & jnp.uint32(0x0F0F0F0F)
    c = c + (c >> 8)
    c = (c + (c >> 16)) & jnp.uint32(0x3F)
    return c


def _hamming_kernel(a_ref, b_ref, out_ref):
    # a_ref: [TILE, WORDS] u32, b_ref: [TILE, WORDS] u32 → out [TILE, TILE] i32
    a = a_ref[:]                                   # [TN, W]
    b = b_ref[:]                                   # [TM, W]
    acc = jnp.zeros((TILE, TILE), jnp.int32)
    for w in range(WORDS):                         # static unroll: W=8
        x = a[:, w][:, None] ^ b[:, w][None, :]    # [TN, TM] u32
        acc = acc + _popcount32(x).astype(jnp.int32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=())
def hamming_matrix_pallas(da: jax.Array, db: jax.Array) -> jax.Array:
    """[Ka, 8] × [Kb, 8] uint32 → [Ka, Kb] int32 Hamming distances."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ka, kb = da.shape[0], db.shape[0]
    pa = (-ka) % TILE
    pb = (-kb) % TILE
    dap = jnp.pad(da.astype(jnp.uint32), ((0, pa), (0, 0)))
    dbp = jnp.pad(db.astype(jnp.uint32), ((0, pb), (0, 0)))
    na, nb = dap.shape[0], dbp.shape[0]

    out = pl.pallas_call(
        _hamming_kernel,
        grid=(na // TILE, nb // TILE),
        in_specs=[
            pl.BlockSpec((TILE, WORDS), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, WORDS), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((na, nb), jnp.int32),
        interpret=_interpret(),
    )(dap, dbp)
    return out[:ka, :kb]


@functools.partial(jax.jit, static_argnames=())
def hamming_matrix_mxu(da: jax.Array, db: jax.Array) -> jax.Array:
    """MXU variant: unpack words to 256 bf16 bit-planes; d = |a|+|b|−2·ABᵀ.

    Exact: bf16 represents all integers ≤ 256, and the MXU accumulates in
    f32 (``preferred_element_type``)."""
    def unpack(d):
        shifts = jnp.arange(32, dtype=jnp.uint32)
        bits = (d[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
        return bits.reshape(d.shape[0], WORDS * 32)

    a = unpack(da.astype(jnp.uint32))
    b = unpack(db.astype(jnp.uint32))
    na = jnp.sum(a, axis=1).astype(jnp.int32)
    nb = jnp.sum(b, axis=1).astype(jnp.int32)
    ab = jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16).T,
                 preferred_element_type=jnp.float32).astype(jnp.int32)
    return na[:, None] + nb[None, :] - 2 * ab
