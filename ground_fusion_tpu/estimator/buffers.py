"""Padded raw-sample buffers for one window + batched preintegration.

The reference stores an ``IntegrationBase`` object per window slot and mutates
it sample-by-sample (``estimator.cpp:743-842`` processIMU/processWheel). Here
the raw samples live in fixed-capacity ``[F, K]`` arrays (slot k = interval
(k-1, k]); every solve re-preintegrates all intervals in one vmapped scan at
the current linearization biases — repropagation (``integration_base.h:47-61``)
is free because preintegration is pure.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..preintegration.imu import ImuPreint, preintegrate
from ..preintegration.parallel import (
    preintegrate_parallel,
    preintegrate_wheel_parallel,
)
from ..preintegration.wheel import WheelPreint, preintegrate_wheel


class ImuWindowBuffer(NamedTuple):
    dts: jax.Array    # [F, K]
    acc: jax.Array    # [F, K, 3]
    gyr: jax.Array    # [F, K, 3]
    valid: jax.Array  # [F, K] bool
    acc0: jax.Array   # [F, 3] sample at interval start
    gyr0: jax.Array   # [F, 3]


class WheelWindowBuffer(NamedTuple):
    dts: jax.Array    # [F, K]
    vel: jax.Array    # [F, K, 3]
    gyr: jax.Array    # [F, K, 3]
    valid: jax.Array  # [F, K] bool
    vel0: jax.Array   # [F, 3]
    gyr0: jax.Array   # [F, 3]
    # per-interval anomaly flag, set ONCE at the interval's first solve from
    # the wheel-vs-IMU dead-reckoning test (estimator.cpp:629-636) and slid
    # with the window: a slip-contaminated interval stays excluded for its
    # whole window lifetime (divergence from the reference, which re-admits
    # contaminated intervals once its newest-interval flag clears)
    bad: jax.Array    # [F] bool


def empty_imu_buffer(num_frames: int, cap: int, dtype=jnp.float32) -> ImuWindowBuffer:
    f, k = num_frames, cap
    return ImuWindowBuffer(
        dts=jnp.zeros((f, k), dtype), acc=jnp.zeros((f, k, 3), dtype),
        gyr=jnp.zeros((f, k, 3), dtype), valid=jnp.zeros((f, k), bool),
        acc0=jnp.zeros((f, 3), dtype), gyr0=jnp.zeros((f, 3), dtype),
    )


def empty_wheel_buffer(num_frames: int, cap: int, dtype=jnp.float32) -> WheelWindowBuffer:
    f, k = num_frames, cap
    return WheelWindowBuffer(
        bad=jnp.zeros((f,), bool),
        dts=jnp.zeros((f, k), dtype), vel=jnp.zeros((f, k, 3), dtype),
        gyr=jnp.zeros((f, k, 3), dtype), valid=jnp.zeros((f, k), bool),
        vel0=jnp.zeros((f, 3), dtype), gyr0=jnp.zeros((f, 3), dtype),
    )


def preintegrate_imu_window(buf: ImuWindowBuffer, sbs: jax.Array, noise18,
                            parallel: bool = True) -> ImuPreint:
    """Preintegrate every interval; slot k linearizes at the biases of frame
    k-1 (the interval's start), like ``IntegrationBase(acc_0, gyr_0, Bas[k-1],
    Bgs[k-1])``. Returns an ImuPreint pytree with leading axis F.

    ``parallel=True`` uses the log-depth associative-scan formulation
    (:mod:`..preintegration.parallel`, equal to the sequential scan to float
    rounding — see tests/test_parallel_preint.py)."""
    sb_prev = jnp.roll(sbs, 1, axis=0)
    ba, bg = sb_prev[:, 3:6], sb_prev[:, 6:9]
    fn = preintegrate_parallel if parallel else preintegrate
    return jax.vmap(
        lambda d, a, g, v, a0, g0, ba_, bg_: fn(d, a, g, v, a0, g0, ba_, bg_, noise18)
    )(buf.dts, buf.acc, buf.gyr, buf.valid, buf.acc0, buf.gyr0, ba, bg)


def preintegrate_wheel_window(buf: WheelWindowBuffer, s_wheel: jax.Array,
                              td_wheel: jax.Array, noise12,
                              parallel: bool = True) -> WheelPreint:
    sx, sy, sw = s_wheel[0], s_wheel[1], s_wheel[2]
    fn = preintegrate_wheel_parallel if parallel else preintegrate_wheel
    return jax.vmap(
        lambda d, v, g, ok, v0, g0: fn(
            d, v, g, ok, v0, g0, sx, sy, sw, td_wheel, noise12
        )
    )(buf.dts, buf.vel, buf.gyr, buf.valid, buf.vel0, buf.gyr0)


def slide_old_imu_buffer(buf: ImuWindowBuffer) -> ImuWindowBuffer:
    """MARGIN_OLD: intervals shift down one slot; the newest slot is cleared
    for the incoming frame."""
    return ImuWindowBuffer(
        dts=jnp.roll(buf.dts, -1, axis=0).at[-1].set(0.0),
        acc=jnp.roll(buf.acc, -1, axis=0),
        gyr=jnp.roll(buf.gyr, -1, axis=0),
        valid=jnp.roll(buf.valid, -1, axis=0).at[-1].set(False),
        acc0=jnp.roll(buf.acc0, -1, axis=0),
        gyr0=jnp.roll(buf.gyr0, -1, axis=0),
    )


def slide_old_wheel_buffer(buf: WheelWindowBuffer) -> WheelWindowBuffer:
    return WheelWindowBuffer(
        dts=jnp.roll(buf.dts, -1, axis=0).at[-1].set(0.0),
        vel=jnp.roll(buf.vel, -1, axis=0),
        gyr=jnp.roll(buf.gyr, -1, axis=0),
        valid=jnp.roll(buf.valid, -1, axis=0).at[-1].set(False),
        vel0=jnp.roll(buf.vel0, -1, axis=0),
        gyr0=jnp.roll(buf.gyr0, -1, axis=0),
        bad=jnp.roll(buf.bad, -1, axis=0).at[-1].set(False),
    )


def _merge_padded(dts_a, xa, ga, va, dts_b, xb, gb, vb):
    """Concatenate interval b after interval a within the same capacity K by
    compacting valid samples to the front (``Estimator::slideWindow`` new-frame
    merge, ``estimator.cpp:3712-3724`` push_back of the merged samples).

    If the combined interval overflows K samples, adjacent sample pairs are
    fused (dt summed, endpoint measurement kept) — a controlled decimation
    instead of the silent sample drop a fixed buffer would otherwise cause;
    repeated non-keyframe merges keep halving the rate, never losing time."""
    k = dts_a.shape[0]
    dts = jnp.concatenate([dts_a, dts_b])
    x = jnp.concatenate([xa, xb])
    g = jnp.concatenate([ga, gb])
    v = jnp.concatenate([va, vb])
    order = jnp.argsort(~v, stable=True)   # valid first, stable
    dts, x, g, v = dts[order], x[order], g[order], v[order]
    n_valid = jnp.sum(v)

    # plain path: first K samples (correct when they fit)
    plain = (dts[:k], x[:k], g[:k], v[:k])

    # decimated path: fuse pairs (2i, 2i+1) → K slots
    v1, v2 = v[0::2], v[1::2]
    dd = dts[0::2] * v1 + dts[1::2] * v2
    xd = jnp.where(v2[:, None], x[1::2], x[0::2])
    gd = jnp.where(v2[:, None], g[1::2], g[0::2])
    vd = v1 | v2
    overflow = n_valid > k
    return (
        jnp.where(overflow, dd, plain[0]),
        jnp.where(overflow, xd, plain[1]),
        jnp.where(overflow, gd, plain[2]),
        jnp.where(overflow, vd, plain[3]),
    )


def slide_new_imu_buffer(buf: ImuWindowBuffer) -> ImuWindowBuffer:
    """MARGIN_SECOND_NEW: merge interval F-1 into F-2's successor — the new
    last interval covers (F-3, F-1]. Samples compact front-of-buffer; overflow
    beyond capacity K drops the newest samples (K is sized for 2 frame gaps).
    """
    f = buf.dts.shape[0]
    d, a, g, v = _merge_padded(
        buf.dts[f - 2], buf.acc[f - 2], buf.gyr[f - 2], buf.valid[f - 2],
        buf.dts[f - 1], buf.acc[f - 1], buf.gyr[f - 1], buf.valid[f - 1],
    )
    return ImuWindowBuffer(
        dts=buf.dts.at[f - 2].set(d).at[f - 1].set(0.0),
        acc=buf.acc.at[f - 2].set(a),
        gyr=buf.gyr.at[f - 2].set(g),
        valid=buf.valid.at[f - 2].set(v).at[f - 1].set(False),
        acc0=buf.acc0,
        gyr0=buf.gyr0,
    )


def slide_new_wheel_buffer(buf: WheelWindowBuffer) -> WheelWindowBuffer:
    f = buf.dts.shape[0]
    d, a, g, v = _merge_padded(
        buf.dts[f - 2], buf.vel[f - 2], buf.gyr[f - 2], buf.valid[f - 2],
        buf.dts[f - 1], buf.vel[f - 1], buf.gyr[f - 1], buf.valid[f - 1],
    )
    return WheelWindowBuffer(
        dts=buf.dts.at[f - 2].set(d).at[f - 1].set(0.0),
        vel=buf.vel.at[f - 2].set(a),
        gyr=buf.gyr.at[f - 2].set(g),
        valid=buf.valid.at[f - 2].set(v).at[f - 1].set(False),
        vel0=buf.vel0,
        gyr0=buf.gyr0,
        # a merged interval is bad if either constituent was
        bad=buf.bad.at[f - 2].set(buf.bad[f - 2] | buf.bad[f - 1])
                   .at[f - 1].set(False),
    )
