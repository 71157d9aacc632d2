"""Log-depth preintegration via ``lax.associative_scan`` (parallel prefix).

The reference (and :mod:`.imu` / :mod:`.wheel`) integrate sample-by-sample —
a K-step sequential dependence chain (``integration_base.h:139-167``
propagate). On TPU that serializes K tiny matrix ops per interval. This module
computes the identical midpoint preintegration in O(log K) depth by splitting
the recursion into associative pieces:

1. **Attitude chain**: each sample's increment ``dq_k = [1, ½·ω̄_k·dt]``
   depends only on measurements, and per-step normalization commutes with the
   product (norms multiply), so all prefix attitudes are one
   ``associative_scan`` of quaternion products.
2. **Velocity/position**: given prefix rotations, the midpoint accelerations
   are data-parallel; Δv is a cumsum and Δp a cumsum of the shifted-velocity
   series.
3. **Jacobian/covariance**: the pair recursion ``(J, P) ← (F·J,
   F·P·Fᵀ + V·Q·Vᵀ)`` is composition of affine maps — associative with
   combine ``(A₂A₁, A₂B₁A₂ᵀ + B₂)``.

Padded (invalid) samples contribute identity increments, so arbitrary masks
are handled; "previous sample" uses a last-valid gather (cummax), matching the
sequential carry semantics exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.so3 import quat_mul, quat_normalize, quat_to_mat, right_jacobian_so3, skew
from .imu import ImuPreint
from .wheel import WheelPreint


def _last_valid_prev(x0: jax.Array, xs: jax.Array, valid: jax.Array) -> jax.Array:
    """prev[k] = value of the last valid sample before k (x0 if none).

    Mirrors the sequential carry that only advances ``acc_0/gyr_0`` on valid
    samples."""
    k = valid.shape[0]
    idx = jnp.where(valid, jnp.arange(k), -1)
    prev_idx = jnp.concatenate([jnp.full((1,), -1, idx.dtype),
                                jax.lax.cummax(idx)[:-1]])
    gathered = xs[jnp.clip(prev_idx, 0, k - 1)]
    return jnp.where((prev_idx >= 0)[:, None], gathered, x0[None, :])


def _prefix_quats(dqs: jax.Array) -> jax.Array:
    """All prefix products q_k = dq_1 ⊗ … ⊗ dq_k, normalized."""
    pref = jax.lax.associative_scan(quat_mul, dqs, axis=0)
    return quat_normalize(pref)


def _affine_pair_scan(F: jax.Array, G: jax.Array):
    """Composite (ΠF, accumulated covariance) of the recursion
    P ← F P Fᵀ + G over the leading axis; returns the FINAL pair."""

    def combine(left, right):
        A1, B1 = left
        A2, B2 = right
        A = A2 @ A1
        B = A2 @ B1 @ jnp.swapaxes(A2, -1, -2) + B2
        return A, B

    A, B = jax.lax.associative_scan(combine, (F, G), axis=0)
    return A[-1], B[-1]


def preintegrate_parallel(dts, accs, gyrs, valid, acc_0, gyr_0, ba, bg,
                          noise18) -> ImuPreint:
    """Drop-in parallel equivalent of :func:`.imu.preintegrate`."""
    dtype = accs.dtype
    k = dts.shape[0]
    vm = valid.astype(dtype)
    dt = dts * vm
    I3 = jnp.eye(3, dtype=dtype)

    acc_prev = _last_valid_prev(acc_0, accs, valid)
    gyr_prev = _last_valid_prev(gyr_0, gyrs, valid)

    # 1. attitude chain
    un_gyr = (0.5 * (gyr_prev + gyrs) - bg[None, :]) * vm[:, None]
    dqs = jnp.concatenate([jnp.ones((k, 1), dtype), 0.5 * un_gyr * dt[:, None]], -1)
    q_k = _prefix_quats(dqs)                             # [K,4] after sample k
    q_prev = jnp.concatenate(
        [jnp.array([[1.0, 0, 0, 0]], dtype), q_k[:-1]], axis=0)
    R0 = jax.vmap(quat_to_mat)(q_prev)                   # [K,3,3]
    R1 = jax.vmap(quat_to_mat)(q_k)

    # 2. velocity / position cumsums
    a0 = acc_prev - ba[None, :]                          # [K,3]
    a1 = accs - ba[None, :]
    un_acc = 0.5 * (jnp.einsum("kij,kj->ki", R0, a0)
                    + jnp.einsum("kij,kj->ki", R1, a1)) * vm[:, None]
    dv = un_acc * dt[:, None]
    v_pref = jnp.cumsum(dv, axis=0)
    v_prev = jnp.concatenate([jnp.zeros((1, 3), dtype), v_pref[:-1]], axis=0)
    dp = v_prev * dt[:, None] + 0.5 * un_acc * dt[:, None] ** 2
    delta_p = jnp.sum(dp, axis=0)
    delta_v = v_pref[-1]
    sum_dt = jnp.sum(dt)

    # 3. batched F, V·Q·Vᵀ and the affine pair scan
    w_x = jax.vmap(skew)(un_gyr)
    a0_x = jax.vmap(skew)(a0)
    a1_x = jax.vmap(skew)(a1)
    R1a1 = R1 @ a1_x
    ImWdt = I3[None] - w_x * dt[:, None, None]
    dt_ = dt[:, None, None]

    F = jnp.zeros((k, 15, 15), dtype)
    F = F.at[:, 0:3, 0:3].set(I3[None])
    F = F.at[:, 0:3, 3:6].set(
        -0.25 * (R0 @ a0_x) * dt_ * dt_ - 0.25 * (R1a1 @ ImWdt) * dt_ * dt_)
    F = F.at[:, 0:3, 6:9].set(I3[None] * dt_)
    F = F.at[:, 0:3, 9:12].set(-0.25 * (R0 + R1) * dt_ * dt_)
    F = F.at[:, 0:3, 12:15].set(0.25 * R1a1 * dt_ * dt_ * dt_)
    F = F.at[:, 3:6, 3:6].set(ImWdt)
    F = F.at[:, 3:6, 12:15].set(-I3[None] * dt_)
    F = F.at[:, 6:9, 3:6].set(-0.5 * (R0 @ a0_x) * dt_ - 0.5 * (R1a1 @ ImWdt) * dt_)
    F = F.at[:, 6:9, 6:9].set(I3[None])
    F = F.at[:, 6:9, 9:12].set(-0.5 * (R0 + R1) * dt_)
    F = F.at[:, 6:9, 12:15].set(0.5 * R1a1 * dt_ * dt_)
    F = F.at[:, 9:12, 9:12].set(I3[None])
    F = F.at[:, 12:15, 12:15].set(I3[None])
    # invalid samples are identity steps
    F = jnp.where(valid[:, None, None], F, jnp.eye(15, dtype=dtype)[None])

    V = jnp.zeros((k, 15, 18), dtype)
    V = V.at[:, 0:3, 0:3].set(0.25 * R0 * dt_ * dt_)
    v03 = -0.125 * R1a1 * dt_ * dt_ * dt_
    V = V.at[:, 0:3, 3:6].set(v03)
    V = V.at[:, 0:3, 6:9].set(0.25 * R1 * dt_ * dt_)
    V = V.at[:, 0:3, 9:12].set(v03)
    V = V.at[:, 3:6, 3:6].set(0.5 * I3[None] * dt_)
    V = V.at[:, 3:6, 9:12].set(0.5 * I3[None] * dt_)
    V = V.at[:, 6:9, 0:3].set(0.5 * R0 * dt_)
    v63 = -0.25 * R1a1 * dt_ * dt_
    V = V.at[:, 6:9, 3:6].set(v63)
    V = V.at[:, 6:9, 6:9].set(0.5 * R1 * dt_)
    V = V.at[:, 6:9, 9:12].set(v63)
    V = V.at[:, 9:12, 12:15].set(I3[None] * dt_)
    V = V.at[:, 12:15, 15:18].set(I3[None] * dt_)
    G = V @ noise18[None] @ jnp.swapaxes(V, -1, -2)
    G = jnp.where(valid[:, None, None], G, 0.0)

    J, P = _affine_pair_scan(F, G)
    return ImuPreint(delta_p, q_k[-1], delta_v, J, P, sum_dt, ba, bg)


# ---------------------------------------------------------------------------
# Wheel
# ---------------------------------------------------------------------------


def _wheel_deltas_parallel(sx, sy, sw, dts, vels, gyrs, valid, vel_0, gyr_0):
    """(Δp, Δq, prefix rotations, midpoint terms) of the wheel chain —
    differentiable in (sx, sy, sw) for the exact intrinsic Jacobian."""
    dtype = vels.dtype
    k = dts.shape[0]
    vm = valid.astype(dtype)
    dt = dts * vm

    vel_prev = _last_valid_prev(vel_0, vels, valid)
    gyr_prev = _last_valid_prev(gyr_0, gyrs, valid)

    sv_diag = jnp.stack([sx, sy, jnp.ones((), dtype)])
    un_gyr = 0.5 * sw * (gyr_prev + gyrs) * vm[:, None]
    dqs = jnp.concatenate([jnp.ones((k, 1), dtype), 0.5 * un_gyr * dt[:, None]], -1)
    q_k = _prefix_quats(dqs)
    q_prev = jnp.concatenate([jnp.array([[1.0, 0, 0, 0]], dtype), q_k[:-1]], 0)
    R0 = jax.vmap(quat_to_mat)(q_prev)
    R1 = jax.vmap(quat_to_mat)(q_k)

    sv0 = sv_diag[None, :] * vel_prev
    sv1 = sv_diag[None, :] * vels
    un_vel = 0.5 * (jnp.einsum("kij,kj->ki", R0, sv0)
                    + jnp.einsum("kij,kj->ki", R1, sv1)) * vm[:, None]
    delta_p = jnp.sum(un_vel * dt[:, None], axis=0)
    return delta_p, q_k, q_prev, R0, R1, sv0, sv1, un_gyr, dqs, dt


def preintegrate_wheel_parallel(dts, vels, gyrs, valid, vel_0, gyr_0,
                                sx, sy, sw, td, noise12) -> WheelPreint:
    """Drop-in parallel equivalent of :func:`.wheel.preintegrate_wheel`."""
    dtype = vels.dtype
    I3 = jnp.eye(3, dtype=dtype)

    delta_p, q_k, q_prev, R0, R1, sv0, sv1, un_gyr, dqs, dt = \
        _wheel_deltas_parallel(sx, sy, sw, dts, vels, gyrs, valid, vel_0, gyr_0)
    delta_q = q_k[-1]
    sum_dt = jnp.sum(dt)

    # covariance: affine pair scan over 6x6 blocks
    dt_ = dt[:, None, None]
    Rdd = jax.vmap(lambda d: quat_to_mat(quat_normalize(d)))(dqs)
    v0x = jax.vmap(skew)(sv0)
    v1x = jax.vmap(skew)(sv1)
    F = jnp.zeros((dts.shape[0], 6, 6), dtype)
    F = F.at[:, 0:3, 0:3].set(I3[None])
    F = F.at[:, 0:3, 3:6].set(
        -0.5 * dt_ * (R0 @ v0x + R1 @ v1x @ jnp.swapaxes(Rdd, -1, -2)))
    F = F.at[:, 3:6, 3:6].set(jnp.swapaxes(Rdd, -1, -2))
    Jr = jax.vmap(right_jacobian_so3)(un_gyr * dt[:, None])

    sv_m = jnp.diag(jnp.stack([sx, sy, jnp.ones((), dtype)]))
    V = jnp.zeros((dts.shape[0], 6, 12), dtype)
    V = V.at[:, 0:3, 0:3].set(0.5 * dt_ * (R0 @ sv_m[None]))
    v03 = -0.25 * dt_ * dt_ * (R1 @ v1x @ Jr)
    V = V.at[:, 0:3, 3:6].set(v03)
    V = V.at[:, 0:3, 6:9].set(0.5 * dt_ * (R1 @ sv_m[None]))
    V = V.at[:, 0:3, 9:12].set(v03)
    V = V.at[:, 3:6, 3:6].set(0.5 * Jr * sw * dt_)
    V = V.at[:, 3:6, 9:12].set(0.5 * Jr * sw * dt_)
    F = jnp.where(valid[:, None, None], F, jnp.eye(6, dtype=dtype)[None])
    G = V @ noise12[None] @ jnp.swapaxes(V, -1, -2)
    G = jnp.where(valid[:, None, None], G, 0.0)
    _, P = _affine_pair_scan(F, G)

    # exact intrinsic Jacobian: forward-mode AD through the parallel deltas
    def deltas(s3):
        p, qk, *_ = _wheel_deltas_parallel(
            s3[0], s3[1], s3[2], dts, vels, gyrs, valid, vel_0, gyr_0)
        return p, qk[-1]

    from ..geometry.so3 import quat_conj

    s3 = jnp.stack([sx, sy, sw])
    dp_ds, dq_ds = jax.jacfwd(deltas)(s3)
    dtheta_ds = 2.0 * jax.vmap(
        lambda dq: quat_mul(quat_conj(delta_q), dq)[1:4], in_axes=1, out_axes=1
    )(dq_ds)
    Jix = jnp.concatenate([dp_ds, dtheta_ds], axis=0)

    n_valid = jnp.sum(valid.astype(jnp.int32))
    last = jnp.maximum(n_valid - 1, 0)
    vel_1 = jnp.where(n_valid > 0, vels[last], vel_0)
    gyr_1 = jnp.where(n_valid > 0, gyrs[last], gyr_0)
    return WheelPreint(delta_p, delta_q, Jix, P, sum_dt, sx, sy, sw, td,
                       vel_0, gyr_0, vel_1, gyr_1)
