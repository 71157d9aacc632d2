"""IMU preintegration as a ``lax.scan`` over padded sample batches.

TPU-native re-design of the reference's per-sample C++ accumulator
(``vins_estimator/src/factor/integration_base.h:63-137`` midPointIntegration,
``:139-167`` propagate): the same midpoint scheme, first-order bias Jacobian
(15x15 state-transition product) and covariance propagation with the 18-dim
noise model, but expressed as one scan over a fixed-capacity ``[K, 7]`` sample
buffer with a validity mask so every frame interval compiles to the same
program. Re-propagation after a bias update (``integration_base.h:47-61``) is
just calling :func:`preintegrate` again on the stored buffer — it is pure.

State ordering matches the reference residual: [P(0:3), R(3:6), V(6:9),
Ba(9:12), Bg(12:15)].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.so3 import quat_mul, quat_normalize, quat_to_mat, skew


class ImuPreint(NamedTuple):
    """Preintegrated IMU measurement between two frames."""

    delta_p: jax.Array      # [3]
    delta_q: jax.Array      # [4] wxyz
    delta_v: jax.Array      # [3]
    jacobian: jax.Array     # [15,15] d(delta)/d(state_0) — bias columns are used
    covariance: jax.Array   # [15,15]
    sum_dt: jax.Array       # []
    linearized_ba: jax.Array  # [3]
    linearized_bg: jax.Array  # [3]


def identity_preint(dtype=jnp.float32) -> ImuPreint:
    return ImuPreint(
        delta_p=jnp.zeros(3, dtype),
        delta_q=jnp.array([1.0, 0, 0, 0], dtype),
        delta_v=jnp.zeros(3, dtype),
        jacobian=jnp.eye(15, dtype=dtype),
        covariance=jnp.zeros((15, 15), dtype),
        sum_dt=jnp.zeros((), dtype),
        linearized_ba=jnp.zeros(3, dtype),
        linearized_bg=jnp.zeros(3, dtype),
    )


def noise_cov(acc_n, gyr_n, acc_w, gyr_w, dtype=jnp.float32) -> jax.Array:
    """18x18 diagonal measurement-noise covariance (integration_base.h:30-37)."""
    d = jnp.concatenate(
        [
            jnp.full(3, acc_n**2),
            jnp.full(3, gyr_n**2),
            jnp.full(3, acc_n**2),
            jnp.full(3, gyr_n**2),
            jnp.full(3, acc_w**2),
            jnp.full(3, gyr_w**2),
        ]
    ).astype(dtype)
    return jnp.diag(d)


def _midpoint_step(carry, sample, noise18):
    """One midpoint update. carry = (p, q, v, J, P, sum_dt, acc_0, gyr_0, ba, bg);
    sample = (dt, acc_1, gyr_1, valid)."""
    p, q, v, J, P, sum_dt, acc_0, gyr_0, ba, bg = carry
    dt, acc_1, gyr_1, valid = sample
    dtype = p.dtype

    un_acc_0 = quat_to_mat(q) @ (acc_0 - ba)
    un_gyr = 0.5 * (gyr_0 + gyr_1) - bg
    half = un_gyr * dt * 0.5
    dq = jnp.concatenate([jnp.ones((1,), dtype), half])  # unnormalized deltaQ, as in reference
    q_new = quat_normalize(quat_mul(q, dq))
    R0 = quat_to_mat(q)
    R1 = quat_to_mat(q_new)
    un_acc_1 = R1 @ (acc_1 - ba)
    un_acc = 0.5 * (un_acc_0 + un_acc_1)
    p_new = p + v * dt + 0.5 * un_acc * dt * dt
    v_new = v + un_acc * dt

    # --- first-order state transition F (15x15) and noise map V (15x18) ---
    w_x = skew(un_gyr)
    a0_x = skew(acc_0 - ba)
    a1_x = skew(acc_1 - ba)
    I3 = jnp.eye(3, dtype=dtype)
    R1a1 = R1 @ a1_x
    ImWdt = I3 - w_x * dt

    F = jnp.zeros((15, 15), dtype)
    F = F.at[0:3, 0:3].set(I3)
    F = F.at[0:3, 3:6].set(-0.25 * (R0 @ a0_x) * dt * dt - 0.25 * R1a1 @ ImWdt * dt * dt)
    F = F.at[0:3, 6:9].set(I3 * dt)
    F = F.at[0:3, 9:12].set(-0.25 * (R0 + R1) * dt * dt)
    F = F.at[0:3, 12:15].set(0.25 * R1a1 * dt * dt * dt)
    F = F.at[3:6, 3:6].set(ImWdt)
    F = F.at[3:6, 12:15].set(-I3 * dt)
    F = F.at[6:9, 3:6].set(-0.5 * (R0 @ a0_x) * dt - 0.5 * R1a1 @ ImWdt * dt)
    F = F.at[6:9, 6:9].set(I3)
    F = F.at[6:9, 9:12].set(-0.5 * (R0 + R1) * dt)
    F = F.at[6:9, 12:15].set(0.5 * R1a1 * dt * dt)
    F = F.at[9:12, 9:12].set(I3)
    F = F.at[12:15, 12:15].set(I3)

    V = jnp.zeros((15, 18), dtype)
    V = V.at[0:3, 0:3].set(0.25 * R0 * dt * dt)
    v03 = -0.125 * R1a1 * dt * dt * dt
    V = V.at[0:3, 3:6].set(v03)
    V = V.at[0:3, 6:9].set(0.25 * R1 * dt * dt)
    V = V.at[0:3, 9:12].set(v03)
    V = V.at[3:6, 3:6].set(0.5 * I3 * dt)
    V = V.at[3:6, 9:12].set(0.5 * I3 * dt)
    V = V.at[6:9, 0:3].set(0.5 * R0 * dt)
    v63 = -0.25 * R1a1 * dt * dt
    V = V.at[6:9, 3:6].set(v63)
    V = V.at[6:9, 6:9].set(0.5 * R1 * dt)
    V = V.at[6:9, 9:12].set(v63)
    V = V.at[9:12, 12:15].set(I3 * dt)
    V = V.at[12:15, 15:18].set(I3 * dt)

    J_new = F @ J
    P_new = F @ P @ F.T + V @ noise18 @ V.T

    # masked update: padded samples are identity steps
    def sel(new, old):
        return jnp.where(valid, new, old)

    carry_new = (
        sel(p_new, p), sel(q_new, q), sel(v_new, v), sel(J_new, J), sel(P_new, P),
        sel(sum_dt + dt, sum_dt), sel(acc_1, acc_0), sel(gyr_1, gyr_0), ba, bg,
    )
    return carry_new, None


def preintegrate(
    dts: jax.Array,       # [K]
    accs: jax.Array,      # [K, 3] samples acc_1..acc_K (acc_0 passed separately)
    gyrs: jax.Array,      # [K, 3]
    valid: jax.Array,     # [K] bool
    acc_0: jax.Array,     # [3] sample at interval start
    gyr_0: jax.Array,     # [3]
    ba: jax.Array,        # [3] linearization-point accel bias
    bg: jax.Array,        # [3]
    noise18: jax.Array,   # [18,18]
) -> ImuPreint:
    """Preintegrate a padded interval. Equivalent of constructing
    ``IntegrationBase(acc_0, gyr_0, ba, bg)`` and ``push_back``-ing each sample
    (integration_base.h:22-45), but shape-static and jit-compiled once."""
    dtype = accs.dtype
    carry0 = (
        jnp.zeros(3, dtype), jnp.array([1.0, 0, 0, 0], dtype), jnp.zeros(3, dtype),
        jnp.eye(15, dtype=dtype), jnp.zeros((15, 15), dtype), jnp.zeros((), dtype),
        acc_0, gyr_0, ba, bg,
    )
    carry, _ = jax.lax.scan(
        lambda c, s: _midpoint_step(c, s, noise18), carry0, (dts, accs, gyrs, valid)
    )
    p, q, v, J, P, sum_dt, _, _, ba, bg = carry
    return ImuPreint(p, q, v, J, P, sum_dt, ba, bg)


def bias_corrected_delta(pre: ImuPreint, bai: jax.Array, bgi: jax.Array):
    """First-order bias correction of (delta_p, delta_q, delta_v)
    (integration_base.h:169-188)."""
    dba = bai - pre.linearized_ba
    dbg = bgi - pre.linearized_bg
    dp = pre.delta_p + pre.jacobian[0:3, 9:12] @ dba + pre.jacobian[0:3, 12:15] @ dbg
    dv = pre.delta_v + pre.jacobian[6:9, 9:12] @ dba + pre.jacobian[6:9, 12:15] @ dbg
    dq_theta = pre.jacobian[3:6, 12:15] @ dbg
    half = 0.5 * dq_theta
    dq_inc = quat_normalize(jnp.concatenate([jnp.ones((1,), half.dtype), half]))
    dq = quat_normalize(quat_mul(pre.delta_q, dq_inc))
    return dp, dq, dv


def fast_predict(p, q, v, ba, bg, g, dt, acc_0, gyr_0, acc_1, gyr_1):
    """IMU-rate dead reckoning (Estimator::fastPredictIMU,
    estimator.cpp:4014-4030) — the ~200 Hz odometry path."""
    un_acc_0 = quat_rotate_apply(q, acc_0 - ba) - g
    un_gyr = 0.5 * (gyr_0 + gyr_1) - bg
    half = un_gyr * dt * 0.5
    q_new = quat_normalize(quat_mul(q, jnp.concatenate([jnp.ones((1,), p.dtype), half])))
    un_acc_1 = quat_rotate_apply(q_new, acc_1 - ba) - g
    un_acc = 0.5 * (un_acc_0 + un_acc_1)
    p_new = p + dt * v + 0.5 * dt * dt * un_acc
    v_new = v + dt * un_acc
    return p_new, q_new, v_new


def quat_rotate_apply(q, v):
    from ..geometry.so3 import quat_rotate

    return quat_rotate(q, v)
