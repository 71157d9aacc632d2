"""Wheel-odometer preintegration (Δp, Δq from body-frame velocity + gyro).

TPU-native equivalent of ``vins_estimator/src/factor/wheel_integration_base.h``
(:67-146 midPointIntegration, :180-219 time-offset-corrected evaluate):
midpoint integration of planar wheel velocity scaled by the online intrinsics
(sx, sy, sw), a 6x3 Jacobian of the preintegrated delta w.r.t. those
intrinsics, and a 6x6 covariance with the 12-dim velocity/gyro noise model —
all as one masked ``lax.scan`` over a fixed-capacity sample buffer.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.so3 import (
    quat_conj,
    quat_exp,
    quat_log,
    quat_mul,
    quat_normalize,
    quat_to_mat,
    right_jacobian_so3,
    skew,
)


class WheelPreint(NamedTuple):
    delta_p: jax.Array         # [3]
    delta_q: jax.Array         # [4]
    jacobian_ix: jax.Array     # [6,3] d(delta)/d(sx, sy, sw)
    covariance: jax.Array      # [6,6]
    sum_dt: jax.Array          # []
    linearized_sx: jax.Array   # []
    linearized_sy: jax.Array   # []
    linearized_sw: jax.Array   # []
    linearized_td: jax.Array   # []
    linearized_vel: jax.Array  # [3] first velocity sample of the interval
    linearized_gyr: jax.Array  # [3]
    vel_1: jax.Array           # [3] last velocity sample
    gyr_1: jax.Array           # [3]


def identity_wheel_preint(dtype=jnp.float32) -> WheelPreint:
    z3 = jnp.zeros(3, dtype)
    return WheelPreint(
        delta_p=z3,
        delta_q=jnp.array([1.0, 0, 0, 0], dtype),
        jacobian_ix=jnp.zeros((6, 3), dtype),
        covariance=jnp.zeros((6, 6), dtype),
        sum_dt=jnp.zeros((), dtype),
        linearized_sx=jnp.ones((), dtype),
        linearized_sy=jnp.ones((), dtype),
        linearized_sw=jnp.ones((), dtype),
        linearized_td=jnp.zeros((), dtype),
        linearized_vel=z3,
        linearized_gyr=z3,
        vel_1=z3,
        gyr_1=z3,
    )


def wheel_noise_cov(vel_n, gyr_n, dtype=jnp.float32) -> jax.Array:
    """12x12 diagonal noise (wheel_integration_base.h:32-36)."""
    d = jnp.concatenate(
        [jnp.full(3, vel_n**2), jnp.full(3, gyr_n**2), jnp.full(3, vel_n**2), jnp.full(3, gyr_n**2)]
    ).astype(dtype)
    return jnp.diag(d)


def _step(carry, sample, sx, sy, sw, noise12):
    p, q, P, sum_dt, vel_0, gyr_0 = carry
    dt, vel_1, gyr_1, valid = sample
    dtype = p.dtype

    sv = jnp.diag(jnp.stack([sx, sy, jnp.ones((), dtype)]))
    R0 = quat_to_mat(q)
    un_vel_0 = R0 @ (sv @ vel_0)
    un_gyr = 0.5 * sw * (gyr_0 + gyr_1)
    half = un_gyr * dt * 0.5
    ddq = jnp.concatenate([jnp.ones((1,), dtype), half])
    q_new = quat_normalize(quat_mul(q, ddq))
    R1 = quat_to_mat(q_new)
    Rdd = quat_to_mat(quat_normalize(ddq))
    un_vel_1 = R1 @ (sv @ vel_1)
    p_new = p + 0.5 * (un_vel_0 + un_vel_1) * dt

    # --- covariance propagation (wheel_integration_base.h:109-123) ---
    v0x = skew(sv @ vel_0)
    v1x = skew(sv @ vel_1)
    I3 = jnp.eye(3, dtype=dtype)
    F = jnp.zeros((6, 6), dtype)
    F = F.at[0:3, 0:3].set(I3)
    F = F.at[0:3, 3:6].set(-0.5 * dt * (R0 @ v0x + R1 @ v1x @ Rdd.T))
    F = F.at[3:6, 3:6].set(Rdd.T)
    Jr = right_jacobian_so3(un_gyr * dt)

    V = jnp.zeros((6, 12), dtype)
    V = V.at[0:3, 0:3].set(0.5 * dt * R0 @ sv)
    v03 = -0.25 * dt * dt * R1 @ v1x @ Jr
    V = V.at[0:3, 3:6].set(v03)
    V = V.at[0:3, 6:9].set(0.5 * dt * R1 @ sv)
    V = V.at[0:3, 9:12].set(v03)
    V = V.at[3:6, 3:6].set(0.5 * Jr * sw * dt)
    V = V.at[3:6, 9:12].set(0.5 * Jr * sw * dt)
    P_new = F @ P @ F.T + V @ noise12 @ V.T

    def sel(new, old):
        return jnp.where(valid, new, old)

    return (
        sel(p_new, p), sel(q_new, q), sel(P_new, P),
        sel(sum_dt + dt, sum_dt), sel(vel_1, vel_0), sel(gyr_1, gyr_0),
    ), None


def _delta_only(sx, sy, sw, dts, vels, gyrs, valid, vel_0, gyr_0):
    """(Δp, Δq) as a pure function of the intrinsics — differentiated with
    ``jacfwd`` to get the exact 6x3 intrinsic Jacobian. The reference
    accumulates this Jacobian with a small-angle recursion
    (wheel_integration_base.h:127-139) that drops the adjoint transport of the
    previous derivative; forward-mode AD through the scan is exact and costs
    three extra tangents."""
    dtype = vels.dtype

    def step(carry, sample):
        p, q, v0, g0 = carry
        dt, v1, g1, ok = sample
        sv_diag = jnp.stack([sx, sy, jnp.ones((), dtype)])
        un_vel_0 = quat_to_mat(q) @ (sv_diag * v0)
        un_gyr = 0.5 * sw * (g0 + g1)
        half = un_gyr * dt * 0.5
        q_new = quat_normalize(quat_mul(q, jnp.concatenate([jnp.ones((1,), dtype), half])))
        un_vel_1 = quat_to_mat(q_new) @ (sv_diag * v1)
        p_new = p + 0.5 * (un_vel_0 + un_vel_1) * dt

        def sel(new, old):
            return jnp.where(ok, new, old)

        return (sel(p_new, p), sel(q_new, q), sel(v1, v0), sel(g1, g0)), None

    carry0 = (jnp.zeros(3, dtype), jnp.array([1.0, 0, 0, 0], dtype), vel_0, gyr_0)
    (p, q, _, _), _ = jax.lax.scan(step, carry0, (dts, vels, gyrs, valid))
    return p, q


def preintegrate_wheel(
    dts: jax.Array,      # [K]
    vels: jax.Array,     # [K,3]
    gyrs: jax.Array,     # [K,3]
    valid: jax.Array,    # [K] bool
    vel_0: jax.Array,
    gyr_0: jax.Array,
    sx: jax.Array,
    sy: jax.Array,
    sw: jax.Array,
    td: jax.Array,
    noise12: jax.Array,
) -> WheelPreint:
    dtype = vels.dtype
    carry0 = (
        jnp.zeros(3, dtype), jnp.array([1.0, 0, 0, 0], dtype),
        jnp.zeros((6, 6), dtype), jnp.zeros((), dtype), vel_0, gyr_0,
    )
    carry, _ = jax.lax.scan(
        lambda c, s: _step(c, s, sx, sy, sw, noise12), carry0, (dts, vels, gyrs, valid)
    )
    p, q, P, sum_dt, _, _ = carry

    # exact intrinsic Jacobian via forward-mode AD (see _delta_only docstring)
    def deltas(s3):
        return _delta_only(s3[0], s3[1], s3[2], dts, vels, gyrs, valid, vel_0, gyr_0)

    s3 = jnp.stack([sx, sy, sw])
    (dp_ds, dq_ds) = jax.jacfwd(deltas)(s3)  # [3,3], [4,3]
    # quaternion derivative -> right-tangent: δθ_col = 2 (q^-1 ⊗ dq)_vec
    dtheta_ds = 2.0 * jax.vmap(lambda dq: quat_mul(quat_conj(q), dq)[1:4], in_axes=1, out_axes=1)(dq_ds)
    Jix = jnp.concatenate([dp_ds, dtheta_ds], axis=0)
    # last *valid* sample for the td correction in the residual
    n_valid = jnp.sum(valid.astype(jnp.int32))
    last = jnp.maximum(n_valid - 1, 0)
    vel_1 = jnp.where(n_valid > 0, vels[last], vel_0)
    gyr_1 = jnp.where(n_valid > 0, gyrs[last], gyr_0)
    return WheelPreint(p, q, Jix, P, sum_dt, sx, sy, sw, td, vel_0, gyr_0, vel_1, gyr_1)


def wheel_corrected_delta(pre: WheelPreint, sx, sy, sw, td):
    """Intrinsic- and time-offset-corrected (Δp, Δq)
    (wheel_integration_base.h:180-206)."""
    dsx = sx - pre.linearized_sx
    dsy = sy - pre.linearized_sy
    dsw = sw - pre.linearized_sw
    dtd = td - pre.linearized_td
    dtype = pre.delta_p.dtype

    cp = pre.delta_p + pre.jacobian_ix[0:3, 0] * dsx + pre.jacobian_ix[0:3, 1] * dsy + pre.jacobian_ix[0:3, 2] * dsw
    cq = quat_normalize(quat_mul(pre.delta_q, quat_exp(pre.jacobian_ix[3:6, 2] * dsw)))

    sv = jnp.diag(jnp.stack([sx, sy, jnp.ones((), dtype)]))
    q_head = quat_exp(sw * pre.linearized_gyr * dtd)
    q_tail = quat_exp(-sw * pre.gyr_1 * dtd)
    dq_time = quat_normalize(quat_mul(quat_mul(q_head, cq), q_tail))
    from ..geometry.so3 import quat_rotate

    dp_time = quat_rotate(
        q_head, sv @ pre.linearized_vel * dtd + cp - quat_rotate(cq, sv @ (pre.vel_1 * dtd))
    )
    return dp_time, dq_time


def wheel_residual_from_delta(pose_i, pose_j, ex_io, dp_time, dq_time):
    """6-dim wheel relative-motion residual (wheel_integration_base.h:211-212):
    [ (Ri rio)^T (Rj tio + Pj - Ri tio - Pi) - Δp ; Log(Δq^-1 (Qi qio)^-1 Qj qio) ]."""
    from ..geometry.so3 import quat_conj, quat_rotate, quat_rotate_inv
    from ..geometry.se3 import rot, trans

    pi, qi = trans(pose_i), rot(pose_i)
    pj, qj = trans(pose_j), rot(pose_j)
    tio, qio = trans(ex_io), rot(ex_io)

    qi_io = quat_mul(qi, qio)
    rel_p = quat_rotate_inv(qi_io, quat_rotate(qj, tio) + pj - quat_rotate(qi, tio) - pi)
    r_p = rel_p - dp_time
    q_err = quat_mul(quat_conj(dq_time), quat_mul(quat_conj(qi_io), quat_mul(qj, qio)))
    r_q = quat_log(q_err)
    return jnp.concatenate([r_p, r_q])
