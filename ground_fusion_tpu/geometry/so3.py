"""SO(3) / quaternion primitives for the TPU-native ground-SLAM engine.

Quaternions are stored as ``[w, x, y, z]`` arrays (Hamilton convention, same
algebra as Eigen's ``Quaterniond`` used throughout the reference; cf.
``vins_estimator/src/utility/utility.h`` — ``deltaQ``, ``skewSymmetric``,
``Qleft``/``Qright``, ``g2R``, ``ypr`` round-trips).

Everything here is shape-polymorphic pure JAX: each function operates on the
trailing axis and broadcasts over leading batch axes, so the estimator can
``vmap``/``scan`` over windows of poses without host loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Basic quaternion algebra
# ---------------------------------------------------------------------------


def quat_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_conj(q: jax.Array) -> jax.Array:
    """Conjugate == inverse for unit quaternions."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a ⊗ b, broadcasting over leading axes."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by unit quaternion(s) q (q * v * q^-1).

    Uses the expanded 15-mul form rather than building the rotation matrix.
    """
    w = q[..., 0:1]
    u = q[..., 1:4]
    # v' = v + 2 w (u × v) + 2 u × (u × v)
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Unit quaternion -> 3x3 rotation matrix (batched on leading axes)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jax.Array) -> jax.Array:
    """3x3 rotation matrix -> unit quaternion [w,x,y,z], branch-free.

    Computes all four Shepperd candidates and selects the best-conditioned one
    with ``where`` so it is jit/vmap-safe.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-24))

    # Candidate 0: trace-dominant
    s0 = safe_sqrt(1.0 + tr) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], axis=-1)
    # Candidate 1: m00-dominant
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1)
    # Candidate 2: m11-dominant
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], axis=-1)
    # Candidate 3: m22-dominant
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], axis=-1)

    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# so(3) exp / log and Jacobians
# ---------------------------------------------------------------------------


def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix [v]x, batched."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def quat_exp(phi: jax.Array) -> jax.Array:
    """so(3) vector -> unit quaternion exp([0, phi/2]). Taylor-safe at 0."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    half = 0.5 * theta
    small = theta2 < 1e-12
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    return jnp.concatenate([w, k * phi], axis=-1)


def quat_log(q: jax.Array) -> jax.Array:
    """Unit quaternion -> so(3) vector (rotation-vector), Taylor-safe."""
    q = jnp.where(q[..., 0:1] < 0, -q, q)  # take the short arc
    w = jnp.clip(q[..., 0:1], -1.0, 1.0)
    vn2 = jnp.sum(q[..., 1:4] ** 2, axis=-1, keepdims=True)
    vn = jnp.sqrt(jnp.maximum(vn2, 1e-24))
    angle = 2.0 * jnp.arctan2(vn, w)
    small = vn2 < 1e-14
    k = jnp.where(small, 2.0 / jnp.maximum(w, 1e-12), angle / vn)
    return k * q[..., 1:4]


def delta_q(theta: jax.Array) -> jax.Array:
    """First-order quaternion increment [1, theta/2] (reference Utility::deltaQ,
    ``vins_estimator/src/utility/utility.h:22-32``), normalized."""
    half = 0.5 * theta
    one = jnp.ones(theta.shape[:-1] + (1,), dtype=theta.dtype)
    return quat_normalize(jnp.concatenate([one, half], axis=-1))


def so3_exp_mat(phi: jax.Array) -> jax.Array:
    """Rodrigues: so(3) vector -> rotation matrix."""
    return quat_to_mat(quat_exp(phi))


def so3_log_mat(m: jax.Array) -> jax.Array:
    return quat_log(mat_to_quat(m))


def right_jacobian_so3(phi: jax.Array) -> jax.Array:
    """Right Jacobian Jr(phi) of SO(3) (Sophus::rightJacobianSO3 analog; used by
    the wheel preintegration noise model, ``wheel_integration_base.h:114-123``).
    """
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    K = skew(phi)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    small = theta2 < 1e-12
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-24))
    b = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, 1e-24)
    )
    return eye - a * K + b * KK


def left_quat_prod_mat(q: jax.Array) -> jax.Array:
    """Qleft: 4x4 matrix s.t. Qleft(a) @ b == quat_mul(a, b) (utility.h:34-42)."""
    w = q[..., 0]
    v = q[..., 1:4]
    top = jnp.concatenate([w[..., None, None], -v[..., None, :]], axis=-1)
    bottom_left = v[..., :, None]
    bottom_right = w[..., None, None] * jnp.eye(3, dtype=q.dtype) + skew(v)
    bottom = jnp.concatenate([bottom_left, bottom_right], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def right_quat_prod_mat(q: jax.Array) -> jax.Array:
    """Qright: 4x4 matrix s.t. Qright(b) @ a == quat_mul(a, b) (utility.h:44-52)."""
    w = q[..., 0]
    v = q[..., 1:4]
    top = jnp.concatenate([w[..., None, None], -v[..., None, :]], axis=-1)
    bottom_left = v[..., :, None]
    bottom_right = w[..., None, None] * jnp.eye(3, dtype=q.dtype) - skew(v)
    bottom = jnp.concatenate([bottom_left, bottom_right], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


# ---------------------------------------------------------------------------
# Euler (yaw-pitch-roll, Z-Y-X) and gravity alignment
# ---------------------------------------------------------------------------


def mat_to_ypr(m: jax.Array) -> jax.Array:
    """Rotation matrix -> [yaw, pitch, roll] in radians (utility.h:54-76 uses
    degrees; we keep radians and convert at the I/O edge)."""
    yaw = jnp.arctan2(m[..., 1, 0], m[..., 0, 0])
    pitch = jnp.arctan2(
        -m[..., 2, 0],
        m[..., 0, 0] * jnp.cos(yaw) + m[..., 1, 0] * jnp.sin(yaw),
    )
    roll = jnp.arctan2(
        m[..., 0, 2] * jnp.sin(yaw) - m[..., 1, 2] * jnp.cos(yaw),
        -m[..., 0, 1] * jnp.sin(yaw) + m[..., 1, 1] * jnp.cos(yaw),
    )
    return jnp.stack([yaw, pitch, roll], axis=-1)


def ypr_to_mat(ypr: jax.Array) -> jax.Array:
    """[yaw, pitch, roll] (radians) -> rotation matrix Rz(y) Ry(p) Rx(r)."""
    y, p, r = jnp.moveaxis(ypr, -1, 0)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cr, sr = jnp.cos(r), jnp.sin(r)
    m = jnp.stack(
        [
            cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr,
            sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr,
            -sp, cp * sr, cp * cr,
        ],
        axis=-1,
    )
    return m.reshape(ypr.shape[:-1] + (3, 3))


def g2r(g: jax.Array) -> jax.Array:
    """Rotation aligning measured gravity direction g with +z, yaw-free
    (Utility::g2R, utility.h:78-90): R0 such that R0 @ ĝ == e3 and R0 has zero
    yaw."""
    ng1 = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    ng2 = jnp.array([0.0, 0.0, 1.0], dtype=g.dtype)
    # rotation taking ng1 to ng2
    axis = jnp.cross(ng1, jnp.broadcast_to(ng2, ng1.shape))
    s = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    c = jnp.sum(ng1 * ng2, axis=-1, keepdims=True)
    angle = jnp.arctan2(s, c)
    axis_safe = axis / jnp.maximum(s, 1e-12)
    r0 = so3_exp_mat(axis_safe * angle)
    # remove yaw
    yaw = mat_to_ypr(r0)[..., 0]
    unyaw = ypr_to_mat(jnp.stack([-yaw, jnp.zeros_like(yaw), jnp.zeros_like(yaw)], axis=-1))
    return unyaw @ r0


def yaw_to_mat(yaw: jax.Array) -> jax.Array:
    z = jnp.zeros_like(yaw)
    return ypr_to_mat(jnp.stack([yaw, z, z], axis=-1))
