"""Initialization: gyro-bias solve, wheel-aided linear alignment, gravity
refinement, stationary/dynamic bootstrap.

TPU-native re-design of ``initial/initial_aligment.cpp`` (solveGyroscopeBias
:14-47, TangentBasis :49-63, LinearAlignmentWithWheel :353-424,
RefineGravityWithWheel-family :426-497) and the stationary / wheel-activation
paths of ``Estimator::initialStructure`` (``estimator.cpp:1604-1682``): every
per-frame loop becomes a batched least-squares assembled with vmap + one
dense solve — these run once at bootstrap, so clarity > kernel tuning.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.so3 import (
    g2r,
    left_quat_prod_mat,
    mat_to_quat,
    mat_to_ypr,
    quat_conj,
    quat_identity,
    quat_mul,
    quat_to_mat,
    right_quat_prod_mat,
    ypr_to_mat,
)
from ..preintegration.imu import ImuPreint
from ..preintegration.wheel import WheelPreint
from .window import WindowState


def solve_gyroscope_bias(quats: jax.Array, pre: ImuPreint, valid: jax.Array) -> jax.Array:
    """Linear LS for the gyro-bias increment (initial_aligment.cpp:14-47):
    rows 2·vec(Δq⁻¹ ⊗ (qᵢ⁻¹ qⱼ)) = J_{q,bg} · δbg over adjacent frame pairs.

    quats: [N,4] body orientations; pre: axis-N preints (slot k = (k-1,k]);
    valid: [N] interval validity."""
    n = quats.shape[0]
    q_i, q_j = quats[:-1], quats[1:]
    q_ij = quat_mul(quat_conj(q_i), q_j)
    Jq = pre.jacobian[1:, 3:6, 12:15]                       # [N-1,3,3]
    rhs = 2.0 * quat_mul(quat_conj(pre.delta_q[1:]), q_ij)[:, 1:4]
    w = valid[1:].astype(quats.dtype)[:, None]
    A = jnp.einsum("kij,kil->jl", Jq * w[..., None], Jq)
    b = jnp.einsum("kij,ki->j", Jq * w[..., None], rhs)
    return jnp.linalg.solve(A + 1e-10 * jnp.eye(3, dtype=quats.dtype), b)


def tangent_basis(g0: jax.Array) -> jax.Array:
    """Two unit vectors spanning g0's orthogonal complement
    (initial_aligment.cpp:49-63), branch-free."""
    a = g0 / jnp.linalg.norm(g0)
    tmp = jnp.where(jnp.abs(a[2]) > 0.9999,
                    jnp.array([1.0, 0.0, 0.0], g0.dtype),
                    jnp.array([0.0, 0.0, 1.0], g0.dtype))
    b = tmp - a * jnp.dot(a, tmp)
    b = b / jnp.linalg.norm(b)
    c = jnp.cross(a, b)
    return jnp.stack([b, c], axis=-1)                        # [3,2]


def _alignment_blocks(Rs, Ts, imu_pre, wheel_pre, tic, tio, rio_mat):
    """The shared 9-row measurement blocks of the wheel linear alignment
    (initial_aligment.cpp:370-391): rows 0-2 position, 3-5 velocity,
    6-8 wheel-position. Returns per-pair (A9 [N-1,9,10], b9 [N-1,9]) against
    unknowns [v_i(3), v_j(3), g(3), s(1)] (s scaled by 1/100)."""
    n = Rs.shape[0]
    dtype = Rs.dtype
    R_i, R_j = Rs[:-1], Rs[1:]
    T_i, T_j = Ts[:-1], Ts[1:]
    dt = imu_pre.sum_dt[1:][:, None, None]
    RiT = jnp.swapaxes(R_i, -1, -2)
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), R_i.shape)

    dT = jnp.einsum("kij,kj->ki", RiT, T_j - T_i)
    A = jnp.zeros((n - 1, 9, 10), dtype)
    b = jnp.zeros((n - 1, 9), dtype)
    A = A.at[:, 0:3, 0:3].set(-dt * I3)
    A = A.at[:, 0:3, 6:9].set(RiT * 0.5 * dt * dt)
    A = A.at[:, 0:3, 9].set(dT / 100.0)
    b = b.at[:, 0:3].set(
        imu_pre.delta_p[1:]
        + jnp.einsum("kij,j->ki", RiT @ R_j, tic)
        - tic[None, :]
    )
    A = A.at[:, 3:6, 0:3].set(-I3)
    A = A.at[:, 3:6, 3:6].set(RiT @ R_j)
    A = A.at[:, 3:6, 6:9].set(RiT * dt)
    b = b.at[:, 3:6].set(imu_pre.delta_v[1:])

    RioT = rio_mat.T
    RiwT = jnp.swapaxes(R_i @ rio_mat, -1, -2)               # (R_i RIO)^T
    A = A.at[:, 6:9, 9].set(jnp.einsum("kij,kj->ki", RiwT, T_j - T_i) / 100.0)
    b = b.at[:, 6:9].set(
        wheel_pre.delta_p[1:]
        - jnp.einsum("ij,kjl,l->ki", RioT, RiT @ R_j, tio)
        + jnp.einsum("kij,kjl,l->ki", RiwT, R_j, tic)
        - (RioT @ (tic - tio))[None, :]
    )
    return A, b


def _solve_banded(A9, b9, n, tail_dim, dtype):
    """Scatter the per-pair blocks into the dense (3n + tail) normal system
    and solve (initial_aligment.cpp:398-414)."""
    ns = 3 * n + tail_dim
    H = jnp.zeros((ns, ns), dtype)
    g = jnp.zeros((ns,), dtype)
    rA = jnp.einsum("kri,krj->kij", A9, A9)                  # [N-1,10,10]
    rb = jnp.einsum("kri,kr->ki", A9, b9)

    def body(i, carry):
        H, g = carry
        idx = jnp.concatenate([3 * i + jnp.arange(6), 3 * n + jnp.arange(tail_dim)])
        H = H.at[idx[:, None], idx[None, :]].add(rA[i])
        g = g.at[idx].add(rb[i])
        return H, g

    H, g = jax.lax.fori_loop(0, A9.shape[0], body, (H, g))
    x = jnp.linalg.solve(H * 1000.0 + 1e-8 * jnp.eye(ns, dtype=dtype), g * 1000.0)
    return x


def _alignment_solve(A9, b9, n, dtype, g_norm, use_wheel: bool, use_scale: bool,
                     refine_iters: int = 4):
    """Shared solve + tangent-space gravity refinement for all four
    ``LinearAlignment*`` variants (initial_aligment.cpp:199-653 dispatch:
    mono/Wheel/Depth/WD differ only in which rows exist and whether scale is a
    variable)."""
    if not use_wheel:
        A9 = A9.at[:, 6:9, :].set(0.0)
        b9 = b9.at[:, 6:9].set(0.0)
    if not use_scale:
        # scale known = 1: move the (column × 100·s) term to the rhs
        b9 = b9 - 100.0 * A9[:, :, 9]
        A9 = A9.at[:, :, 9].set(0.0)

    x = _solve_banded(A9, b9, n, 4, dtype)
    g_est = x[3 * n : 3 * n + 3]
    s = x[3 * n + 3] / 100.0 if use_scale else jnp.asarray(1.0, dtype)
    ok = jnp.abs(jnp.linalg.norm(g_est) - g_norm) < 0.5
    if use_scale:
        ok = ok & (s >= 0)

    def refine(carry, _):
        g0, _, _ = carry
        g0 = g0 / jnp.linalg.norm(g0) * g_norm
        lxly = tangent_basis(g0)                              # [3,2]
        A8 = jnp.concatenate(
            [A9[:, :, 0:6], jnp.einsum("krj,jl->krl", A9[:, :, 6:9], lxly),
             A9[:, :, 9:10]],
            axis=-1,
        )                                                    # [N-1,9,9]
        b8 = b9 - jnp.einsum("krj,j->kr", A9[:, :, 6:9], g0)
        x = _solve_banded(A8, b8, n, 3, dtype)
        dg = x[3 * n : 3 * n + 2]
        g1 = g0 + lxly @ dg
        g1 = g1 / jnp.linalg.norm(g1) * g_norm
        s1 = x[3 * n + 2] / 100.0 if use_scale else jnp.asarray(1.0, dtype)
        return (g1, x[: 3 * n], s1), None

    s0 = s if use_scale else jnp.asarray(1.0, dtype)
    (g_ref, vels_flat, s_ref), _ = jax.lax.scan(
        refine, (g_est, x[: 3 * n], s0), None, length=refine_iters
    )
    vels = vels_flat.reshape(n, 3)
    if use_scale:
        ok = ok & (s_ref >= 0)
    return ok, g_ref, vels, s_ref


def linear_alignment_wheel(Rs, Ts, imu_pre: ImuPreint, wheel_pre: WheelPreint,
                           tic, tio, rio_mat, g_norm: float, refine_iters: int = 4):
    """Wheel-aided velocity/gravity/scale alignment (LinearAlignmentWithWheel
    + RefineGravityWithWheel, initial_aligment.cpp:353-497).

    Rs [N,3,3], Ts [N,3] — frame body rotations/positions (from wheel odometry
    or SfM). Returns (ok, g_world [3], velocities_body [N,3], scale)."""
    A9, b9 = _alignment_blocks(Rs, Ts, imu_pre, wheel_pre, tic, tio, rio_mat)
    return _alignment_solve(A9, b9, Rs.shape[0], Rs.dtype, g_norm,
                            use_wheel=True, use_scale=True,
                            refine_iters=refine_iters)


def linear_alignment_mono(Rs, Ts, imu_pre: ImuPreint, tic, g_norm: float):
    """Monocular-visual alignment with unknown scale (LinearAlignment,
    initial_aligment.cpp:199-280)."""
    from ..preintegration.wheel import identity_wheel_preint

    n = Rs.shape[0]
    wp = jax.tree_util.tree_map(
        lambda a: jnp.stack([a] * n), identity_wheel_preint(Rs.dtype)
    )
    A9, b9 = _alignment_blocks(Rs, Ts, imu_pre, wp, tic, jnp.zeros(3, Rs.dtype),
                               jnp.eye(3, dtype=Rs.dtype))
    return _alignment_solve(A9, b9, n, Rs.dtype, g_norm,
                            use_wheel=False, use_scale=True)


def linear_alignment_depth(Rs, Ts, imu_pre: ImuPreint, tic, g_norm: float):
    """RGBD alignment — metric scale known (LinearAlignmentWithDepth,
    initial_aligment.cpp:574-638)."""
    from ..preintegration.wheel import identity_wheel_preint

    n = Rs.shape[0]
    wp = jax.tree_util.tree_map(
        lambda a: jnp.stack([a] * n), identity_wheel_preint(Rs.dtype)
    )
    A9, b9 = _alignment_blocks(Rs, Ts, imu_pre, wp, tic, jnp.zeros(3, Rs.dtype),
                               jnp.eye(3, dtype=Rs.dtype))
    return _alignment_solve(A9, b9, n, Rs.dtype, g_norm,
                            use_wheel=False, use_scale=False)


def linear_alignment_wd(Rs, Ts, imu_pre: ImuPreint, wheel_pre: WheelPreint,
                        tic, tio, rio_mat, g_norm: float):
    """Wheel + depth alignment — wheel rows, metric scale known
    (LinearAlignmentWithWD, initial_aligment.cpp:499-572)."""
    A9, b9 = _alignment_blocks(Rs, Ts, imu_pre, wheel_pre, tic, tio, rio_mat)
    return _alignment_solve(A9, b9, Rs.shape[0], Rs.dtype, g_norm,
                            use_wheel=True, use_scale=False)


def stationary_bias_init(acc_mean: jax.Array, gyr_mean: jax.Array, g_norm: float):
    """Stationary bootstrap (``estimator.cpp:1604-1643``): accel bias from the
    gravity-aligned mean specific force, gyro bias = mean gyro rate."""
    G = jnp.array([0.0, 0.0, g_norm], acc_mean.dtype)
    R0 = g2r(acc_mean)                                       # world_R_body, yaw-free
    ba = acc_mean - R0.T @ G
    return ba, gyr_mean, R0


def align_window_to_gravity(state: WindowState, g_est: jax.Array, vels_body: jax.Array,
                            g_norm: float) -> WindowState:
    """Rotate the whole window so gravity is +z with frame-0 yaw zeroed, and
    install the aligned velocities (``estimator.cpp:1657-1677`` and
    visualInitialAlign ``:1849-1926``)."""
    R0 = g2r(g_est)
    R_b0 = quat_to_mat(state.poses[0, 3:7])
    ypr = mat_to_ypr(R0 @ R_b0)
    un = ypr_to_mat(jnp.stack([-ypr[0], jnp.zeros((), state.dtype), jnp.zeros((), state.dtype)]))
    rot_diff = un @ R0

    Rs = quat_to_mat(state.poses[:, 3:7])
    new_R = jnp.einsum("ij,kjl->kil", rot_diff, Rs)
    new_p = jnp.einsum("ij,kj->ki", rot_diff, state.poses[:, 0:3])
    v_world = jnp.einsum("kij,kj->ki", new_R, vels_body)
    poses = jnp.concatenate([new_p, mat_to_quat(new_R)], axis=-1)
    sbs = state.sbs.at[:, 0:3].set(v_world)
    return state._replace(poses=poses, sbs=sbs)


def calibrate_extrinsic_rotation(q_cam: jax.Array, q_imu: jax.Array,
                                 valid: jax.Array, iters: int = 5):
    """Online camera–IMU rotation hand-eye calibration.

    Semantics of ``InitialEXRotation::CalibrationExRotation``
    (``initial/initial_ex_rotation.cpp:22-79``, the ESTIMATE_EXTRINSIC=2
    bootstrap): each frame pair contributes the quaternion hand-eye
    constraint ``q_cam ⊗ x = x ⊗ q_imu`` as a 4x4 block
    ``Qleft(q_cam) − Qright(q_imu)``, Huber-downweighted by the angular
    disagreement (deg, knee at 5°) between the camera rotation and the
    IMU rotation conjugated into the camera frame by the current estimate.
    The reference re-solves the growing stacked SVD once per incoming
    frame; here the whole padded batch is linearized at once and the
    weight→solve cycle runs ``iters`` fixed Picard iterations (same fixed
    point, jit-friendly). The 4x4 normal matrix is eigendecomposed instead
    of SVD-ing the tall stack — identical null space, MXU-trivial.

    Args:
      q_cam: [N,4] wxyz relative camera rotations (frame k → k+1, from the
        essential matrix — ``sfm.relative_pose_ransac``).
      q_imu: [N,4] wxyz preintegrated IMU delta rotations for the same pairs.
      valid: [N] bool mask of usable pairs.
      iters: Picard iterations of the reweight→solve cycle.

    Returns:
      (ric matrix [3,3], ok flag) — ok mirrors the reference's observability
      gate ``ric_cov(1) > 0.25`` (second-smallest singular value of the
      weighted stack).
    """
    dtype = q_cam.dtype
    w_valid = valid.astype(dtype)

    def solve_once(q_ric, _):
        # IMU rotation seen from the camera frame under the current estimate
        q_cg = quat_mul(quat_mul(quat_conj(q_ric)[None, :], q_imu), q_ric[None, :])
        dot = jnp.clip(jnp.abs(jnp.sum(q_cam * q_cg, axis=-1)), 0.0, 1.0)
        ang_deg = jnp.degrees(2.0 * jnp.arccos(dot))
        huber = jnp.where(ang_deg > 5.0, 5.0 / jnp.maximum(ang_deg, 1e-9), 1.0)
        w = (huber * w_valid)[:, None, None]

        A = w * (left_quat_prod_mat(q_cam) - right_quat_prod_mat(q_imu))  # [N,4,4]
        N4 = jnp.einsum("nij,nik->jk", A, A)                              # AᵀA, 4x4
        eigval, eigvec = jnp.linalg.eigh(N4)                              # ascending
        x = eigvec[:, 0]
        x = x * jnp.sign(jnp.where(jnp.abs(x[0]) > 1e-12, x[0], 1.0))
        # q_cam ⊗ x = x ⊗ q_imu  →  ric = R(x)⁻¹ (reference: estimated_R.inverse())
        q_new = quat_conj(x / jnp.linalg.norm(x))
        sv2 = jnp.sqrt(jnp.maximum(eigval[1], 0.0))   # second-smallest singular value
        return q_new, sv2

    q_ric, sv2 = jax.lax.scan(solve_once, quat_identity(dtype), None, length=iters)
    ok = (sv2[-1] > 0.25) & (jnp.sum(valid) >= 10)
    return quat_to_mat(q_ric), ok
