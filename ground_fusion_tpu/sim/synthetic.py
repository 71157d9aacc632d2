"""Synthetic ground-robot trajectory + sensor simulator.

The reference's integration tests are rosbag replays (``README.md:146-186``);
no bags are redistributable here, so this module is the correctness oracle:
an analytic smooth trajectory differentiated with JAX autodiff produces exact
IMU (accel/gyro with gravity and biases), wheel velocity, and feature-track
measurements, and the estimator's output is compared against the closed-form
ground truth (ATE/RPE).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.se3 import pose, pose_apply_inv, pose_compose
from ..geometry.so3 import mat_to_quat, quat_conj, quat_mul, skew, ypr_to_mat


class SimParams(NamedTuple):
    radius: float = 3.0
    omega: float = 0.4          # rad/s around the circle
    z_amp: float = 0.0          # vertical bounce amplitude
    g_norm: float = 9.805
    imu_rate: float = 200.0
    wheel_rate: float = 100.0
    frame_rate: float = 10.0
    ba: tuple = (0.02, -0.01, 0.03)
    bg: tuple = (0.001, -0.002, 0.0015)
    acc_noise: float = 0.0
    gyr_noise: float = 0.0
    pix_noise: float = 0.0      # normalized-plane observation noise
    seed: int = 0
    # --- adversarial-scenario extensions (all default-off; defaults keep the
    # trajectory bit-identical to the constant-speed circle) ---
    # smooth stop-and-go: angular speed ramps to 0 over [stop_t1, stop_t2]
    # with tanh ramps of width stop_tau (the phase integral is closed-form
    # via log-cosh, so IMU/wheel samples stay exact autodiff derivatives)
    stop_t1: float = 0.0
    stop_t2: float = 0.0        # disabled while stop_t2 <= stop_t1
    stop_tau: float = 0.2
    # speed modulation: phase += mod_amp * sin(mod_freq * t)
    omega_mod_amp: float = 0.0
    omega_mod_freq: float = 0.5
    # wheel slip: the wheel odometer REPORTS extra body-frame velocity
    # slip_v during [slip_t1, slip_t2] while the body does not move that way
    # (the `anamoly.bag` scenario, reference README.md:171-186)
    slip_t1: float = 0.0
    slip_t2: float = 0.0        # disabled while slip_t2 <= slip_t1
    slip_v: tuple = (0.0, 0.0, 0.0)
    slip_tau: float = 0.05


def body_T_cam(dtype=jnp.float64) -> jax.Array:
    """Forward-looking camera: cam z = body +x, cam x = body −y, cam y = −z."""
    R = jnp.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]], dtype).T
    return pose(jnp.zeros(3, dtype), mat_to_quat(R))


def _logcosh(x):
    """Overflow-safe log(cosh(x)) = |x| + softplus(-2|x|) - log 2."""
    a = jnp.abs(x)
    return a + jnp.log1p(jnp.exp(-2.0 * a)) - jnp.log(2.0)


def _phase_of_t(t, sp: SimParams):
    """Angular phase φ(t) along the circle. Constant-speed by default;
    stop-and-go and speed modulation enter as closed-form phase terms so
    every sensor sample stays an exact autodiff derivative:

    φ̇ = ω·s(t) with s(t) = 1 − ½[tanh((t−t1)/τ) − tanh((t−t2)/τ)]
    ⇒ φ = ω·(t − ½τ[logcosh((t−t1)/τ) − logcosh((t−t2)/τ)])
    """
    phi = sp.omega * t
    if sp.stop_t2 > sp.stop_t1:                       # static Python gate
        tau = sp.stop_tau
        phi = sp.omega * (
            t - 0.5 * tau * (_logcosh((t - sp.stop_t1) / tau)
                             - _logcosh((t - sp.stop_t2) / tau))
        )
    if sp.omega_mod_amp != 0.0:
        phi = phi + sp.omega_mod_amp * jnp.sin(sp.omega_mod_freq * t)
    return phi


def _p_of_t(t, sp: SimParams):
    phi = _phase_of_t(t, sp)
    return jnp.stack(
        [
            sp.radius * jnp.cos(phi),
            sp.radius * jnp.sin(phi),
            sp.z_amp * jnp.sin(0.5 * t),
        ]
    )


def _ypr_of_t(t, sp: SimParams):
    yaw = _phase_of_t(t, sp) + jnp.pi / 2.0
    return jnp.stack([yaw, jnp.zeros_like(t), jnp.zeros_like(t)])


def gt_pose(t, sp: SimParams):
    """Ground-truth body pose at time t (body x = direction of travel)."""
    p = _p_of_t(t, sp)
    R = ypr_to_mat(_ypr_of_t(t, sp))
    return p, R


def gt_pose7(t, sp: SimParams):
    p, R = gt_pose(t, sp)
    return pose(p, mat_to_quat(R))


def imu_sample(t, sp: SimParams):
    """Exact IMU measurement at time t via autodiff of the trajectory:
    acc = Rᵀ(p̈ + G e3), gyr = vee(Rᵀ Ṙ) + bg."""
    t = jnp.asarray(t, jnp.float64)
    v = jax.jacfwd(lambda s: _p_of_t(s, sp))(t)
    a = jax.jacfwd(lambda s: jax.jacfwd(lambda u: _p_of_t(u, sp))(s))(t)
    p, R = gt_pose(t, sp)
    Rdot = jax.jacfwd(lambda s: ypr_to_mat(_ypr_of_t(s, sp)))(t)
    omega_hat = R.T @ Rdot
    gyr = jnp.stack([omega_hat[2, 1], omega_hat[0, 2], omega_hat[1, 0]])
    G = jnp.array([0.0, 0.0, sp.g_norm], jnp.float64)
    acc = R.T @ (a + G)
    return acc + jnp.asarray(sp.ba), gyr + jnp.asarray(sp.bg)


def wheel_sample(t, sp: SimParams):
    """Body-frame velocity + gyro (the wheel odometer's measurement model,
    ``rosNodeTest.cpp:81-188``). A configured slip window adds phantom
    body-frame velocity the body never had — the wheels-spinning-in-place
    corner case the anomaly gate exists for (``estimator.cpp:629-654``,
    demoed by the reference's `anamoly.bag`)."""
    t = jnp.asarray(t, jnp.float64)
    v = jax.jacfwd(lambda s: _p_of_t(s, sp))(t)
    _, R = gt_pose(t, sp)
    Rdot = jax.jacfwd(lambda s: ypr_to_mat(_ypr_of_t(s, sp)))(t)
    omega_hat = R.T @ Rdot
    gyr = jnp.stack([omega_hat[2, 1], omega_hat[0, 2], omega_hat[1, 0]])
    v_body = R.T @ v
    if sp.slip_t2 > sp.slip_t1:                       # static Python gate
        box = 0.5 * (jnp.tanh((t - sp.slip_t1) / sp.slip_tau)
                     - jnp.tanh((t - sp.slip_t2) / sp.slip_tau))
        v_body = v_body + box * jnp.asarray(sp.slip_v, v_body.dtype)
    return v_body, gyr


def make_landmarks(n: int, sp: SimParams, seed: int = 1) -> np.ndarray:
    """Points on an outer cylinder around the circular path (always in front
    of the forward-looking camera)."""
    rng = np.random.default_rng(seed)
    ang = rng.uniform(0, 2 * np.pi, n)
    rad = sp.radius + rng.uniform(1.0, 3.0, n)
    z = rng.uniform(-1.0, 2.0, n)
    return np.stack([rad * np.cos(ang), rad * np.sin(ang), z], axis=-1)


def project_landmarks(pose7, ex_cam, pts_w):
    """Normalized-plane observations + depth for all landmarks from one pose.
    Returns (uv [N,2], depth [N], visible [N])."""
    cam = pose_compose(pose7, ex_cam)
    pc = pose_apply_inv(cam, pts_w)
    z = pc[..., 2]
    uv = pc[..., 0:2] / jnp.maximum(z[..., None], 1e-6)
    visible = (z > 0.3) & (jnp.abs(uv[..., 0]) < 0.9) & (jnp.abs(uv[..., 1]) < 0.7)
    return uv, z, visible


def make_segments(n: int, sp: SimParams, seed: int = 2) -> np.ndarray:
    """World 3-D line segments on the outer cylinder (mostly vertical poles
    plus slanted edges) — the structural lines a LSD detector would find.
    Returns endpoints [n, 2, 3]."""
    rng = np.random.default_rng(seed)
    ang = rng.uniform(0, 2 * np.pi, n)
    rad = sp.radius + rng.uniform(1.5, 3.0, n)
    base = np.stack([rad * np.cos(ang), rad * np.sin(ang),
                     rng.uniform(-1.0, 0.5, n)], axis=-1)
    d = rng.normal(size=(n, 3))
    d[: n // 2] = np.array([0.0, 0.0, 1.0])     # poles
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return np.stack([base, base + 1.5 * d], axis=1)


def project_segments(pose7, ex_cam, segs_w):
    """Normalized-plane segment observations from one pose: obs4 [N,4]
    (x1,y1,x2,y2) + visibility (both endpoints in front and in FOV)."""
    cam = pose_compose(pose7, ex_cam)
    pa = pose_apply_inv(cam, segs_w[:, 0])
    pb = pose_apply_inv(cam, segs_w[:, 1])
    za, zb = pa[..., 2], pb[..., 2]
    ua = pa[..., 0:2] / jnp.maximum(za[..., None], 1e-6)
    ub = pb[..., 0:2] / jnp.maximum(zb[..., None], 1e-6)
    vis = (
        (za > 0.3) & (zb > 0.3)
        & (jnp.abs(ua[..., 0]) < 0.9) & (jnp.abs(ua[..., 1]) < 0.7)
        & (jnp.abs(ub[..., 0]) < 0.9) & (jnp.abs(ub[..., 1]) < 0.7)
    )
    return jnp.concatenate([ua, ub], axis=-1), vis


def imu_interval(t0, t1, sp: SimParams, cap: int, rng=None):
    """Padded IMU samples covering (t0, t1]: returns (dts[K], acc[K,3],
    gyr[K,3], valid[K], acc0, gyr0) — the shape the window buffers take."""
    dt = 1.0 / sp.imu_rate
    ts = np.arange(t0 + dt, t1 + 0.5 * dt, dt)
    k = len(ts)
    assert k <= cap, f"IMU interval needs {k} > cap {cap}"
    sample = jax.vmap(lambda t: imu_sample(t, sp))
    accs, gyrs = sample(jnp.asarray(ts)) if k else (jnp.zeros((0, 3)), jnp.zeros((0, 3)))
    acc0, gyr0 = imu_sample(t0, sp)
    if rng is not None and sp.acc_noise > 0:
        accs = accs + rng.normal(0, sp.acc_noise, accs.shape)
        gyrs = gyrs + rng.normal(0, sp.gyr_noise, gyrs.shape)
    dts = np.full(cap, 0.0)
    dts[:k] = np.diff(np.concatenate([[t0], ts]))
    out_acc = np.zeros((cap, 3))
    out_gyr = np.zeros((cap, 3))
    out_acc[:k] = np.asarray(accs)
    out_gyr[:k] = np.asarray(gyrs)
    valid = np.zeros(cap, bool)
    valid[:k] = True
    return dts, out_acc, out_gyr, valid, np.asarray(acc0), np.asarray(gyr0)


def wheel_interval(t0, t1, sp: SimParams, cap: int, rng=None):
    dt = 1.0 / sp.wheel_rate
    ts = np.arange(t0 + dt, t1 + 0.5 * dt, dt)
    k = len(ts)
    assert k <= cap, f"wheel interval needs {k} > cap {cap}"
    sample = jax.vmap(lambda t: wheel_sample(t, sp))
    vels, gyrs = sample(jnp.asarray(ts)) if k else (jnp.zeros((0, 3)), jnp.zeros((0, 3)))
    vel0, gyr0 = wheel_sample(t0, sp)
    dts = np.full(cap, 0.0)
    dts[:k] = np.diff(np.concatenate([[t0], ts]))
    out_v = np.zeros((cap, 3))
    out_g = np.zeros((cap, 3))
    out_v[:k] = np.asarray(vels)
    out_g[:k] = np.asarray(gyrs)
    valid = np.zeros(cap, bool)
    valid[:k] = True
    return dts, out_v, out_g, valid, np.asarray(vel0), np.asarray(gyr0)


def gt_velocity(t, sp: SimParams):
    t = jnp.asarray(t, jnp.float64)
    return jax.jacfwd(lambda s: _p_of_t(s, sp))(t)


def build_window_problem(cfg, sp: SimParams, t_start: float = 0.0, dtype=jnp.float64):
    """Construct a ground-truth EstimatorCore for one full window: exact
    poses/velocities/biases, feature tracks from projected landmarks, and
    padded IMU/wheel buffers — the standing test fixture for the solver and
    marginalization stack."""
    from ..estimator.buffers import ImuWindowBuffer, WheelWindowBuffer
    from ..estimator.window import Tracks, WindowState, empty_state

    f = cfg.num_frames
    ml = cfg.solver.max_landmarks
    cap_i = cfg.solver.max_imu_per_interval
    cap_w = cfg.solver.max_wheel_per_interval
    frame_dt = 1.0 / sp.frame_rate
    ts = t_start + np.arange(f) * frame_dt

    ex = body_T_cam(dtype)
    poses = jax.vmap(lambda t: gt_pose7(t, sp))(jnp.asarray(ts)).astype(dtype)
    vels = jax.vmap(lambda t: gt_velocity(t, sp))(jnp.asarray(ts)).astype(dtype)
    sbs = jnp.concatenate(
        [vels, jnp.tile(jnp.asarray(sp.ba, dtype), (f, 1)), jnp.tile(jnp.asarray(sp.bg, dtype), (f, 1))],
        axis=-1,
    )
    state = empty_state(f, dtype)._replace(poses=poses, sbs=sbs, ex_cam=ex)

    # landmarks -> tracks
    pts_w = jnp.asarray(make_landmarks(ml, sp, seed=sp.seed + 1), dtype)
    uv, z, vis = jax.vmap(lambda p7: project_landmarks(p7, ex, pts_w))(poses)
    uv = jnp.swapaxes(uv, 0, 1)          # [ML, F, 2]
    z = jnp.swapaxes(z, 0, 1)            # [ML, F]
    vis = np.asarray(jnp.swapaxes(vis, 0, 1))  # [ML, F]
    rng = np.random.default_rng(sp.seed + 2)
    if sp.pix_noise > 0:
        uv = uv + jnp.asarray(rng.normal(0, sp.pix_noise, uv.shape), dtype)

    n_seen = vis.sum(axis=1)
    active = n_seen >= 4
    start_frame = np.argmax(vis, axis=1).astype(np.int32)
    obs = jnp.concatenate(
        [uv, jnp.zeros((ml, f, 2), dtype), z[..., None]], axis=-1
    )  # [ML,F,5] x,y,vx,vy,depth
    anchor_z = z[jnp.arange(ml), jnp.asarray(start_frame)]
    tracks = Tracks(
        inv_depth=1.0 / jnp.maximum(anchor_z, 1e-3),
        active=jnp.asarray(active),
        solve_ok=jnp.asarray(active),
        depth_fixed=jnp.zeros(ml, bool),
        start_frame=jnp.asarray(start_frame),
        obs=obs * jnp.asarray(vis, dtype)[..., None],
        obs_valid=jnp.asarray(vis),
    )

    # sensor buffers
    ibuf = {k: [] for k in ("dts", "acc", "gyr", "valid", "acc0", "gyr0")}
    wbuf = {k: [] for k in ("dts", "vel", "gyr", "valid", "vel0", "gyr0")}
    for k in range(f):
        t0 = ts[k - 1] if k > 0 else ts[0]
        t1 = ts[k] if k > 0 else ts[0]
        d, a, g, v, a0, g0 = imu_interval(t0, t1, sp, cap_i, rng)
        for key, val in zip(("dts", "acc", "gyr", "valid", "acc0", "gyr0"), (d, a, g, v, a0, g0)):
            ibuf[key].append(val)
        d, vv, g, v, v0, g0 = wheel_interval(t0, t1, sp, cap_w, rng)
        for key, val in zip(("dts", "vel", "gyr", "valid", "vel0", "gyr0"), (d, vv, g, v, v0, g0)):
            wbuf[key].append(val)
    imu_buf = ImuWindowBuffer(
        *[jnp.asarray(np.stack(ibuf[k]), dtype if k not in ("valid",) else bool)
          for k in ("dts", "acc", "gyr", "valid", "acc0", "gyr0")]
    )
    wheel_buf = WheelWindowBuffer(
        *[jnp.asarray(np.stack(wbuf[k]), dtype if k not in ("valid",) else bool)
          for k in ("dts", "vel", "gyr", "valid", "vel0", "gyr0")],
        bad=jnp.zeros((f,), bool),
    )
    interval_valid = jnp.asarray(np.arange(f) >= 1)
    return dict(
        state=state, tracks=tracks, imu_buf=imu_buf, wheel_buf=wheel_buf,
        interval_valid=interval_valid, ts=ts, pts_w=pts_w, ex_cam=ex,
    )
