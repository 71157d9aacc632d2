"""Runtime gates: outlier rejection, stationarity detectors, wheel anomaly,
failure detection — the reference's data-driven robustness layer as pure
functions producing masks (SURVEY §5: "keep the anomaly gates as data
inputs to the solver").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.se3 import pose_apply, pose_apply_inv, pose_compose
from .window import Tracks, WindowState


def moving_consistency_check(state: WindowState, tracks: Tracks,
                             focal: float = 460.0,
                             reproj_px: float = 10.0,
                             err3d_ratio: float = 2.0) -> jax.Array:
    """Batched ``movingConsistencyCheckW`` (``estimator.cpp:3968-4012``):
    per landmark, mean reprojection error across its observations (anchored
    depth) and mean 3-D endpoint discrepancy relative to depth; returns a
    "remove" mask for landmarks exceeding 10 px or ratio 2.0 — the dynamic-
    object rejection of the wheel-consistency path."""
    ml, f = tracks.obs_valid.shape
    dtype = tracks.obs.dtype
    cams = pose_compose(state.poses, state.ex_cam[None, :])       # [F,7]
    anchor = cams[tracks.start_frame]                             # [ML,7]
    rays = jnp.concatenate(
        [tracks.obs[:, :, 0:2], jnp.ones((ml, f, 1), dtype)], axis=-1)
    depth = 1.0 / jnp.maximum(tracks.inv_depth, 1e-6)
    anchor_ray = jnp.take_along_axis(
        rays, tracks.start_frame[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]                                                       # [ML,3]
    pts_w = pose_apply(anchor, anchor_ray * depth[:, None])       # [ML,3]

    pts_cj = pose_apply_inv(cams[None, :, :], pts_w[:, None, :])  # [ML,F,3]
    zj = pts_cj[..., 2]
    proj = pts_cj[..., 0:2] / jnp.maximum(zj[..., None], 1e-6)
    err2d = jnp.linalg.norm(proj - tracks.obs[:, :, 0:2], axis=-1)
    # 3-D endpoint discrepancy: measured ray at obs depth (when z known from
    # the model) vs model point, normalized by depth
    meas_pt = rays * zj[..., None]
    err3d = jnp.linalg.norm(meas_pt - pts_cj, axis=-1) / jnp.maximum(depth[:, None], 1e-6)

    ok = tracks.obs_valid & (jnp.arange(f)[None, :] != tracks.start_frame[:, None])
    cnt = jnp.maximum(jnp.sum(ok, axis=1), 1)
    mean2d = jnp.sum(jnp.where(ok, err2d, 0.0), axis=1) / cnt
    mean3d = jnp.sum(jnp.where(ok, err3d, 0.0), axis=1) / cnt
    eligible = tracks.active & tracks.solve_ok & (jnp.sum(tracks.obs_valid, axis=1) >= 2)
    return eligible & ((focal * mean2d > reproj_px) | (mean3d > err3d_ratio))


def remove_outliers(tracks: Tracks, remove: jax.Array) -> Tracks:
    """``FeatureManager::removeOutlier`` — deactivate flagged landmarks."""
    keep = ~remove
    return tracks._replace(
        active=tracks.active & keep,
        solve_ok=tracks.solve_ok & keep,
    )


def wheel_body_deltas(state: WindowState, wheel_pre) -> jax.Array:
    """ΔP_wheel[k]: wheel-implied body translation over interval (k-1, k] —
    ``T_io ∘ ΔT_o ∘ T_io⁻¹`` translation part (estimator.cpp:629-636)."""
    from ..geometry.so3 import quat_rotate, quat_rotate_inv

    q_io = state.ex_wheel[3:7]
    t_io = state.ex_wheel[0:3]
    t_o = quat_rotate_inv(q_io, t_io)
    dq_b = jax.vmap(
        lambda dq: quat_rotate(q_io, quat_rotate(dq, t_o)))(wheel_pre.delta_q)
    return (t_io[None, :]
            + jax.vmap(lambda dp: quat_rotate(q_io, dp))(wheel_pre.delta_p)
            - dq_b)                                            # [F,3]


def newest_wheel_anomaly(state: WindowState, imu_pre, wheel_pre, g,
                         anomaly_thresh: float) -> jax.Array:
    """Wheel slip/bump test over the NEWEST interval — the reference's
    wheel-vs-IMU dead-reckoning comparison at measurement time
    (``estimator.cpp:629-636``): ``‖ΔP_wheel − ΔP_imu‖ > thresh`` with
    ΔP_imu = v·dt − ½g·dt² rotated into body + the preintegrated Δp.
    Evaluated ONCE per interval (at its first solve, when the window is
    converged) and then PERSISTED in ``WheelWindowBuffer.bad`` — a
    state-derived per-slot recomputation is self-referential (a bad window
    would disable the wheel factors that fix it) and the stationary freeze
    legitimately zeroes window velocities, which would poison older slots'
    v·dt terms."""
    from ..geometry.so3 import quat_rotate_inv

    f = state.poses.shape[0]
    j = f - 1
    dt = imu_pre.sum_dt[j]
    q_i = state.poses[j - 1, 3:7]
    v_body = quat_rotate_inv(q_i, state.sbs[j - 1, 0:3] * dt - 0.5 * g * dt * dt)
    dp_imu = v_body + imu_pre.delta_p[j]
    dp_wheel = wheel_body_deltas(state, wheel_pre)[j]
    return jnp.linalg.norm(dp_wheel - dp_imu) > anomaly_thresh


def device_frame_gates(state: WindowState, tracks: Tracks, imu_buf, imu_pre,
                       wheel_pre, g: jax.Array, focal: float,
                       acc_var_thresh: float, parallax_px_thresh: float,
                       wheel_dp_thresh: float, anomaly_thresh: float):
    """Device twin of the per-frame anomaly/stationarity detection over the
    newest interval (``estimator.cpp:614-654, 870-896``), computed from the
    window buffers/preintegrations already on device — replaces the host
    per-sample dead-reckoning loops (VERDICT r2 weak #4).

    Returns (wheel_anomaly [], stationary []):
      - anomaly: :func:`newest_wheel_anomaly` over the newest interval; the
        caller persists it per interval in ``WheelWindowBuffer.bad`` so a
        contaminated interval stays excluded for its whole window lifetime
        (the reference re-admits them once its flag clears,
        estimator.cpp:3132-3136 — documented divergence);
      - stationary: 2-of-3 vote over accel variance, tracked parallax
        between the two newest frames, and ‖ΔP_wheel‖ of the newest interval.
    """
    f = state.poses.shape[0]
    anomaly = newest_wheel_anomaly(state, imu_pre, wheel_pre, g, anomaly_thresh)
    j = f - 1
    dp_wheel = wheel_body_deltas(state, wheel_pre)[j]

    # stationary vote 1: accel variance over the newest interval's samples
    acc = imu_buf.acc[j]
    w = imu_buf.valid[j].astype(acc.dtype)[:, None]
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(acc * w, axis=0) / n
    acc_var = jnp.sum(jnp.sum((acc - mean) ** 2 * w, axis=0) / n)
    v_imu = (acc_var < acc_var_thresh) & (jnp.sum(w) >= 3)

    # vote 2: mean tracked parallax between the two newest frames (px)
    both = tracks.active & tracks.obs_valid[:, f - 2] & tracks.obs_valid[:, f - 1]
    d = tracks.obs[:, f - 1, 0:2] - tracks.obs[:, f - 2, 0:2]
    par = jnp.sum(jnp.linalg.norm(d, axis=-1) * both) / jnp.maximum(jnp.sum(both), 1)
    v_vis = (par * focal < parallax_px_thresh) & (jnp.sum(both) > 0)

    # vote 3: wheel dead-reckoned translation
    v_wheel = jnp.linalg.norm(dp_wheel) < wheel_dp_thresh

    votes = v_imu.astype(jnp.int32) + v_vis.astype(jnp.int32) + v_wheel.astype(jnp.int32)
    return anomaly, votes >= 2


# ---------------------------------------------------------------------------
# Host-side detectors (numpy over raw sample queues)
# ---------------------------------------------------------------------------


def imu_stationary(acc_samples: np.ndarray, var_thresh: float = 0.1) -> bool:
    """checkimu (estimator.cpp:870): total accel variance below threshold."""
    if len(acc_samples) < 3:
        return False
    return float(np.var(acc_samples, axis=0).sum()) < var_thresh


def visual_stationary(parallaxes: np.ndarray, focal: float,
                      px_thresh: float = 0.5) -> bool:
    """checkvisual (estimator.cpp:884): mean tracked parallax, scaled to
    pixels, below threshold."""
    if len(parallaxes) == 0:
        return False
    return float(np.mean(parallaxes)) * focal < px_thresh


def wheel_stationary(dp_wheel: np.ndarray, thresh: float = 1e-3) -> bool:
    """preintegration-stationary (estimator.cpp:640-654)."""
    return float(np.linalg.norm(dp_wheel)) < thresh


def wheel_anomaly(dp_wheel: np.ndarray, dp_imu: np.ndarray,
                  thresh: float = 0.02) -> bool:
    """Wheel slip/bump detector (estimator.cpp:629-636):
    ‖ΔP_wheel − ΔP_imu‖ over one frame interval above threshold."""
    return float(np.linalg.norm(np.asarray(dp_wheel) - np.asarray(dp_imu))) > thresh


def failure_detection(sbs: np.ndarray, ba_thresh: float = 2.5,
                      bg_thresh: float = 1.0) -> bool:
    """``Estimator::failureDetection`` (estimator.cpp:2847-2888, active
    checks): accelerometer/gyro bias norms exploding ⇒ reboot."""
    ba = np.linalg.norm(sbs[-1, 3:6])
    bg = np.linalg.norm(sbs[-1, 6:9])
    return bool(ba > ba_thresh or bg > bg_thresh)
