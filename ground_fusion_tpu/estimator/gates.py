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
