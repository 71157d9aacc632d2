"""Host-side feature tracker: id management around the device KLT kernels.

The counterpart of ``FeatureTracker::trackImage``
(``feature_tracker.cpp:103-372``) — owns feature ids, per-feature track
length, prediction seeding, refill and undistortion, and returns the
``{id: [x, y, z, u, v, vx, vy, depth]}``-style map the estimator ingests
(``feature_tracker.h:47-48``). All pixel math runs in the jitted kernels of
:mod:`.klt`; this class only shuffles ids.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..cameras.models import (
    CameraModel,
    PinholeParams,
    pinhole_lift_projective,
    pinhole_space_to_plane,
)
from ..pipeline import FrameFeature
from .klt import (
    build_pyramid,
    refill_corners,
    sample_depth,
    track_bidirectional,
)


class FeatureTracker:
    def __init__(self, cam, max_cnt: int = 128, min_dist: int = 30,
                 levels: int = 3, half: int = 10, iters: int = 10,
                 fb_thresh: float = 0.5, border: int = 5):
        """``cam``: a :class:`~..cameras.models.CameraModel` (any dispatched
        projection model — CameraFactory.cc:32-93 parity) or a bare
        ``PinholeParams`` for backward compatibility."""
        if isinstance(cam, PinholeParams):
            cam = CameraModel("pinhole", cam, pinhole_lift_projective,
                              pinhole_space_to_plane)
        self.cam = cam
        # stereo baseline (m) for the rectified right-image depth path; 0
        # disables stereo (config camera.baseline)
        self.baseline = 0.0
        self.max_cnt = max_cnt
        self.min_dist = min_dist
        self.levels = levels
        self.half = half
        self.iters = iters
        self.fb_thresh = fb_thresh
        self.border = border
        self.prev_pyr = None
        self.prev_pts = np.zeros((0, 2), np.float32)
        self.prev_norm = np.zeros((0, 2), np.float32)
        self.ids = np.zeros((0,), np.int64)
        self.track_len = np.zeros((0,), np.int64)
        self.next_id = 0
        self.prev_t: Optional[float] = None
        self.predict_pts: dict[int, tuple[float, float]] = {}
        # fisheye lens mask (FISHEYE_MASK, parameters.cpp:95-106): 0 =
        # outside the lens circle; None = disabled
        self.fisheye_mask: Optional[np.ndarray] = None

    def set_fisheye_mask(self, mask: np.ndarray) -> None:
        """Install a lens mask (uint8, 0 = cull zone) — the reference loads
        config/fisheye_mask_752x480.jpg and seeds every refill mask from it
        (``feature_tracker.cpp setMask``); here it gates both the tracked
        survivors and the refill candidates."""
        self.fisheye_mask = np.asarray(mask)

    def set_prediction(self, pts_px: dict[int, tuple[float, float]]) -> None:
        """Seed the next LK solve with estimator-predicted pixel positions
        (``FeatureTracker::setPrediction`` / ``hasPrediction`` path,
        ``feature_tracker.cpp:118-133``)."""
        self.predict_pts = dict(pts_px)

    def _stereo_depths(self, cur_pyr, img_right: np.ndarray) -> np.ndarray:
        """LK left→right disparity → metric depth per tracked feature
        (rectified pair; forward-backward gated; positive-disparity gate)."""
        n = len(self.prev_pts)
        pad = self.max_cnt - n
        pp = np.pad(self.prev_pts, ((0, pad), (0, 0)))
        valid = np.zeros(self.max_cnt, bool)
        valid[:n] = True
        pyr_r = tuple(build_pyramid(jnp.asarray(img_right, jnp.float32), self.levels))
        fwd, ok = track_bidirectional(
            cur_pyr, pyr_r, jnp.asarray(pp), jnp.asarray(pp),
            jnp.asarray(valid), self.levels, self.half, self.iters,
            self.fb_thresh,
        )
        fwd, ok = np.asarray(fwd)[:n], np.asarray(ok)[:n]
        disp = self.prev_pts[:, 0] - fwd[:, 0]
        # same-row gate for a rectified pair + positive disparity
        ok = ok & (np.abs(fwd[:, 1] - self.prev_pts[:, 1]) < 2.0) & (disp > 0.5)
        fx = float(np.asarray(self.cam.params.fx))
        with np.errstate(divide="ignore"):
            z = fx * self.baseline / np.maximum(disp, 1e-6)
        return np.where(ok, z, 0.0).astype(np.float32)

    def _undistort(self, pts: np.ndarray) -> np.ndarray:
        if len(pts) == 0:
            return np.zeros((0, 2), np.float32)
        rays = self.cam.lift_projective(jnp.asarray(pts))
        rays = rays / jnp.maximum(jnp.abs(rays[:, 2:3]), 1e-9)
        return np.asarray(rays[:, 0:2])

    def track(self, t: float, img: np.ndarray, depth: Optional[np.ndarray] = None,
              boxes: Optional[np.ndarray] = None,
              img_right: Optional[np.ndarray] = None) -> dict[int, FrameFeature]:
        """Track into the new frame, refill, and emit the feature map.

        ``boxes`` ([N,4] xyxy px) are dynamic-object detections; features
        inside any box are culled (``trackImagebox``,
        ``feature_tracker.cpp:564-606``).

        ``img_right``: rectified second-camera image (STEREO ingest). Each
        feature is LK-matched left→right with the forward-backward check and
        its disparity becomes a metric depth (fx·baseline/d) through the SAME
        depth channel RGBD uses — the TPU-native stereo path. (The reference
        fork's shipped BA likewise consumes one observation stream + depth:
        only proj21 enters the solve, estimator.cpp:3283-3292; the
        two-camera factor forms proj22/proj12 are implemented and FD-tested
        in estimator/factors.py for the full-stereo variant.)
        """
        img_j = jnp.asarray(img, jnp.float32)
        cur_pyr = tuple(build_pyramid(img_j, self.levels))
        dt = (t - self.prev_t) if self.prev_t is not None else 0.0

        if self.prev_pyr is not None and len(self.prev_pts) > 0:
            n = len(self.prev_pts)
            pad = self.max_cnt - n
            pp = np.pad(self.prev_pts, ((0, pad), (0, 0)))
            # prediction-seeded LK (feature_tracker.cpp:118-133)
            seed = pp.copy()
            h, w = img.shape[:2]
            for i, fid in enumerate(self.ids):
                p = self.predict_pts.get(int(fid))
                if p is not None and 0 <= p[0] < w and 0 <= p[1] < h:
                    seed[i] = p
            valid = np.zeros(self.max_cnt, bool)
            valid[:n] = True
            fwd, ok = track_bidirectional(
                self.prev_pyr, cur_pyr, jnp.asarray(pp), jnp.asarray(seed),
                jnp.asarray(valid), self.levels, self.half, self.iters,
                self.fb_thresh,
            )
            fwd = np.asarray(fwd)[:n]
            ok = np.asarray(ok)[:n]
            # overexposure cull: drop features landing on saturated pixels
            # (grey > 250; feature_tracker.cpp:155-168)
            xi = np.clip(fwd[:, 0].astype(np.int32), 0, w - 1)
            yi = np.clip(fwd[:, 1].astype(np.int32), 0, h - 1)
            ok = ok & (np.asarray(img, np.float32)[yi, xi] <= 250.0)
            # fisheye lens-circle cull (FISHEYE_MASK, parameters.cpp:95-106)
            if self.fisheye_mask is not None:
                ok = ok & (self.fisheye_mask[yi, xi] > 0)
            # dynamic-object cull (trackImagebox, feature_tracker.cpp:564-606)
            if boxes is not None and len(boxes) > 0:
                inside = (
                    (fwd[:, 0:1] >= boxes[None, :, 0]) & (fwd[:, 0:1] <= boxes[None, :, 2])
                    & (fwd[:, 1:2] >= boxes[None, :, 1]) & (fwd[:, 1:2] <= boxes[None, :, 3])
                ).any(axis=1)
                ok = ok & ~inside
            # keep survivors, longest tracks first (feature_tracker.cpp:60-83)
            self.prev_pts = fwd[ok]
            self.ids = self.ids[ok]
            prev_norm_old = self.prev_norm[ok]
            self.track_len = self.track_len[ok] + 1
            order = np.argsort(-self.track_len, kind="stable")
            self.prev_pts = self.prev_pts[order]
            self.ids = self.ids[order]
            self.track_len = self.track_len[order]
            prev_norm_old = prev_norm_old[order]
        else:
            prev_norm_old = np.zeros((0, 2), np.float32)

        # refill up to max_cnt
        need = self.max_cnt - len(self.prev_pts)
        if need > 0:
            n = len(self.prev_pts)
            pad_pts = np.zeros((self.max_cnt, 2), np.float32)
            pad_pts[:n] = self.prev_pts
            pad_valid = np.zeros(self.max_cnt, bool)
            pad_valid[:n] = True
            new_pts, new_ok = refill_corners(
                img_j, jnp.asarray(pad_pts), jnp.asarray(pad_valid),
                self.max_cnt, self.min_dist, self.border,
            )
            new_pts = np.asarray(new_pts)[np.asarray(new_ok)]
            if self.fisheye_mask is not None and len(new_pts):
                h, w = img.shape[:2]
                mx = np.clip(new_pts[:, 0].astype(np.int32), 0, w - 1)
                my = np.clip(new_pts[:, 1].astype(np.int32), 0, h - 1)
                new_pts = new_pts[self.fisheye_mask[my, mx] > 0]
            new_pts = new_pts[:need]
            k = len(new_pts)
            self.prev_pts = np.concatenate([self.prev_pts, new_pts])
            self.ids = np.concatenate(
                [self.ids, np.arange(self.next_id, self.next_id + k)]
            )
            self.track_len = np.concatenate([self.track_len, np.ones(k, np.int64)])
            prev_norm_old = np.concatenate(
                [prev_norm_old, np.full((k, 2), np.nan, np.float32)]
            )
            self.next_id += k

        norm = self._undistort(self.prev_pts)
        vel = np.zeros_like(norm)
        if dt > 0:
            with np.errstate(invalid="ignore"):
                v = (norm - prev_norm_old) / dt
            vel = np.where(np.isnan(v), 0.0, v)

        depths = np.zeros(len(self.prev_pts), np.float32)
        if depth is not None and len(self.prev_pts) > 0:
            depths = np.asarray(
                sample_depth(jnp.asarray(depth, jnp.float32), jnp.asarray(self.prev_pts))
            )
        elif img_right is not None and self.baseline > 0 and len(self.prev_pts) > 0:
            depths = self._stereo_depths(cur_pyr, img_right)

        feats = {
            int(fid): FrameFeature(
                x=float(norm[i, 0]), y=float(norm[i, 1]),
                vx=float(vel[i, 0]), vy=float(vel[i, 1]),
                depth=float(depths[i]),
            )
            for i, fid in enumerate(self.ids)
        }
        self.prev_pyr = cur_pyr
        self.prev_norm = norm
        self.prev_t = t
        self.predict_pts = {}
        return feats
