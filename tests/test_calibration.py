"""Intrinsic calibration: Zhang init + GN refine recovers ground truth, and
the x-corner detector finds a rendered chessboard grid."""

import jax.numpy as jnp
import numpy as np

from ground_fusion_tpu.cameras.calibration import (
    calibrate_pinhole,
    detect_corners,
    order_grid,
)
from ground_fusion_tpu.cameras.models import PinholeParams, pinhole_space_to_plane
from ground_fusion_tpu.geometry.so3 import quat_exp, quat_rotate


def _board(rows=6, cols=8, square=0.04):
    xs, ys = np.meshgrid(np.arange(cols), np.arange(rows))
    return np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(float) * square


def test_calibrate_recovers_intrinsics():
    gt = PinholeParams.make(455.0, 458.0, 322.0, 243.0, -0.28, 0.07, 0.0002, -0.0001)
    world = _board()
    pts_w = np.concatenate([world, np.zeros((len(world), 1))], 1)

    rng = np.random.default_rng(11)
    img_pts = []
    for _ in range(8):
        phi = rng.normal(0, 0.25, 3)
        q = np.asarray(quat_exp(jnp.asarray(phi)))
        t = np.array([-0.16, -0.12, 0.6]) + rng.normal(0, 0.05, 3)
        pc = np.asarray(quat_rotate(jnp.asarray(q), jnp.asarray(pts_w))) + t
        uv = np.asarray(pinhole_space_to_plane(gt, jnp.asarray(pc)))
        uv = uv + rng.normal(0, 0.1, uv.shape)     # 0.1 px corner noise
        img_pts.append(uv)

    res = calibrate_pinhole(world, img_pts, iters=25)
    assert res.rms_px < 0.3, res.rms_px
    assert abs(float(res.params.fx) - 455.0) < 2.0
    assert abs(float(res.params.fy) - 458.0) < 2.0
    assert abs(float(res.params.cx) - 322.0) < 2.0
    assert abs(float(res.params.cy) - 243.0) < 2.0
    assert abs(float(res.params.k1) - (-0.28)) < 0.02


def test_chessboard_detector_finds_grid():
    rows, cols = 4, 5
    sq = 40
    h, w = (rows + 1) * sq + 80, (cols + 1) * sq + 80
    img = np.full((h, w), 200.0)
    for r in range(rows + 1):
        for c in range(cols + 1):
            if (r + c) % 2 == 0:
                y0, x0 = 40 + r * sq, 40 + c * sq
                img[y0:y0 + sq, x0:x0 + sq] = 30.0

    pts, score = detect_corners(jnp.asarray(img), max_corners=rows * cols, nms=8)
    pts = np.asarray(pts)
    # inner corners are at 40 + sq*(1..rows) etc.
    gt = np.array([[40 + sq * (c + 1), 40 + sq * (r + 1)]
                   for r in range(rows) for c in range(cols)], float)
    # every ground-truth corner has a detection within 2 px
    d = np.linalg.norm(gt[:, None, :] - pts[None, :, :], axis=-1)
    assert np.all(d.min(axis=1) < 2.0)

    grid = order_grid(pts, rows, cols)
    assert grid is not None and grid.shape == (rows * cols, 2)
    # row-major ordering: consecutive in-row x strictly changes monotonically
    g = grid.reshape(rows, cols, 2)
    dx = np.diff(g[..., 0], axis=1)
    assert np.all(dx > 0) or np.all(dx < 0)
