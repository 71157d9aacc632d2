"""Line-feature tests: orth↔plücker round-trip, projection residual at GT,
two-view triangulation, segment detection + matching on synthetic imagery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ground_fusion_tpu.frontend.lines import (
    detect_segments,
    lbd_describe,
    line_factor,
    line_residual_raw,
    match_lines,
    orth_to_plk,
    plk_to_orth,
    plk_transform,
    triangulate_line,
)
from ground_fusion_tpu.geometry.se3 import pose as make_pose, pose_compose
from ground_fusion_tpu.geometry.so3 import mat_to_quat, ypr_to_mat

DT = jnp.float64


def _line_through(p0, d):
    """World plücker of the line through p0 with direction d (unit)."""
    d = d / np.linalg.norm(d)
    n = np.cross(p0, d)
    return np.concatenate([n, d])


def test_orth_plk_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        plk = _line_through(rng.normal(0, 2, 3), rng.normal(0, 1, 3))
        orth = plk_to_orth(jnp.asarray(plk, DT))
        plk2 = np.asarray(orth_to_plk(orth))
        # plücker is homogeneous: compare up to scale
        s = np.linalg.norm(plk) / np.linalg.norm(plk2)
        assert np.allclose(plk2 * s, plk, atol=1e-9) or \
            np.allclose(-plk2 * s, plk, atol=1e-9)


def test_line_residual_zero_on_line():
    """Observed endpoints exactly on the projected line → zero residual."""
    p0 = np.array([1.0, 0.5, 4.0])
    d = np.array([0.6, -0.2, 0.1])
    plk = _line_through(p0, d)
    orth = plk_to_orth(jnp.asarray(plk, DT))

    R = np.asarray(ypr_to_mat(jnp.asarray([0.2, 0.05, -0.1], DT)))
    t = np.array([0.3, -0.1, 0.2])
    pose_i = np.concatenate([t, np.asarray(mat_to_quat(jnp.asarray(R)))])
    ex = np.concatenate([np.zeros(3), [1, 0, 0, 0]])

    # two points on the 3-D line, projected through the pose
    pts = [p0 + a * d / np.linalg.norm(d) for a in (0.0, 1.0)]
    obs = []
    for p in pts:
        pc = R.T @ (p - t)
        obs.extend([pc[0] / pc[2], pc[1] / pc[2]])
    r = line_residual_raw(jnp.asarray(pose_i, DT), jnp.asarray(ex, DT),
                          orth, jnp.asarray(obs, DT))
    assert float(jnp.max(jnp.abs(r))) < 1e-9

    r2, J = line_factor(jnp.asarray(pose_i, DT), jnp.asarray(ex, DT), orth,
                        jnp.asarray(obs, DT), jnp.asarray(460.0 / 1.5, DT))
    assert J.shape == (2, 16)
    # perturbing the line produces a nonzero residual
    r3 = line_residual_raw(jnp.asarray(pose_i, DT), jnp.asarray(ex, DT),
                           orth + jnp.asarray([0.01, 0, 0, 0]), jnp.asarray(obs, DT))
    assert float(jnp.max(jnp.abs(r3))) > 1e-6


def test_line_triangulation():
    p0 = np.array([0.5, -0.3, 5.0])
    d = np.array([1.0, 0.4, 0.0])
    plk_gt = _line_through(p0, d)

    cam_i = make_pose(jnp.zeros(3, DT), jnp.asarray([1.0, 0, 0, 0], DT))
    R = np.asarray(ypr_to_mat(jnp.asarray([0.15, 0.0, 0.0], DT)))
    cam_j = make_pose(jnp.asarray([1.0, 0.2, 0.0], DT),
                      mat_to_quat(jnp.asarray(R)))

    def obs_of(cam):
        Rm = np.asarray(ypr_to_mat(jnp.asarray([0.0, 0, 0], DT))) if cam is cam_i \
            else R
        t = np.asarray(cam[0:3])
        o = []
        for a in (0.0, 2.0):
            p = p0 + a * d / np.linalg.norm(d)
            pc = Rm.T @ (p - t)
            o.extend([pc[0] / pc[2], pc[1] / pc[2]])
        return jnp.asarray(o, DT)

    plk = np.asarray(triangulate_line(obs_of(cam_i), obs_of(cam_j), cam_i, cam_j))
    # compare up to scale and sign
    s = np.linalg.norm(plk_gt) / max(np.linalg.norm(plk), 1e-12)
    ok = np.allclose(plk * s, plk_gt, atol=1e-6) or \
        np.allclose(-plk * s, plk_gt, atol=1e-6)
    assert ok, f"{plk * s} vs {plk_gt}"


def test_detect_and_match_segments():
    img = np.full((128, 160), 10.0, np.float32)
    # two strong line edges: vertical at x=60, horizontal at y=40
    img[:, 60:] += 100.0
    img[40:, :] += 60.0
    segs, strength, ok = detect_segments(jnp.asarray(img), tile=16, max_lines=32)
    segs, ok = np.asarray(segs), np.asarray(ok)
    assert ok.sum() >= 6
    # at least one detected segment is near-vertical around x=60
    kept = segs[ok]
    ang = np.arctan2(kept[:, 3] - kept[:, 1], kept[:, 2] - kept[:, 0])
    vert = np.abs(np.abs(ang) - np.pi / 2) < 0.2
    near60 = np.abs(0.5 * (kept[:, 0] + kept[:, 2]) - 60) < 8
    assert np.any(vert & near60)

    desc = lbd_describe(jnp.asarray(img), jnp.asarray(segs))
    img2 = np.roll(img, 3, axis=1)
    segs2 = segs + np.array([3.0, 0, 3.0, 0], np.float32)
    desc2 = lbd_describe(jnp.asarray(img2), jnp.asarray(segs2))
    idx, matched = match_lines(desc, jnp.asarray(segs), jnp.asarray(ok),
                               desc2, jnp.asarray(segs2), jnp.asarray(ok),
                               max_midpoint_dist=12.0)
    idx, matched = np.asarray(idx), np.asarray(matched)
    good = (idx[ok] == np.arange(len(idx))[ok]) & matched[ok]
    assert good.mean() > 0.6


def test_line_tracker_id_persistence():
    """LineTracker (linefeature_tracker.cpp readImage role): a segment
    tracked across a small image shift keeps its id; output is id →
    normalized endpoints."""
    from ground_fusion_tpu.frontend.lines import LineTracker

    img = np.full((128, 160), 10.0, np.float32)
    img[:, 60:] += 100.0
    img[40:, :] += 60.0

    trk = LineTracker(fx=100.0, fy=100.0, cx=80.0, cy=64.0,
                      max_lines=32, min_len_px=8.0)
    obs1 = trk.track(img)
    assert len(obs1) >= 4
    for ob in obs1.values():
        assert ob.shape == (4,)
        assert np.all(np.abs(ob) < 2.0)  # normalized-plane magnitudes

    img2 = np.roll(img, 2, axis=1)
    obs2 = trk.track(img2)
    shared = set(obs1) & set(obs2)
    assert len(shared) >= max(2, len(obs1) // 3), (
        f"ids not persistent: {len(shared)} shared of {len(obs1)}")
    # the shared segments moved by ~2px/fx in normalized x
    for lid in shared:
        dx = obs2[lid][[0, 2]] - obs1[lid][[0, 2]]
        assert np.all(np.abs(dx - 2.0 / 100.0) < 0.05)
