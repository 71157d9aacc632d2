"""Full-system detector E2E (VERDICT r4 #9): a moving dynamic object whose
KLT tracks carry a false fixed depth corrupts the replay without ``use_yolo``
and is rescued by the detector's box culling — the ``trackImagebox`` semantics
of ``feature_tracker.cpp:564-606`` measured at the ATE level, the scenario the
reference demos with a person walking through the frame (README.md anamoly
demo family)."""

import dataclasses
import os

import numpy as np
import pytest

H = W = 96
FX = FY = 110.0
CXY = 48.0
OBJ = 32           # checker object side (px) — at the top of the detector's
                   # training size range (detector/train.py render_scene)
OBJ_DEPTH = 1.2    # false fixed depth carried by object features (m) — near
                   # leverage maximum (small depth = large inverse-depth
                   # weight in the reprojection rows)


def _render(rng, uv_px, z, vis, obj_xy):
    """Per-frame randomized midtone texture (decorrelated across frames so
    the forward-backward check kills background tracks), landmark blobs with
    true depth, and a high-contrast checker object with a FALSE fixed depth —
    the training distribution of detector/train.py composited onto the
    simulator's geometry."""
    base = rng.normal(0, 1, (H // 8, W // 8, 3))
    img = np.kron(base, np.ones((8, 8, 1)))
    # low-contrast midtone texture: in the detector's training domain but
    # weak enough that blob/object corners outrank the (per-frame
    # decorrelated) background in the Shi-Tomasi refill ranking
    img = 128.0 + 15.0 * img / np.abs(img).max()
    depth = np.zeros((H, W), np.float32)
    ys, xs = np.mgrid[0:7, 0:7] - 3
    blob = 120.0 * np.exp(-(xs**2 + ys**2) / 4.0)
    for (u, v), d, ok in zip(uv_px, z, vis):
        if not ok:
            continue
        ui, vi = int(round(u)), int(round(v))
        if 4 <= ui < W - 4 and 4 <= vi < H - 4:
            img[vi - 3 : vi + 4, ui - 3 : ui + 4] += blob[..., None]
            depth[vi - 3 : vi + 4, ui - 3 : ui + 4] = d
    x0, y0 = int(round(obj_xy[0])), int(round(obj_xy[1]))
    yy, xx = np.mgrid[0:OBJ, 0:OBJ]
    checker = (((yy // 4) + (xx // 4)) % 2).astype(np.float32)
    img[y0 : y0 + OBJ, x0 : x0 + OBJ] = (
        (255.0 * checker)[..., None] * np.array([0.9, 0.85, 0.8]))
    depth[y0 : y0 + OBJ, x0 : x0 + OBJ] = OBJ_DEPTH
    return np.clip(img, 0, 255).astype(np.float32), depth


def _replay(tmp_path, use_yolo: bool, n_frames: int = 26):
    import jax.numpy as jnp

    from ground_fusion_tpu.config import Config
    from ground_fusion_tpu.sim.synthetic import (
        SimParams, body_T_cam, gt_pose7, imu_sample, make_landmarks,
        project_landmarks, wheel_sample,
    )
    from ground_fusion_tpu.system import GroundFusionSystem
    from ground_fusion_tpu.utils.evaluate import ate_rmse

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        use_yolo=use_yolo,
        camera=dataclasses.replace(cfg.camera, width=W, height=H,
                                   fx=FX, fy=FY, cx=CXY, cy=CXY),
        tracker=dataclasses.replace(cfg.tracker, max_features=48,
                                    min_dist_px=4.0, border=3,
                                    fb_thresh_px=1.0),
    )
    out = str(tmp_path / ("yolo" if use_yolo else "plain"))
    os.makedirs(out, exist_ok=True)
    sys_ = GroundFusionSystem(cfg, out)

    # instrument: count object-poisoned features actually entering the solve
    obj_counts = []
    orig_input = sys_.estimator.input_frame

    def counted_input(t, feats, **kw):
        # depth rides through float32 buffers — compare with f32 slack
        obj_counts.append(sum(1 for ff in feats.values()
                              if abs(ff.depth - OBJ_DEPTH) < 1e-4))
        return orig_input(t, feats, **kw)

    sys_.estimator.input_frame = counted_input

    dt64 = jnp.float64
    sp = SimParams()
    ex = body_T_cam(dt64)
    # the 96×96 image crops the nominal frustum hard (±48/110 normalized);
    # a dense cloud keeps ~30-40 blobs in frame
    pts_w = jnp.asarray(make_landmarks(1600, sp, seed=1), dt64)
    rng = np.random.default_rng(3)

    frame_dt = 1.0 / sp.frame_rate
    t0 = 0.0
    a, g = np.asarray(imu_sample(t0, sp), dtype=np.float64)
    sys_.input_imu(t0, a, g)
    v, wg = np.asarray(wheel_sample(t0, sp), dtype=np.float64)
    sys_.input_wheel(t0, v, wg)

    gt = []
    for k in range(n_frames):
        t = t0 + k * frame_dt
        if k > 0:
            tp = t - frame_dt
            for ti in np.arange(tp + 1 / sp.imu_rate, t + 0.5 / sp.imu_rate,
                                1 / sp.imu_rate):
                a, g = np.asarray(imu_sample(ti, sp), dtype=np.float64)
                sys_.input_imu(float(ti), a, g)
            for ti in np.arange(tp + 1 / sp.wheel_rate, t + 0.5 / sp.wheel_rate,
                                1 / sp.wheel_rate):
                v, wg = np.asarray(wheel_sample(ti, sp), dtype=np.float64)
                sys_.input_wheel(float(ti), v, wg)
        uv, z, vis = project_landmarks(gt_pose7(t, sp), ex, pts_w)
        uv_px = np.asarray(uv) * [FX, FY] + [CXY, CXY]
        # object drifts ~1.1 px/frame — slow enough to slip under the
        # reprojection outlier gate, fast enough to drag the solve
        obj_xy = (20.0 + 1.0 * k, 36.0 + 0.5 * k)
        img, depth = _render(rng, uv_px, np.asarray(z), np.asarray(vis), obj_xy)
        sys_.input_image(t, img, depth)
        gt.append((t, np.asarray(gt_pose7(t, sp))))
    gt = dict(gt)

    traj = sys_.estimator.trajectory
    assert len(traj) >= 8, f"replay produced only {len(traj)} poses"
    est_xyz = np.stack([p[0:3] for _, p in traj])
    gt_xyz = np.stack([gt[t][0:3] for t, _ in traj])
    return float(ate_rmse(est_xyz, gt_xyz)), obj_counts


@pytest.mark.slow
def test_use_yolo_rescues_moving_object_corruption(tmp_path):
    ate_off, cnt_off = _replay(tmp_path, use_yolo=False)
    ate_on, cnt_on = _replay(tmp_path, use_yolo=True)
    # the mechanism: object features reach the solve unculled, the detector
    # removes (nearly) all of them
    assert max(cnt_off) >= 5, f"object never tracked: {cnt_off}"
    assert sum(cnt_on) <= 0.2 * sum(cnt_off), (cnt_on, cnt_off)
    # with culling the replay must stay within the suite's noisy-VIO bound;
    # without it the false-depth object tracks must measurably corrupt it
    assert ate_on < 0.15, f"culled replay ATE {ate_on:.4f} m"
    assert ate_off > 1.5 * ate_on, (
        f"moving object did not corrupt the uncull run: off={ate_off:.4f} "
        f"on={ate_on:.4f}, obj feats off={cnt_off} on={cnt_on}")
