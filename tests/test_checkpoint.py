"""Checkpoint/resume wiring (VERDICT r3 missing #4): pose-graph save→load→
relocalize (pose_graph.cpp:1062-1267 save / load_previous_pose_graph),
estimator snapshot resume, and prior occupancy-grid load
(pose_graph_node.cpp:861-901)."""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from ground_fusion_tpu.config import Config
from ground_fusion_tpu.global_layers.pose_graph import Keyframe, PoseGraph
from ground_fusion_tpu.utils.checkpoint import load_pose_graph, save_pose_graph

from test_pose_graph_e2e import _place_texture


def _loop_cfg():
    cfg = Config()
    return dataclasses.replace(
        cfg, loop=dataclasses.replace(cfg.loop, min_loop_gap=5, min_matches=12))


def _textured_kf(pg, k, place, pose):
    """Keyframe with place-dependent imagery + physical landmarks (the
    test_pose_graph_e2e scenario in one call)."""
    from ground_fusion_tpu.geometry.so3 import quat_to_mat

    img = _place_texture(place)
    r2 = np.random.default_rng(500 + place)
    pc = np.stack([r2.uniform(-1, 1, 40), r2.uniform(-0.8, 0.8, 40),
                   r2.uniform(2, 5, 40)], -1)
    R_est = np.asarray(quat_to_mat(jnp.asarray(pose[3:7])))
    pts_w = pc @ R_est.T + pose[0:3]
    win_norm = pc[:, 0:2] / pc[:, 2:3]
    win_px = win_norm * 100 + np.array([80, 60])
    pts, ok, desc, win_desc = pg.describe(img, win_px)
    kp_norm = (np.asarray(pts) - np.array([80, 60])) / 100.0
    return Keyframe(
        index=k, t=float(k), pose=pose,
        kp=np.concatenate([np.asarray(pts), win_px]),
        kp_norm=np.concatenate([kp_norm, win_norm]),
        desc=np.concatenate([np.asarray(desc), win_desc]),
        kp_ok=np.concatenate([np.asarray(ok), np.ones(len(win_desc), bool)]),
        win_pts3d=pts_w, win_norm=win_norm, win_desc=win_desc,
        win_ok=np.ones(len(pts_w), bool),
    )


def test_pose_graph_save_load_relocalize(tmp_path):
    """A fresh process loading a saved graph must relocalize: a new keyframe
    revisiting a saved place forms a loop edge against a LOADED keyframe."""
    from ground_fusion_tpu.geometry.so3 import mat_to_quat, ypr_to_mat

    cfg = _loop_cfg()
    pg = PoseGraph(cfg)
    yaws = np.linspace(0, 2 * np.pi, 11)[:10]
    for k in range(10):
        pt = np.array([3 * np.cos(yaws[k]), 3 * np.sin(yaws[k]), 0.0])
        R = np.asarray(ypr_to_mat(jnp.asarray([yaws[k], 0.0, 0.0], jnp.float64)))
        pose = np.concatenate([pt, np.asarray(mat_to_quat(jnp.asarray(R)))])
        pg.add_keyframe(_textured_kf(pg, k, k, pose))
    path = str(tmp_path / "graph.npz")
    save_pose_graph(path, pg)

    # fresh session
    pg2 = PoseGraph(cfg)
    load_pose_graph(path, pg2)
    assert len(pg2.kfs) == 10
    assert pg2.db.count == 10
    np.testing.assert_allclose(pg2.kfs[3].pose, pg.kfs[3].pose)
    np.testing.assert_allclose(pg2.kfs[3].vio_pose, pg.kfs[3].vio_pose)

    # revisit place 0 with a slightly drifted pose — detection + PnP must
    # verify against the loaded keyframe 0
    from ground_fusion_tpu.geometry.so3 import mat_to_quat as m2q
    pt = np.array([3 * np.cos(yaws[0]) + 0.08, 3 * np.sin(yaws[0]) - 0.05, 0.0])
    R = np.asarray(ypr_to_mat(jnp.asarray([yaws[0] + 0.02, 0.0, 0.0], jnp.float64)))
    pose = np.concatenate([pt, np.asarray(m2q(jnp.asarray(R)))])
    n_edges = len(pg2.loop_edges)
    pg2.add_keyframe(_textured_kf(pg2, 10, 0, pose))
    assert len(pg2.loop_edges) > n_edges, "no relocalization against loaded graph"
    old_idx = pg2.loop_edges[-1][0]
    assert old_idx < 10, f"loop edge not against a loaded keyframe ({old_idx})"


def test_estimator_save_resume(tmp_path):
    """Mid-sequence snapshot → fresh estimator → continuation holds the same
    accuracy as an uninterrupted run (the 'reboot = resume' extension of
    SURVEY §5 checkpointing)."""
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_pipeline import run_pipeline
    from ground_fusion_tpu.pipeline import Estimator
    from ground_fusion_tpu.sim.synthetic import (
        SimParams, body_T_cam, gt_pose7, imu_sample, make_landmarks,
        project_landmarks, wheel_sample,
    )
    from ground_fusion_tpu.utils.evaluate import ate_rmse

    DT = jnp.float64
    cfg = Config()
    est, gt = run_pipeline(n_frames=22, cfg=cfg)
    assert est.solver_flag == est.NON_LINEAR
    path = str(tmp_path / "vio_state.npz")
    est.save_state(path)

    est2 = Estimator(cfg, dtype=DT)
    est2.load_state(path)
    assert est2.solver_flag == est2.NON_LINEAR
    np.testing.assert_allclose(np.asarray(est2.core.state.poses),
                               np.asarray(est.core.state.poses))
    assert est2.slot_of == est.slot_of and est2.ts == est.ts

    # continue the SAME simulated world from frame 22
    sp = SimParams(pix_noise=0.0, seed=0)
    ex = body_T_cam(DT)
    pts_w = jnp.asarray(make_landmarks(200, sp, seed=1), DT)
    frame_dt = 1.0 / sp.frame_rate
    imu_dt, wheel_dt = 1.0 / sp.imu_rate, 1.0 / sp.wheel_rate
    from ground_fusion_tpu.pipeline import FrameFeature

    for k in range(22, 34):
        t = k * frame_dt
        tp = t - frame_dt
        for ti in np.arange(tp + imu_dt, t + 0.5 * imu_dt, imu_dt):
            a, g = np.asarray(imu_sample(float(ti), sp), dtype=np.float64)
            est2.input_imu(float(ti), a, g)
        for ti in np.arange(tp + wheel_dt, t + 0.5 * wheel_dt, wheel_dt):
            v, wg = np.asarray(wheel_sample(float(ti), sp), dtype=np.float64)
            est2.input_wheel(float(ti), v, wg)
        uv, z, vis = project_landmarks(gt_pose7(t, sp), ex, pts_w)
        uv, z, vis = np.asarray(uv), np.asarray(z), np.asarray(vis)
        feats = {int(i): FrameFeature(x=float(uv[i, 0]), y=float(uv[i, 1]),
                                      depth=float(z[i]))
                 for i in np.nonzero(vis)[0]}
        est2.input_frame(t, feats)
        gt[t] = np.asarray(gt_pose7(t, sp))

    post = [(t, p) for t, p in est2.trajectory if t > 22 * frame_dt - 1e-9]
    assert len(post) >= 10, "resumed estimator produced no trajectory"
    est_xyz = np.stack([p[0:3] for _, p in post])
    gt_xyz = np.stack([gt[t][0:3] for t, _ in post])
    ate = ate_rmse(est_xyz, gt_xyz)
    assert ate < 0.05, f"post-resume ATE {ate:.4f} m"


def test_grid_pgm_roundtrip(tmp_path):
    from ground_fusion_tpu.global_layers.dense_map import OccupancyGrid2D

    g = OccupancyGrid2D(size_m=10.0, resolution=0.1)
    ang = np.linspace(0, 2 * np.pi, 60, endpoint=False)
    ends = 3.0 * np.stack([np.cos(ang), np.sin(ang)], -1)
    g.update(np.zeros(2), ends, np.ones(60, bool))
    p = str(tmp_path / "grid.pgm")
    g.save_pgm(p)
    g2 = OccupancyGrid2D.load_pgm(p, resolution=0.1)
    assert g2.n == g.n
    np.testing.assert_allclose(g2.probability(), g.probability(), atol=0.02)
    # the PGM metadata comment must recover a non-default resolution and
    # origin without the caller restating them (the pixel format alone
    # carries no world scale)
    g3 = OccupancyGrid2D.load_pgm(p)
    assert g3.res == g.res and g3.n == g.n
    np.testing.assert_allclose(g3.origin, g.origin)


def test_build_grid_script(tmp_path):
    """Offline grid builder: saved pose graph + map.ply → loadable PGM with
    occupied cells at the map points and free space along the beams."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                     os.pardir, "scripts"))
    import build_grid

    from ground_fusion_tpu.global_layers.dense_map import (
        OccupancyGrid2D, VoxelColorMap,
    )

    pg = PoseGraph(_loop_cfg())
    z8 = np.zeros((4, 8), np.uint32)
    z = np.zeros((4, 2))
    for k in range(3):
        pose = np.array([1.0 * k, 0.0, 0.0, 1.0, 0, 0, 0])
        pg.kfs.append(Keyframe(
            index=k, t=float(k), pose=pose, kp=z, kp_norm=z, desc=z8,
            kp_ok=np.zeros(4, bool), win_pts3d=np.zeros((4, 3)), win_norm=z,
            win_desc=z8, win_ok=np.zeros(4, bool), vio_pose=pose))
    run_dir = str(tmp_path)
    save_pose_graph(os.path.join(run_dir, "pose_graph.npz"), pg)

    vm = VoxelColorMap(voxel_size=0.05, capacity=1 << 14)
    wall = np.stack([np.full(40, 4.0), np.linspace(-1, 1, 40),
                     np.zeros(40)], -1)
    wall = np.repeat(wall, 4, axis=0) + np.random.default_rng(0).normal(
        0, 0.005, (160, 3))
    vm.insert(wall, np.full((160, 3), 128.0), np.ones(160, bool))
    vm.save_ply(os.path.join(run_dir, "map.ply"), min_count=1)

    out = os.path.join(run_dir, "grid.pgm")
    assert build_grid.build(run_dir, out, res=0.1, size_m=20.0) == 0
    g = OccupancyGrid2D.load_pgm(out, resolution=0.1)
    prob = g.probability()
    # occupied at the wall (x=4, y≈0 → cell [origin+4/res, origin+0])
    ci = int((4.0 - g.origin[0]) / g.res)
    cj = int((0.0 - g.origin[1]) / g.res)
    assert prob[cj, ci] > 0.6, "wall endpoint not occupied in the prior grid"
    # free along the beam path (x=3 on the way to the wall)
    ci_free = int((3.0 - g.origin[0]) / g.res)
    assert prob[cj, ci_free] < 0.4, "beam free space not carved"
