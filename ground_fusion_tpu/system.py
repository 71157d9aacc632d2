"""Full-system orchestration: tracker + estimator + loop closure + mapping.

The one-object equivalent of the reference's four ROS processes
(``vins_node`` + ``dense_map_node`` + ``global_fusion_node`` + ``darknet_ros``
— SURVEY §1 L0/L5): images go through the KLT front-end (with optional
dynamic-object culling), features into the sliding-window estimator, keyframes
into the BoW/pose-graph loop closure and the dense voxel map, odometry into
the GPS fusion layer. Everything is in-process — module-to-module calls
replace ROS pub/sub (SURVEY §2 parallelism table).

Run from a dataset directory::

    python -m ground_fusion_tpu <config.yaml> <sequence_dir> [out_dir]
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .cameras.models import make_camera
from .config import Config
from .pipeline import Estimator
from .utils.outputs import CalibrationDump, DeadReckoningPaths
from .utils.profiling import StageStats


class GroundFusionSystem:
    def __init__(self, cfg: Config, out_dir: str = "output"):
        self.cfg = cfg
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.estimator = Estimator(cfg)

        # model dispatch by cfg.camera.model (CameraFactory.cc:32-93)
        cam = make_camera(cfg.camera.model, cfg.camera.fx, cfg.camera.fy,
                          cfg.camera.cx, cfg.camera.cy, cfg.camera.distortion)
        from .frontend.tracker import FeatureTracker

        self.tracker = FeatureTracker(
            cam, max_cnt=cfg.tracker.max_features,
            min_dist=int(cfg.tracker.min_dist_px),
            levels=cfg.tracker.pyramid_levels, half=cfg.tracker.patch_half,
            iters=cfg.tracker.lk_iters,
        )
        self.tracker.baseline = cfg.camera.baseline
        if cfg.tracker.fisheye_mask_path:
            from .io.dataset import load_mask

            self.tracker.set_fisheye_mask(load_mask(cfg.tracker.fisheye_mask_path))
        self.cam = cam

        self.line_tracker = None
        if cfg.use_line:
            from .frontend.lines import LineTracker

            self.line_tracker = LineTracker(
                cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy,
                max_lines=cfg.lines.max_lines,
                min_len_px=cfg.lines.min_seg_len_px,
            )

        self.detector_params = None
        if cfg.use_yolo:
            from .detector.model import init_params, load_npz

            # per-run override, then the shipped trained artifact (the
            # reference loads pretrained darknet weights the same way,
            # YoloObjectDetector.cpp + yolo_network_config/)
            run_w = os.path.join(out_dir, "detector.npz")
            shipped = os.path.join(os.path.dirname(__file__), "detector",
                                   "weights.npz")
            if os.path.exists(run_w):
                self.detector_params = load_npz(run_w)
            elif os.path.exists(shipped):
                self.detector_params = load_npz(shipped)
            else:
                import warnings

                import jax

                warnings.warn("use_yolo set but no detector weights found; "
                              "random init will cull features with noise — "
                              "run scripts/train_detector.py")
                self.detector_params = init_params(jax.random.PRNGKey(0))

        self.pose_graph = None
        if cfg.loop.enabled:
            from .global_layers.pose_graph import PoseGraph

            self.pose_graph = PoseGraph(cfg, cam_focal=cfg.camera.fx)
            self._kf_index = 0
            # per-keyframe CAMERA-frame clouds for post-loop re-anchoring
            # (the reference keeps point_rgbd on each KeyFrame and rebuilds
            # the octree from them in updatePath, pose_graph.cpp:875-930)
            self._kf_clouds: dict[int, tuple] = {}
            self._kf_rgbd: dict[int, tuple] = {}

        self.voxel_map = None
        self.tsdf = None
        self.prior_grid = None
        if cfg.map.enabled:
            from .global_layers.dense_map import VoxelColorMap

            self.voxel_map = VoxelColorMap(voxel_size=cfg.map.voxel_size)
            if cfg.map.mesh:
                from .global_layers.meshing import TsdfVolume

                self.tsdf = TsdfVolume(
                    origin=cfg.map.mesh_origin, size_m=cfg.map.mesh_size_m,
                    resolution=cfg.map.mesh_resolution,
                    depth_max=cfg.tracker.depth_max,
                )

        self.global_fusion = None
        self.stats = StageStats()
        self.calib_dump = CalibrationDump(out_dir)
        self.dead_reckoning = DeadReckoningPaths()
        # live telemetry registry (VERDICT r4 #10): the in-process analog of
        # the reference's ~30 live topics (visualization.cpp:53-81). Topics:
        # imu_propagate (IMU-rate predicted odometry, pubLatestOdometry),
        # odometry (per solved frame, pubOdometry), keyframe (pubKeyframe),
        # loop_closure (new verified loop edge), path_update (post-relaxation
        # drift broadcast), map_delta (newly inserted keyframe cloud).
        # Publishing is zero-cost with no subscribers.
        self._subs: dict[str, list] = {}

        # burst replay (cfg.burst_chunk): the estimator solves K staged
        # frames per device dispatch; post-solve hooks (loop keyframes,
        # mapping, GPS fusion) drain from the trajectory at each flush
        self._burst = False
        if cfg.burst_chunk:
            self.estimator.enable_burst(cfg.burst_chunk)
            self._burst = True
            self._burst_frames: dict[float, tuple] = {}  # t -> (img, depth)
            self._consumed = 0

    # ------------------------------------------------------------- telemetry

    def subscribe(self, topic: str, fn) -> None:
        """Register a live-telemetry callback ``fn(**payload)`` — the
        embeddable analog of subscribing to the reference's ROS topics
        (``registerPub``, visualization.cpp:53-81). See ``self._subs`` doc
        for the topic set; payloads are plain NumPy/py values."""
        self._subs.setdefault(topic, []).append(fn)

    def _publish(self, topic: str, **payload) -> None:
        for fn in self._subs.get(topic, ()):
            fn(**payload)

    # --------------------------------------------------------------- sensors

    def input_imu(self, t, acc, gyr):
        self.estimator.input_imu(t, acc, gyr)
        # pure-IMU dead-reckoning diagnostic at sensor rate
        # (fastPredictPureIMU → pure_imu_propagate, estimator.cpp:4032-4076);
        # biases refresh once per solved frame (_refresh_dr_bias)
        self.dead_reckoning.push_imu(
            t, acc, gyr, ba=getattr(self, "_dr_ba", None),
            bg=getattr(self, "_dr_bg", None), g_norm=self.cfg.imu.g_norm)
        if "imu_propagate" in self._subs:
            # IMU-rate predicted odometry (pubLatestOdometry,
            # estimator.cpp:324-352) from the host-side fastPredict state
            od = self.estimator.latest_odometry()
            if od is not None:
                self._publish("imu_propagate", t=od[0], pose=od[1], vel=od[2])

    def input_wheel(self, t, vel, gyr):
        self.estimator.input_wheel(t, vel, gyr)
        self.dead_reckoning.push_wheel(
            t, vel, gyr,
            scales=getattr(self, "_dr_sw",
                           (self.cfg.wheel.sx, self.cfg.wheel.sy,
                            self.cfg.wheel.sw)))

    def _refresh_dr_bias(self):
        """Latest solved biases + wheel intrinsics for the dead-reckoning
        paths (one batched device readback per solved frame, not per
        sample)."""
        est = self.estimator
        sb = getattr(est, "_last_sb", None)
        if sb is None:
            sb = np.asarray(est.core.state.sbs[est.f - 1])
        self._dr_ba, self._dr_bg = sb[3:6], sb[6:9]
        s = np.asarray(est.core.state.s_wheel)
        self._dr_sw = (float(s[0]), float(s[1]), float(s[2]))

    def input_gnss(self, t, obs):
        self.estimator.input_gnss(t, obs)

    def input_gps_fix(self, t, lat, lon, alt, acc):
        """NavSatFix path → global fusion layer (globalOptNode.cpp)."""
        if self.global_fusion is None:
            from .global_layers.global_fusion import GlobalFusion

            self.global_fusion = GlobalFusion()
        self.global_fusion.input_gps(t, lat, lon, alt, acc)

    def input_image(self, t, img: np.ndarray, depth: Optional[np.ndarray] = None,
                    img_right: Optional[np.ndarray] = None
                    ) -> Optional[np.ndarray]:
        """One synchronized camera frame end-to-end. ``img_right``: rectified
        stereo pair image (used when ``camera.baseline`` > 0 and no RGBD
        depth is supplied)."""
        if not self._burst:
            # prediction seeding reads the freshly optimized core — a live-
            # mode optimization; mid-chunk the core is stale in burst mode
            self._seed_tracker_predictions()
        # KLT/lines consume luminance; the detector consumes 3 channels
        # (the reference's img_callback hands BGR8 to darknet and MONO8 to
        # the tracker, rosNodeTest.cpp / YoloObjectDetector.cpp)
        img = np.asarray(img)
        img_gray = img.mean(axis=-1) if img.ndim == 3 else img
        with self.stats.time("track"):
            feats = self.tracker.track(t, img_gray, depth, img_right=img_right)

        if self.detector_params is not None and len(self.tracker.prev_pts):
            from .detector.model import cull_features_in_boxes, detect
            import jax.numpy as jnp

            img_rgb = img if img.ndim == 3 else np.repeat(img[..., None], 3, -1)
            boxes, scores, classes, valid = detect(self.detector_params,
                                                   jnp.asarray(img_rgb, jnp.float32))
            keep = np.asarray(cull_features_in_boxes(
                jnp.asarray(self.tracker.prev_pts), boxes, classes, valid))
            feats = {fid: f for (fid, f), k in zip(feats.items(), keep) if k}

        line_obs = None
        if self.line_tracker is not None:
            with self.stats.time("lines"):
                line_obs = self.line_tracker.track(img_gray)

        with self.stats.time("solve"):
            pose = self.estimator.input_frame(t, feats, line_obs=line_obs)

        if self._burst:
            if self.pose_graph is not None or self.voxel_map is not None:
                self._burst_frames[float(t)] = (img, depth)
                # bound the backlog to one chunk + slack
                while len(self._burst_frames) > self.cfg.burst_chunk + 2:
                    self._burst_frames.pop(next(iter(self._burst_frames)))
            if pose is not None:
                self._drain_burst_hooks()
            return pose

        if pose is not None:
            self.calib_dump.append(t, self.estimator.core.state)
            self._refresh_dr_bias()
            if self.global_fusion is not None:
                self.global_fusion.input_odom(t, pose)
            is_kf = bool(self.estimator.keyframe_flags
                         and self.estimator.keyframe_flags[-1])
            self._publish("odometry", t=t, pose=np.asarray(pose),
                          is_keyframe=is_kf)
            if is_kf:
                self._publish("keyframe", t=t, pose=np.asarray(pose))
            self._loop_and_map(t, img, depth, pose, is_kf)
        return pose

    def _loop_and_map(self, t, img, depth, pose, is_keyframe):
        """Loop-closure registration + dense-map insertion for one solved
        frame. With the pose graph active, clouds are inserted at the
        DRIFT-CORRECTED keyframe pose and registered for re-anchoring after
        each graph relaxation — the reference inserts at ``updatePose``'s
        corrected pose and rebuilds the octree in ``updatePath``
        (pose_graph.cpp:170-244, 875-930). Without a pose graph there is no
        drift estimate and every frame maps at its VIO pose."""
        corrected = None
        if self.pose_graph is not None and is_keyframe:
            corrected = self._add_loop_keyframe(t, img, pose)
        if self.voxel_map is None or depth is None:
            return
        if self.pose_graph is not None:
            # reference parity: only pose-graph keyframes carry dense clouds
            if not is_keyframe:
                return
            if corrected is not None:
                self._map_keyframe(corrected, img, depth,
                                   register=len(self.pose_graph.kfs) - 1)
            else:
                # keyframe payload too thin for the graph — still map it at
                # the current drift-corrected pose (un-re-anchorable)
                self._map_keyframe(self._drift_corrected(pose), img, depth)
        else:
            self._map_keyframe(pose, img, depth)

    def _drift_corrected(self, pose):
        pg = self.pose_graph
        from .utils.np_quat import quat_mul, quat_normalize

        p = np.asarray(pose, float).copy()
        p[0:3] = pg.r_drift @ p[0:3] + pg.t_drift
        from .geometry.so3 import mat_to_quat
        import jax.numpy as jnp

        q_d = np.asarray(mat_to_quat(jnp.asarray(pg.r_drift)))
        p[3:7] = quat_normalize(quat_mul(q_d, p[3:7]))
        return p

    def _drain_burst_hooks(self):
        """Run the post-solve hooks for every trajectory entry the last burst
        flush produced. Keyframe payloads (window landmark clouds) come from
        the post-chunk core — the same data, read once per flush instead of
        once per frame."""
        est = self.estimator
        if self._consumed < len(est.trajectory):
            self._refresh_dr_bias()
        while self._consumed < len(est.trajectory):
            t_k, pose_k = est.trajectory[self._consumed]
            kf = est.keyframe_flags[self._consumed]
            self._consumed += 1
            self.calib_dump.append(t_k, est.core.state)
            if self.global_fusion is not None:
                self.global_fusion.input_odom(t_k, pose_k)
            self._publish("odometry", t=t_k, pose=np.asarray(pose_k),
                          is_keyframe=bool(kf))
            if kf:
                self._publish("keyframe", t=t_k, pose=np.asarray(pose_k))
            frame = self._burst_frames.get(float(t_k))
            if frame is not None:
                img_k, depth_k = frame
                self._loop_and_map(t_k, img_k, depth_k, pose_k, kf)

    def _seed_tracker_predictions(self):
        """Project solved landmarks through the IMU-rate propagated pose into
        pixel predictions for the next LK solve (the reference's
        ``predictPtsInNextFrame`` → ``FeatureTracker::setPrediction`` chain,
        feature_tracker.cpp:118-133) — prediction-seeded flow survives fast
        motion where the previous-position seed diverges."""
        est = self.estimator
        od = est.latest_odometry()
        if od is None or not est.slot_of:
            return
        import jax
        import jax.numpy as jnp

        from .utils.np_quat import quat_mul, quat_normalize, quat_to_mat

        _, pose7, _ = od
        tr = est.core.tracks
        # ONE batched device→host fetch per frame, then pure-numpy geometry
        # (sequential eager jnp ops each pay a tunnel round trip)
        ok, sf, obs, inv_d, poses, ex_cam = (np.array(a) for a in jax.device_get(
            (tr.active & tr.solve_ok, tr.start_frame, tr.obs, tr.inv_depth,
             est.core.state.poses, est.core.state.ex_cam)))
        if not ok.any():
            return
        depth = 1.0 / np.maximum(inv_d, 1e-6)
        # per-frame camera poses: T_i ∘ ex_cam (host quaternions)
        t_ex, q_ex = ex_cam[0:3], ex_cam[3:7]
        cam_R = np.zeros((len(poses), 3, 3))
        cam_t = np.zeros((len(poses), 3))
        for i in range(len(poses)):
            Ri = quat_to_mat(poses[i, 3:7])
            cam_t[i] = poses[i, 0:3] + Ri @ t_ex
            cam_R[i] = quat_to_mat(quat_normalize(quat_mul(poses[i, 3:7], q_ex)))
        rays = np.concatenate(
            [obs[np.arange(len(sf)), sf, 0:2], np.ones((len(sf), 1))], axis=1)
        pts_c = rays * depth[:, None]
        pts_w = np.einsum("nij,nj->ni", cam_R[sf], pts_c) + cam_t[sf]
        R_pred = quat_to_mat(np.asarray(pose7[3:7], float))
        Rc = R_pred @ quat_to_mat(q_ex)
        tc = np.asarray(pose7[0:3], float) + R_pred @ t_ex
        pc = (pts_w - tc) @ Rc
        vis = ok & (pc[:, 2] > 0.1)
        if not vis.any():
            return
        px = np.asarray(self.cam.space_to_plane(jnp.asarray(pc, jnp.float32)))
        slot_to_id = {s: fid for fid, s in est.slot_of.items()}
        preds = {}
        for s in np.nonzero(vis)[0]:
            fid = slot_to_id.get(int(s))
            if fid is not None:
                preds[fid] = (float(px[s, 0]), float(px[s, 1]))
        self.tracker.set_prediction(preds)

    # ------------------------------------------------------------ keyframes

    def _add_loop_keyframe(self, t, img, pose):
        from .global_layers.pose_graph import Keyframe

        est = self.estimator
        tr = est.core.tracks
        active = np.asarray(tr.active) & np.asarray(tr.solve_ok)
        sf = np.asarray(tr.start_frame)
        inv_d = np.asarray(tr.inv_depth)
        obs = np.asarray(tr.obs)
        # window landmarks in world (from anchor obs + depth)
        import jax.numpy as jnp

        from .geometry.se3 import pose_apply, pose_compose

        cams = pose_compose(est.core.state.poses, est.core.state.ex_cam[None, :])
        pts3d, norm2d, ok = [], [], []
        newest = est.f - 1
        ov = np.asarray(tr.obs_valid)
        for l in np.nonzero(active & ov[:, newest])[0]:
            ray = np.array([obs[l, sf[l], 0], obs[l, sf[l], 1], 1.0])
            p_w = np.asarray(pose_apply(cams[sf[l]], jnp.asarray(ray / max(inv_d[l], 1e-6))))
            pts3d.append(p_w)
            norm2d.append(obs[l, newest, 0:2])
            ok.append(True)
        if len(pts3d) < 8:
            return
        pts3d = np.stack(pts3d)
        norm2d = np.stack(norm2d)
        # normalized-plane ↔ pixel through the dispatched camera model
        # (keyframe.cpp uses the camodocal camera for both directions)
        rays = np.concatenate([norm2d, np.ones((len(norm2d), 1))], -1)
        win_px = np.asarray(self.cam.space_to_plane(jnp.asarray(rays, jnp.float32)))

        pts, okf, desc, win_desc = self.pose_graph.describe(img, win_px)
        kp_rays = np.asarray(self.cam.lift_projective(jnp.asarray(pts, jnp.float32)))
        kp_norm = kp_rays[:, 0:2] / np.maximum(np.abs(kp_rays[:, 2:3]), 1e-9)
        kf = Keyframe(
            index=self._kf_index, t=t, pose=np.asarray(pose),
            kp=np.concatenate([pts, win_px]),
            kp_norm=np.concatenate([kp_norm, norm2d]),
            desc=np.concatenate([desc, win_desc]),
            kp_ok=np.concatenate([np.asarray(okf), np.ones(len(win_desc), bool)]),
            win_pts3d=pts3d, win_norm=norm2d, win_desc=win_desc,
            win_ok=np.ones(len(pts3d), bool),
        )
        with self.stats.time("loop"):
            self.pose_graph.add_keyframe(kf)
            if len(self.pose_graph.loop_edges) > getattr(self, "_opt_edges", 0):
                # a new verified loop edge (findConnection success)
                self._publish("loop_closure",
                              edge=self.pose_graph.loop_edges[-1],
                              n_keyframes=len(self.pose_graph.kfs))
                self.pose_graph.optimize()
                self._opt_edges = len(self.pose_graph.loop_edges)
                self._rebuild_map()
                # post-relaxation drift broadcast (updatePath's corrected
                # path, pose_graph.cpp:674-696)
                self._publish("path_update",
                              r_drift=np.asarray(self.pose_graph.r_drift),
                              t_drift=np.asarray(self.pose_graph.t_drift))
        self._kf_index += 1
        # the drift-corrected pose the graph stored (updatePose) — dense
        # clouds must be inserted at THIS pose, not the raw VIO one
        return self.pose_graph.kfs[-1].pose

    def _map_keyframe(self, pose, img, depth, register: Optional[int] = None):
        """Insert one RGBD frame into the voxel map at ``pose`` (already
        drift-corrected when the pose graph is active). Applies the world-z
        insertion gate (pose_graph.cpp:201-202). ``register`` ties the
        camera-frame cloud to pose-graph keyframe ``kfs[register]`` so
        :meth:`_rebuild_map` can re-anchor it after loop relaxations."""
        import jax.numpy as jnp

        from .geometry.se3 import pose_apply, pose_compose
        from .global_layers.dense_map import sample_rgbd

        color = np.stack([img] * 3, -1) if img.ndim == 2 else img
        gx, gy, d, rgb, ok = sample_rgbd(
            jnp.asarray(depth, jnp.float32), jnp.asarray(color, jnp.float32),
            stride=self.cfg.map.depth_stride, boundary=self.cfg.map.depth_boundary,
        )
        uv = jnp.stack([gx, gy], -1).astype(jnp.float32)
        rays = self.cam.lift_projective(uv)
        rays = rays / jnp.maximum(jnp.abs(rays[:, 2:3]), 1e-9)  # z=1 for depth scaling
        pts_cam = rays * d[:, None]

        cam_pose = pose_compose(jnp.asarray(pose, jnp.float32),
                                self.estimator.core.state.ex_cam)
        pts_w = pose_apply(cam_pose, pts_cam)
        # z-range insertion gate (pointWorld.z() > 2 || < -0.5 skip) — the
        # gate depends on the WORLD pose, so only the pre-gate validity mask
        # is stored per keyframe and the gate is re-evaluated at rebuild time
        ok_z = ok & (pts_w[:, 2] <= self.cfg.map.z_max) \
                  & (pts_w[:, 2] >= self.cfg.map.z_min)
        if "map_delta" in self._subs:
            m = np.asarray(ok_z)
            self._publish("map_delta", t=None,
                          points=np.asarray(pts_w)[m],
                          colors=np.asarray(rgb)[m])
        with self.stats.time("map"):
            self.voxel_map.insert(pts_w, rgb, ok_z)
            if register is not None:
                # fixed-shape cloud + pre-z-gate mask (the reference resizes
                # point_rgbd to the inserted points, pose_graph.cpp:219-222;
                # masking keeps every stored cloud the same static shape so
                # the rebuild re-insertions hit one compiled program)
                self._kf_clouds[register] = (
                    np.asarray(pts_cam), np.asarray(rgb), np.asarray(ok))
                if self.tsdf is not None:
                    # compact per-KF RGBD copy so the TSDF can be re-rastered
                    # at the relaxed poses after a loop closure
                    self._kf_rgbd[register] = (
                        np.asarray(depth, np.float16),
                        np.asarray(color, np.uint8))
            if self.tsdf is not None:
                # the TSDF raster assumes a pinhole-style intrinsic grid (as
                # does the reference's RGBD mapping node)
                p = self.cam.params
                self.tsdf.integrate(
                    np.asarray(depth, np.float32), np.asarray(color, np.float32),
                    np.asarray(cam_pose), float(p.fx), float(p.fy),
                    float(p.cx), float(p.cy),
                )

    def _rebuild_map(self):
        """Re-anchor the dense map after a pose-graph relaxation: clear the
        voxel accumulator and re-insert every registered keyframe cloud at
        its (now loop-corrected) graph pose — ``updatePath``'s octree rebuild
        (pose_graph.cpp:875-930). Without this, the map and the loop
        trajectory disagree after the first closure (VERDICT r3 missing #2).
        """
        if self.voxel_map is None or not self._kf_clouds:
            return
        import jax.numpy as jnp

        from .geometry.se3 import pose_apply, pose_compose

        with self.stats.time("map"):
            self.voxel_map.clear()
            if self.tsdf is not None:
                self.tsdf.clear()
            p = self.cam.params
            for kf_pos, (pts_cam, rgb, ok) in self._kf_clouds.items():
                pose = self.pose_graph.kfs[kf_pos].pose
                cam_pose = pose_compose(jnp.asarray(pose, jnp.float32),
                                        self.estimator.core.state.ex_cam)
                pts_w = pose_apply(cam_pose, jnp.asarray(pts_cam))
                # re-evaluate the world-z insertion gate at the relaxed pose
                ok_z = jnp.asarray(ok) & (pts_w[:, 2] <= self.cfg.map.z_max) \
                                       & (pts_w[:, 2] >= self.cfg.map.z_min)
                self.voxel_map.insert(pts_w, jnp.asarray(rgb), ok_z)
                if self.tsdf is not None and kf_pos in self._kf_rgbd:
                    depth, color = self._kf_rgbd[kf_pos]
                    self.tsdf.integrate(
                        depth.astype(np.float32), color.astype(np.float32),
                        np.asarray(cam_pose), float(p.fx), float(p.fy),
                        float(p.cx), float(p.cy),
                    )

    # --------------------------------------------------------- checkpointing

    def save_checkpoint(self, dir_: Optional[str] = None) -> None:
        """Write the estimator snapshot + pose graph (the 's'-key save of
        pose_graph.cpp:1062-1126, plus the VIO window state the reference
        cannot persist). Files: ``vio_state.npz``, ``pose_graph.npz``."""
        from .utils.checkpoint import save_pose_graph

        d = dir_ or self.out_dir
        os.makedirs(d, exist_ok=True)
        if self._burst:
            self.estimator.flush_burst()
        self.estimator.save_state(os.path.join(d, "vio_state.npz"))
        if self.pose_graph is not None:
            save_pose_graph(os.path.join(d, "pose_graph.npz"), self.pose_graph)

    def load_checkpoint(self, graph_path: Optional[str] = None,
                        state_path: Optional[str] = None,
                        grid_path: Optional[str] = None) -> None:
        """Resume from saved artifacts: a prior pose graph (relocalization
        against loaded keyframes — ``load_previous_pose_graph``,
        pose_graph.cpp:1127-1267), a VIO state snapshot, and/or a prior
        occupancy grid (pose_graph_node.cpp:861-901)."""
        if graph_path is not None:
            from .utils.checkpoint import load_pose_graph

            if self.pose_graph is None:
                raise ValueError("loop closure disabled: enable cfg.loop "
                                 "to load a prior pose graph")
            load_pose_graph(graph_path, self.pose_graph)
            self._kf_index = (max((k.index for k in self.pose_graph.kfs),
                                  default=-1) + 1)
        if state_path is not None:
            self.estimator.load_state(state_path)
        if grid_path is not None:
            from .global_layers.dense_map import OccupancyGrid2D

            self.prior_grid = OccupancyGrid2D.load_pgm(grid_path)

    # --------------------------------------------------------------- output

    def finish(self, save_state: bool = False):
        est = self.estimator
        if self._burst:
            est.flush_burst()
            self._drain_burst_hooks()
        if save_state:
            self.save_checkpoint()
        est.write_tum(os.path.join(self.out_dir, "vio.txt"))
        if self.pose_graph is not None:
            self.pose_graph.write_tum(os.path.join(self.out_dir, "loop.txt"))
        if self.global_fusion is not None:
            self.global_fusion.write_tum(os.path.join(self.out_dir, "global.txt"))
        if self.voxel_map is not None:
            if self.cfg.map.outlier_min_neighbors > 0:
                # offline cloud conditioning before export — the PCL
                # RadiusOutlierRemoval stage of the reference's mesh command
                # (pose_graph_node.cpp:133-318)
                from .global_layers.meshing import radius_outlier_filter

                pts, cols = self.voxel_map.export(self.cfg.map.density_gate)
                keep = radius_outlier_filter(
                    pts, radius=2.0 * self.cfg.map.voxel_size,
                    min_neighbors=self.cfg.map.outlier_min_neighbors)
                from .global_layers.dense_map import write_cloud_ply

                write_cloud_ply(os.path.join(self.out_dir, "map.ply"),
                                pts[keep], cols[keep])
            else:
                self.voxel_map.save_ply(os.path.join(self.out_dir, "map.ply"))
        if self.tsdf is not None:
            self.tsdf.save_mesh_ply(os.path.join(self.out_dir, "mesh.ply"),
                                    smooth_radius=self.cfg.map.mls_radius_m)
        if self.prior_grid is not None:
            # republish the loaded prior occupancy map into this run's output
            # set (the latched prior-map republish, pose_graph_node.cpp:861-901)
            self.prior_grid.save_pgm(os.path.join(self.out_dir, "prior_grid.pgm"))
        self.dead_reckoning.write_tum(
            os.path.join(self.out_dir, "pure_imu.txt"),
            os.path.join(self.out_dir, "pure_wheel.txt"),
        )
        with open(os.path.join(self.out_dir, "timing.txt"), "w") as fp:
            fp.write(self.stats.report() + "\n")
        return os.path.join(self.out_dir, "vio.txt")
