"""Host-side estimator pipeline: sensor ingest, window fill, initialization
dispatch, keyframe decision, and the per-frame jitted window step.

This is the TPU-native replacement for the reference's driver loop + estimator
measurement pump (``rosNodeTest.cpp:290-565`` sync_process,
``estimator.cpp:526-711`` processMeasurements, ``:843-1163`` processImage):
the host owns only queues, slot allocation and mode switches; all math runs in
the single jitted :func:`~.estimator.step.make_window_step` program.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .estimator.assembly import empty_prior
from .estimator.buffers import (
    empty_imu_buffer,
    empty_wheel_buffer,
    preintegrate_imu_window,
    preintegrate_wheel_window,
)
from .estimator.initialization import (
    align_window_to_gravity,
    linear_alignment_wheel,
    solve_gyroscope_bias,
    stationary_bias_init,
)
from .estimator.lines import empty_line_tracks, slide_old_lines
from .estimator.step import EstimatorCore, StepFlags, make_window_step
from .estimator.window import empty_state, empty_tracks
from .gnss.factors import GnssObsWindow, empty_gnss_obs
from .gnss.ingest import GnssIngest
from .geometry.se3 import pose as make_pose, pose_compose, pose_inverse
from .geometry.so3 import mat_to_quat, quat_mul, quat_normalize, quat_rotate, quat_to_mat
from .preintegration.imu import noise_cov
from .preintegration.wheel import wheel_noise_cov


@dataclass
class FrameFeature:
    """One feature observation handed in by the front-end (the per-id entry of
    ``trackImage``'s output map, feature_tracker.h:47-48)."""

    x: float
    y: float
    vx: float = 0.0
    vy: float = 0.0
    depth: float = 0.0


class Estimator:
    """Sliding-window RGBD/VIO/wheel estimator (host orchestration)."""

    INITIAL = 0
    NON_LINEAR = 1

    def __init__(self, cfg: Config, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        self.step_fn, self.layout = make_window_step(cfg)
        f = cfg.num_frames
        ml = cfg.solver.max_landmarks
        self.f = f
        self.core = EstimatorCore(
            state=self._initial_state(),
            tracks=empty_tracks(ml, f, dtype),
            imu_buf=empty_imu_buffer(f, cfg.solver.max_imu_per_interval, dtype),
            wheel_buf=empty_wheel_buffer(f, cfg.solver.max_wheel_per_interval, dtype),
            prior=empty_prior(self.layout, f, dtype),
            gnss_obs=(empty_gnss_obs(f, cfg.gnss.max_sats, dtype)
                      if cfg.gnss.enabled else None),
            lines=(empty_line_tracks(cfg.lines.max_lines, f, dtype)
                   if cfg.use_line else None),
        )
        self.gnss = GnssIngest(cfg) if cfg.gnss.enabled else None
        # native C++ ring-buffer ingest when built (scripts/build_native.py);
        # silently falls back to the Python queues otherwise
        try:
            from .native import NativeIngest

            self.native = NativeIngest()
        except Exception:
            self.native = None
        self.gnss_aligned = False
        self._first_gnss_opt = True   # estimator.cpp:152 (reset by clearState)
        self._pending_gnss: Optional[tuple] = None   # (epoch time, obs list)
        # raw float64 epochs received pre-alignment, installed at alignment
        self._gnss_pre_epochs: list[tuple[float, list]] = []
        self.solver_flag = self.INITIAL
        self.frame_count = 0              # frames currently occupied (fill phase)
        self.ts: list[float] = []
        self.slot_of: dict[int, int] = {}
        self.free_slots = list(range(ml))
        self.line_slot_of: dict[int, int] = {}
        self.free_line_slots = list(range(cfg.lines.max_lines)) if cfg.use_line else []
        self._pending_line_obs: Optional[dict] = None
        # raw queues since the previous frame
        self.imu_q: list[tuple[float, np.ndarray, np.ndarray]] = []
        self.wheel_q: list[tuple[float, np.ndarray, np.ndarray]] = []
        self.last_imu: Optional[tuple] = None
        self.last_wheel: Optional[tuple] = None
        self.all_imu_window: list[list] = []      # per-interval copies for init stats
        self.trajectory: list[tuple[float, np.ndarray]] = []
        self.keyframe_flags: list[bool] = []
        # running parallax bookkeeping
        self._prev_feats: dict[int, FrameFeature] = {}
        # burst replay (enable_burst): 0 = per-frame dispatch
        self._burst_chunk = 0
        self._mirror_synced = False

    def _initial_state(self):
        """Seed the window state from the config — the reference's
        ``setParameter`` copies TIC/RIC/TIO/RIO/sx,sy,sw/td/td_wheel into the
        estimator before anything runs (estimator.cpp:168-211)."""
        cfg = self.cfg
        st = empty_state(self.f, self.dtype)
        ex_cam = jnp.asarray(
            list(cfg.camera.t_ic) + list(cfg.camera.q_ic), self.dtype)
        ex_wheel = jnp.asarray(
            list(cfg.wheel.t_io) + list(cfg.wheel.q_io), self.dtype)
        return st._replace(
            ex_cam=ex_cam,
            ex_wheel=ex_wheel,
            s_wheel=jnp.asarray([cfg.wheel.sx, cfg.wheel.sy, cfg.wheel.sw],
                                self.dtype),
            td=jnp.asarray(cfg.solver.td, self.dtype),
            td_wheel=jnp.asarray(cfg.wheel.td, self.dtype),
        )

    # ------------------------------------------------------------------ ingest

    def input_imu(self, t: float, acc, gyr) -> None:
        if self.native is not None:
            self.native.push_imu(t, acc, gyr)
        else:
            self.imu_q.append((t, np.asarray(acc, np.float64), np.asarray(gyr, np.float64)))
        self._fast_predict(t, np.asarray(acc, np.float64), np.asarray(gyr, np.float64))

    def _fast_predict(self, t, acc, gyr):
        """IMU-rate dead-reckoned odometry on top of the last optimized state
        (Estimator::fastPredictIMU, estimator.cpp:4014-4030; published as the
        ~200 Hz latest-odometry path). Read via :meth:`latest_odometry`."""
        from .utils.np_quat import quat_mul, quat_normalize, quat_to_mat

        if self.solver_flag != self.NON_LINEAR:
            self._fp = None
            return
        if getattr(self, "_fp", None) is None:
            seed = getattr(self, "_fp_seed", None)
            if seed is not None:
                # seeded from the last step's fetched outputs — no per-seed
                # device→host round trips (each costs ~40 ms on a contended
                # remote tunnel)
                pose, sb = seed
                self._fp = {
                    "t": t,
                    "p": np.asarray(pose[0:3], np.float64),
                    "q": np.asarray(pose[3:7], np.float64),
                    "v": np.asarray(sb[0:3], np.float64),
                    "ba": np.asarray(sb[3:6], np.float64),
                    "bg": np.asarray(sb[6:9], np.float64),
                    "acc": acc, "gyr": gyr,
                }
                return
            st = self.core.state
            self._fp = {
                "t": t,
                "p": np.asarray(st.poses[self.f - 1, 0:3], np.float64),
                "q": np.asarray(st.poses[self.f - 1, 3:7], np.float64),
                "v": np.asarray(st.sbs[self.f - 1, 0:3], np.float64),
                "ba": np.asarray(st.sbs[self.f - 1, 3:6], np.float64),
                "bg": np.asarray(st.sbs[self.f - 1, 6:9], np.float64),
                "acc": acc, "gyr": gyr,
            }
            return
        fp = self._fp
        dt = t - fp["t"]
        if dt <= 0 or dt > 1.0:
            fp.update(t=t, acc=acc, gyr=gyr)
            return
        g = np.array([0.0, 0.0, self.cfg.imu.g_norm])
        R0 = quat_to_mat(fp["q"])
        un_acc0 = R0 @ (fp["acc"] - fp["ba"]) - g
        un_gyr = 0.5 * (fp["gyr"] + gyr) - fp["bg"]
        q = quat_normalize(quat_mul(fp["q"], np.concatenate([[1.0], 0.5 * un_gyr * dt])))
        R1 = quat_to_mat(q)
        un_acc1 = R1 @ (acc - fp["ba"]) - g
        un_acc = 0.5 * (un_acc0 + un_acc1)
        fp["p"] = fp["p"] + fp["v"] * dt + 0.5 * un_acc * dt * dt
        fp["v"] = fp["v"] + un_acc * dt
        fp.update(t=t, q=q, acc=acc, gyr=gyr)

    def latest_odometry(self):
        """(t, pose7, v) of the IMU-rate propagated state, or None."""
        fp = getattr(self, "_fp", None)
        if fp is None:
            return None
        return fp["t"], np.concatenate([fp["p"], fp["q"]]), fp["v"]

    def input_wheel(self, t: float, vel, gyr) -> None:
        gyr = np.asarray(gyr, np.float64).copy()
        if getattr(self.cfg.wheel, "w_replace", False) and \
                getattr(self, "_fp", None) is not None:
            # wheel yaw-rate replaced by the latest IMU gyro z (w_replace,
            # rosNodeTest.cpp:93-156 — wheel gyros are usually the worst axis)
            gyr[2] = self._fp["gyr"][2] - self._fp["bg"][2]
        if self.native is not None:
            self.native.push_wheel(t, vel, gyr)
        else:
            self.wheel_q.append((t, np.asarray(vel, np.float64), gyr))

    def input_gnss(self, t: float, obs_list: list[dict]) -> None:
        """One GNSS epoch (list of per-satellite obs dicts, see
        gnss.ingest). Attached to the window at the bracketing-frame slot
        with its epoch time (the reference's time-pulse sync,
        rosNodeTest.cpp GNSS callbacks + estimator.cpp:3193-3207)."""
        if self.gnss is not None:
            self._pending_gnss = (t, obs_list)

    # ------------------------------------------------------- interval building

    def _drain_interval(self, t1: float):
        """Pop queued samples up to t1 into padded interval arrays."""
        cfg = self.cfg
        if self.native is not None:
            t_prev = self.ts[-1] if self.ts else t1 - 10.0
            iv = self.native.drain_imu(t_prev, t1, cfg.solver.max_imu_per_interval)
            wv = self.native.drain_wheel(t_prev, t1, cfg.solver.max_wheel_per_interval)
            self.all_imu_window.append(
                [(0.0, a, g) for a, g in zip(iv[1][iv[3]], iv[2][iv[3]])]
            )
            if len(self.all_imu_window) > self.f:
                self.all_imu_window.pop(0)
            return iv, wv
        imu = [s for s in self.imu_q if s[0] <= t1 + 1e-9]
        self.imu_q = [s for s in self.imu_q if s[0] > t1 + 1e-9]
        wheel = [s for s in self.wheel_q if s[0] <= t1 + 1e-9]
        self.wheel_q = [s for s in self.wheel_q if s[0] > t1 + 1e-9]

        def pad(samples, last, cap, t_prev):
            k = min(len(samples), cap)
            dts = np.zeros(cap)
            a = np.zeros((cap, 3))
            g = np.zeros((cap, 3))
            v = np.zeros(cap, bool)
            tp = t_prev
            for i, (t, x, w) in enumerate(samples[:k]):
                dts[i] = t - tp
                a[i], g[i], v[i] = x, w, True
                tp = t
            x0 = last[1] if last is not None else (samples[0][1] if samples else np.zeros(3))
            g0 = last[2] if last is not None else (samples[0][2] if samples else np.zeros(3))
            return dts, a, g, v, x0, g0

        t_prev = self.ts[-1] if self.ts else (imu[0][0] if imu else t1)
        iv = pad(imu, self.last_imu, cfg.solver.max_imu_per_interval, t_prev)
        wv = pad(wheel, self.last_wheel, cfg.solver.max_wheel_per_interval, t_prev)
        if imu:
            self.last_imu = imu[-1]
        if wheel:
            self.last_wheel = wheel[-1]
        self.all_imu_window.append(imu)
        if len(self.all_imu_window) > self.f:
            self.all_imu_window.pop(0)
        return iv, wv

    def _write_interval(self, slot: int, iv, wv):
        ib, wb = self.core.imu_buf, self.core.wheel_buf
        d, a, g, v, a0, g0 = [jnp.asarray(x, self.dtype if i != 3 else bool) for i, x in enumerate(iv)]
        ib = ib._replace(
            dts=ib.dts.at[slot].set(d), acc=ib.acc.at[slot].set(a),
            gyr=ib.gyr.at[slot].set(g), valid=ib.valid.at[slot].set(v),
            acc0=ib.acc0.at[slot].set(a0), gyr0=ib.gyr0.at[slot].set(g0),
        )
        d, a, g, v, a0, g0 = [jnp.asarray(x, self.dtype if i != 3 else bool) for i, x in enumerate(wv)]
        wb = wb._replace(
            dts=wb.dts.at[slot].set(d), vel=wb.vel.at[slot].set(a),
            gyr=wb.gyr.at[slot].set(g), valid=wb.valid.at[slot].set(v),
            vel0=wb.vel0.at[slot].set(a0), gyr0=wb.gyr0.at[slot].set(g0),
        )
        self.core = self.core._replace(imu_buf=ib, wheel_buf=wb)

    # --------------------------------------------------------- feature ingest

    def _assign_slots(self, feats: dict[int, FrameFeature], slot_frame: int):
        """Allocate/recycle landmark slots and write observations into the
        padded Tracks table (FeatureManager::addFeature semantics)."""
        tr = self.core.tracks
        ml = self.cfg.solver.max_landmarks
        obs_valid_np = np.asarray(tr.obs_valid)
        active_np = np.asarray(tr.active)

        # recycle slots whose feature id vanished and track died
        live_ids = set(feats.keys())
        for fid, slot in list(self.slot_of.items()):
            if not active_np[slot]:
                del self.slot_of[fid]
                self.free_slots.append(slot)

        rows, cols, vals = [], [], []
        new_active, new_start = [], []
        for fid, ft in feats.items():
            slot = self.slot_of.get(fid)
            if slot is None:
                if not self.free_slots:
                    continue  # table full — drop (reference caps at 1000 slots)
                slot = self.free_slots.pop()
                self.slot_of[fid] = slot
                new_active.append(slot)
                new_start.append(slot_frame)
            rows.append(slot)
            vals.append([ft.x, ft.y, ft.vx, ft.vy, ft.depth])

        rows = np.asarray(rows, np.int32)
        vals = np.asarray(vals, np.float64).reshape(-1, 5)
        obs = tr.obs.at[rows, slot_frame].set(jnp.asarray(vals, self.dtype))
        obs_valid = tr.obs_valid.at[rows, slot_frame].set(True)
        if new_active:
            na = np.asarray(new_active, np.int32)
            # scrub stale observations left by the slot's previous tenant:
            # only this frame's column may be valid for a fresh slot
            keep_col = jnp.zeros((self.cfg.num_frames,), bool).at[slot_frame].set(True)
            obs_valid = obs_valid.at[na].set(obs_valid[na] & keep_col[None, :])
            tr = tr._replace(
                active=tr.active.at[na].set(True),
                solve_ok=tr.solve_ok.at[na].set(False),
                depth_fixed=tr.depth_fixed.at[na].set(False),
                start_frame=tr.start_frame.at[na].set(slot_frame),
                inv_depth=tr.inv_depth.at[na].set(jnp.asarray(0.2, self.dtype)),
            )
        self.core = self.core._replace(tracks=tr._replace(obs=obs, obs_valid=obs_valid))

    def _assign_line_slots(self, slot_frame: int):
        """Allocate/recycle line slots and write the pending frame's segment
        observations (the line twin of :meth:`_assign_slots`; the reference's
        ``lineFeaturePerId`` list, feature_manager.h)."""
        lobs = self._pending_line_obs
        self._pending_line_obs = None
        if not self.cfg.use_line or self.core.lines is None or not lobs:
            return
        ln = self.core.lines
        active_np = np.asarray(ln.active)
        for lid, slot in list(self.line_slot_of.items()):
            if not active_np[slot]:
                del self.line_slot_of[lid]
                self.free_line_slots.append(slot)
        rows, vals, new_slots = [], [], []
        for lid, ob in lobs.items():
            slot = self.line_slot_of.get(lid)
            if slot is None:
                if not self.free_line_slots:
                    continue
                slot = self.free_line_slots.pop()
                self.line_slot_of[lid] = slot
                new_slots.append(slot)
            rows.append(slot)
            vals.append(np.asarray(ob, np.float64)[:4])
        if not rows:
            return
        rows = jnp.asarray(rows, jnp.int32)
        obs = ln.obs.at[rows, slot_frame].set(jnp.asarray(np.stack(vals), self.dtype))
        obs_valid = ln.obs_valid.at[rows, slot_frame].set(True)
        if new_slots:
            na = jnp.asarray(new_slots, jnp.int32)
            keep_col = jnp.zeros((self.cfg.num_frames,), bool).at[slot_frame].set(True)
            obs_valid = obs_valid.at[na].set(obs_valid[na] & keep_col[None, :])
            ln = ln._replace(
                active=ln.active.at[na].set(True),
                solve_ok=ln.solve_ok.at[na].set(False),
                start_frame=ln.start_frame.at[na].set(slot_frame),
                orth=ln.orth.at[na].set(0.0),
            )
        self.core = self.core._replace(lines=ln._replace(obs=obs, obs_valid=obs_valid))

    def _keyframe_decision(self, feats: dict[int, FrameFeature]) -> bool:
        """Parallax / track-count keyframe gate
        (``FeatureManager::addFeatureCheckParallax``, feature_manager.cpp:57-116).

        Keyframe when track continuity is weak — fewer than 20 tracked
        features, fewer than 40 long (≥4-observation) tracks, or more than
        half the frame is new — or when the mean parallax between the
        SECOND- and THIRD-last frames (the incoming frame is frame_count;
        parallax is measured at frame_count−1 vs frame_count−2,
        ``compensatedParallax2``, feature_manager.cpp:978-1012) reaches
        MIN_PARALLAX. Note this fork ships compensatedParallax2 with the
        rotation compensation commented out (``p_i_comp = p_i``,
        feature_manager.cpp:998) — plain parallax is the faithful parity.

        While burst staging is active the gate reads the NumPy mirrors
        (``_mirror_obs_valid``/``_mirror_active``/``_mirror_obs_xy``) instead
        of the device core: mid-chunk the device table is up to K-1 frames
        stale and misaligned with the staged slides, and reading it would
        re-add the per-frame device→host round-trip burst mode exists to
        amortize."""
        tracked = [fid for fid in feats if fid in self._prev_feats]
        last_track_num = len(tracked)
        new_feature_num = len(feats) - last_track_num
        if last_track_num < 20 or new_feature_num > 0.5 * last_track_num:
            return True

        if getattr(self, "_burst_chunk", 0) and getattr(self, "_mirror_synced", False):
            ov = self._mirror_obs_valid
            active = self._mirror_active
            obs_xy = self._mirror_obs_xy
        else:
            import jax

            tr = self.core.tracks
            ov, active, obs_xy = (np.array(a) for a in jax.device_get(
                (tr.obs_valid, tr.active, tr.obs[..., 0:2])))
        obs_counts = ov.sum(axis=1)
        # long tracks: the incoming observation brings them to ≥4
        long_track_num = sum(
            1 for fid in tracked
            if (s := self.slot_of.get(fid)) is not None and obs_counts[s] >= 3
        )
        if long_track_num < 40:
            return True

        # mean parallax between the second- and third-last window frames
        i, j = self.f - 3, self.f - 2
        both = ov[:, i] & ov[:, j] & active
        if not both.any():
            return True
        d = obs_xy[both, i] - obs_xy[both, j]
        par = float(np.hypot(d[:, 0], d[:, 1]).mean())
        min_parallax = self.cfg.solver.keyframe_parallax_px / self.cfg.solver.focal
        return par >= min_parallax

    # ------------------------------------------------------------- frame push

    def input_frame(self, t: float, feats: dict[int, FrameFeature],
                    line_obs: Optional[dict[int, np.ndarray]] = None,
                    ) -> Optional[np.ndarray]:
        """Process one synchronized camera frame's features. ``line_obs`` maps
        line id → normalized-plane endpoints [x1,y1,x2,y2] (the
        ``trackImagewithline`` payload, estimator.cpp:275-322). Returns the
        newest optimized pose [7] once the estimator is running."""
        self._pending_line_obs = line_obs if self.cfg.use_line else None
        is_keyframe = self._keyframe_decision(feats)
        self._prev_feats = feats

        if self.solver_flag == self.INITIAL:
            out = self._fill_or_init(t, feats)
        elif self._burst_chunk:
            if self.gnss is not None and (
                    self._pending_gnss is not None or not self.gnss_aligned):
                # host-interactive GNSS work this frame (epoch attachment /
                # VI alignment): flush the staged chunk and take the
                # per-frame path; staging resumes next frame. With epochs at
                # ~1 Hz and frames at ~15 Hz, chunks form between epochs.
                self.flush_burst()
                out = self._nonlinear_frame(t, feats, is_keyframe)
                self._mirror_synced = False
            else:
                out = self._stage_burst_frame(t, feats, is_keyframe)
        else:
            out = self._nonlinear_frame(t, feats, is_keyframe)
        return out

    # --------------------------------------------------------- burst replay

    def enable_burst(self, chunk: int = 16) -> None:
        """Replay acceleration: once NON_LINEAR, stage ``chunk`` frames and
        solve them in ONE device dispatch (``make_window_burst_ingest`` —
        on-device ingest + window step scanned K times). Through the remote
        TPU tunnel every dispatch/fetch costs a ~25 ms round trip (and the
        per-frame path needs several), so replay throughput improves by the
        chunk factor; the device step itself is ~10 ms (bench.py).

        Host slot allocation (points AND line landmarks) runs against NumPy
        mirrors of the padded tables (no per-frame device readback); the
        mirrors are optimistic — device-side deactivations (depth-shift
        failures, MCC/line outliers) are reconciled at every flush, so a dead
        slot's recycling can lag by at most one chunk. With tight GNSS the
        chunk auto-flushes whenever host-interactive work is pending (epoch
        attachment, VI alignment) and that frame runs per-frame — chunks form
        between epochs (~1 Hz epochs vs ~15 Hz frames). Failure detection
        runs PER FRAME inside the chunk (device-side bias checks stacked per
        scanned step; a mid-chunk explosion truncates the chunk's outputs at
        the failing frame and reboots). Call :meth:`flush_burst` before
        reading ``core``/``trajectory`` or checkpointing
        (``utils.checkpoint.save_core``); ``GroundFusionSystem.finish`` does.
        """
        from .estimator.step import make_window_burst_ingest

        self._burst_chunk = int(chunk)
        self._burst_fn, _ = make_window_burst_ingest(self.cfg)
        self._burst_xs: list[dict] = []
        self._burst_meta: list[tuple[float, bool]] = []
        self._burst_flushed_sizes: list[int] = []  # staging evidence/diagnostic
        self._mirror_synced = False

    def enable_live(self) -> None:
        """LIVE/latency mode (VERDICT r4 #3): the per-frame path packed into
        the minimum device traffic — each frame is ONE fused
        ingest+solve+marginalize+slide dispatch (the burst-ingest program
        with a chunk of 1) and ONE batched fetch (odometry + failure flag +
        the post-step mirror tables, which ride out of the same dispatch).
        All host consumers — keyframe parallax gate, slot allocation,
        prediction seeding, the speed gate — are served from the NumPy
        mirrors, so no other device round trip exists on the frame path.
        Equivalence with the per-frame pytree path is the burst-vs-live
        oracle of ``tests/test_burst.py`` (a chunk of 1 is the same scanned
        program). The robot-facing p50/p99 single-solve latency is reported
        by ``bench.py`` (``live_solve_p50_ms``/``p99``)."""
        self.enable_burst(1)

    def _sync_mirror(self) -> None:
        import jax

        tr = self.core.tracks
        fetch = [tr.obs_valid, tr.active, tr.obs[..., 0:2]]
        if self.cfg.use_line and self.core.lines is not None:
            fetch += [self.core.lines.obs_valid, self.core.lines.active]
        # one batched device→host fetch (sequential np.asarray reads cost a
        # full tunnel round trip each)
        got = jax.device_get(tuple(fetch))
        self._mirror_obs_valid = np.array(got[0])
        self._mirror_active = np.array(got[1])
        # x,y columns only — feeds the host-side keyframe parallax gate
        self._mirror_obs_xy = np.array(got[2])
        if self.cfg.use_line and self.core.lines is not None:
            self._mirror_line_obs_valid = np.array(got[3])
            self._mirror_line_active = np.array(got[4])
        self._mirror_synced = True

    def _assign_slots_mirror(self, feats: dict[int, FrameFeature]):
        """Mirror-side twin of :meth:`_assign_slots`: allocate/recycle slots
        against the NumPy mirror and return the padded write-set for the
        on-device ingest. ``rows`` is a permutation of all slot indices
        (written slots first) so every device scatter is collision-free."""
        ml = self.cfg.solver.max_landmarks
        sf = self.f - 1
        for fid, slot in list(self.slot_of.items()):
            if not self._mirror_active[slot]:
                del self.slot_of[fid]
                self.free_slots.append(slot)

        written, vals, news = [], [], []
        for fid, ft in feats.items():
            slot = self.slot_of.get(fid)
            if slot is None:
                if not self.free_slots:
                    continue
                slot = self.free_slots.pop()
                self.slot_of[fid] = slot
                news.append(True)
                self._mirror_active[slot] = True
                self._mirror_obs_valid[slot, :] = False
            else:
                news.append(False)
            written.append(slot)
            vals.append([ft.x, ft.y, ft.vx, ft.vy, ft.depth])
            self._mirror_obs_valid[slot, sf] = True
            self._mirror_obs_xy[slot, sf] = (ft.x, ft.y)

        n = len(written)
        rows = np.empty(ml, np.int32)
        rows[:n] = written
        unused = sorted(set(range(ml)) - set(written))
        rows[n:] = unused
        v = np.zeros((ml, 5), np.float64)
        if n:
            v[:n] = np.asarray(vals, np.float64)
        wmask = np.zeros(ml, bool)
        wmask[:n] = True
        nmask = np.zeros(ml, bool)
        nmask[:n] = news
        return rows, v, wmask, nmask

    def _assign_line_slots_mirror(self, lobs: Optional[dict]):
        """Line twin of :meth:`_assign_slots_mirror` (same permutation-write
        scheme against the line-table mirror)."""
        ll = self.cfg.lines.max_lines
        sf = self.f - 1
        for lid, slot in list(self.line_slot_of.items()):
            if not self._mirror_line_active[slot]:
                del self.line_slot_of[lid]
                self.free_line_slots.append(slot)

        written, vals, news = [], [], []
        for lid, ob in (lobs or {}).items():
            slot = self.line_slot_of.get(lid)
            if slot is None:
                if not self.free_line_slots:
                    continue
                slot = self.free_line_slots.pop()
                self.line_slot_of[lid] = slot
                news.append(True)
                self._mirror_line_active[slot] = True
                self._mirror_line_obs_valid[slot, :] = False
            else:
                news.append(False)
            written.append(slot)
            vals.append(np.asarray(ob, np.float64)[:4])
            self._mirror_line_obs_valid[slot, sf] = True

        n = len(written)
        rows = np.empty(ll, np.int32)
        rows[:n] = written
        rows[n:] = sorted(set(range(ll)) - set(written))
        v = np.zeros((ll, 4), np.float64)
        if n:
            v[:n] = np.stack(vals)
        wmask = np.zeros(ll, bool)
        wmask[:n] = True
        nmask = np.zeros(ll, bool)
        nmask[:n] = news
        return rows, v, wmask, nmask

    def _stage_burst_frame(self, t, feats, is_keyframe) -> Optional[np.ndarray]:
        f = self.f
        if not self._burst_xs and not self._mirror_synced:
            self._sync_mirror()
        iv, wv = self._drain_interval(t)
        self.ts.append(t)
        if len(self.ts) > f:
            self.ts.pop(0)
        rows, vals, wmask, nmask = self._assign_slots_mirror(feats)
        fr = dict(
            i_dts=iv[0], i_acc=iv[1], i_gyr=iv[2], i_valid=iv[3],
            i_acc0=iv[4], i_gyr0=iv[5],
            w_dts=wv[0], w_vel=wv[1], w_gyr=wv[2], w_valid=wv[3],
            w_vel0=wv[4], w_gyr0=wv[5],
            rows=rows, vals=vals, wmask=wmask, nmask=nmask,
            marg_old=np.asarray(bool(is_keyframe)),
        )
        if self.cfg.use_line:
            lobs = self._pending_line_obs
            self._pending_line_obs = None
            lr, lv, lw, ln = self._assign_line_slots_mirror(lobs)
            fr.update(l_rows=lr, l_vals=lv, l_wmask=lw, l_nmask=ln)
        if self.gnss is not None:
            frame_dts = np.diff(np.asarray(self.ts, np.float64),
                                prepend=self.ts[0])
            fr.update(gnss_ready=np.asarray(self.gnss_aligned),
                      frame_dts=frame_dts[:f])
        self._burst_xs.append(fr)
        self._burst_meta.append((t, bool(is_keyframe)))
        # slide bookkeeping (mirror + timestamps), as _run_step's tail
        if not is_keyframe:
            self.ts = self.ts[: f - 2] + [self.ts[f - 1]]
            for ov in self._mirror_valids():
                ov[:, f - 2] = ov[:, f - 1]
                ov[:, f - 1] = False
            self._mirror_obs_xy[:, f - 2] = self._mirror_obs_xy[:, f - 1]
        else:
            self.ts = self.ts[1:]
            self._mirror_obs_valid = np.roll(self._mirror_obs_valid, -1, axis=1)
            self._mirror_obs_valid[:, -1] = False
            self._mirror_obs_xy = np.roll(self._mirror_obs_xy, -1, axis=1)
            if self.cfg.use_line:
                self._mirror_line_obs_valid = np.roll(
                    self._mirror_line_obs_valid, -1, axis=1)
                self._mirror_line_obs_valid[:, -1] = False
        self._mirror_active &= self._mirror_obs_valid.any(axis=1)
        if self.cfg.use_line:
            self._mirror_line_active &= self._mirror_line_obs_valid.any(axis=1)
        if len(self._burst_xs) >= self._burst_chunk:
            return self.flush_burst()
        return None

    def _mirror_valids(self):
        out = [self._mirror_obs_valid]
        if self.cfg.use_line:
            out.append(self._mirror_line_obs_valid)
        return out

    def flush_burst(self) -> Optional[np.ndarray]:
        """Dispatch all staged frames as one scanned device program, record
        their per-keyframe odometry, reconcile the track-table mirror and run
        the (per-chunk) failure check. Returns the newest optimized pose."""
        if not getattr(self, "_burst_xs", None):
            return None
        xs = {
            k: jnp.asarray(
                np.stack([fr[k] for fr in self._burst_xs]),
                bool if self._burst_xs[0][k].dtype == np.bool_
                else (jnp.int32 if k in ("rows", "l_rows") else self.dtype),
            )
            for k in self._burst_xs[0]
        }
        core_new, outs, mirrors = self._burst_fn(self.core, xs)
        self.core = core_new
        self._burst_flushed_sizes.append(len(self._burst_meta))
        import jax

        # ONE batched round trip for odometry + failure flags + the
        # post-chunk mirror tables (the mirrors ride along instead of a
        # second _sync_mirror fetch — the flush is 1 dispatch + 1 fetch)
        fetched = jax.device_get((outs["pose"], outs["sb"], outs["failed"])
                                 + tuple(mirrors))
        poses, sbs_out, failed = fetched[0:3]
        mirror_arrays = fetched[3:]
        poses = np.asarray(poses, np.float64)
        # per-frame failure detection INSIDE the chunk (device-side bias
        # checks stacked per step): on a mid-chunk explosion, keep only the
        # frames solved before it and reboot — the reference checks every
        # frame (estimator.cpp:1140-1148); frames after the failure are
        # spent toward re-initialization exactly as its clearState path does
        failed = np.asarray(failed)
        k_fail = int(np.argmax(failed)) if failed.any() else len(poses)
        for k, (t, kf) in enumerate(self._burst_meta[:k_fail]):
            self.trajectory.append((t, poses[k]))
            self.keyframe_flags.append(kf)
        self._burst_xs = []
        self._burst_meta = []
        self._fp = None
        if k_fail < len(poses):
            self.reboot()
            return None
        # seed fastPredict + the speed gate from the fetched outputs
        self._last_sb = np.asarray(sbs_out[-1], np.float64)
        self._fp_seed = (poses[-1], self._last_sb)
        self._last_out_failed = False
        # reconcile mirrors from the flush's own fetch (same arrays
        # _sync_mirror would read — they come from core_new inside the jit)
        self._mirror_obs_valid = np.array(mirror_arrays[0])
        self._mirror_active = np.array(mirror_arrays[1])
        self._mirror_obs_xy = np.array(mirror_arrays[2])
        if self.cfg.use_line and self.core.lines is not None:
            self._mirror_line_obs_valid = np.array(mirror_arrays[3])
            self._mirror_line_active = np.array(mirror_arrays[4])
        self._mirror_synced = True
        return poses[-1]

    def _fill_or_init(self, t, feats):
        f = self.f
        k = self.frame_count
        iv, wv = self._drain_interval(t)
        self.ts.append(t)
        self._write_interval(min(k, f - 1), iv, wv)
        self._assign_slots(feats, min(k, f - 1))
        self._assign_line_slots(min(k, f - 1))

        # wheel dead-reckoned pose prediction during fill (initFramePoseByOdom
        # analog, feature_manager.cpp:407-545)
        if k > 0 and self.cfg.wheel.enabled:
            self._predict_pose_from_wheel(min(k, f - 1))
        self.frame_count += 1
        if self.frame_count == f:
            ok = self._initialize()
            if ok:
                self.solver_flag = self.NON_LINEAR
                # init already placed every pose — don't re-propagate F-1
                return self._run_step(marg_old=True, propagate_newest=False)
            else:
                # drop the oldest frame and keep filling (reference slides the
                # init window, estimator.cpp:1092-1105)
                self._slide_fill_window()
        return None

    def _predict_pose_from_wheel(self, slot: int):
        """Compose previous pose with the wheel preintegration delta
        (T^w_bj = T^w_bi · T_io · ΔT_o · T_io⁻¹)."""
        cfg = self.cfg
        n12 = wheel_noise_cov(cfg.wheel.vel_n, cfg.wheel.gyr_n, self.dtype)
        wpre = preintegrate_wheel_window(self.core.wheel_buf, self.core.state.s_wheel,
                                         self.core.state.td_wheel, n12)
        dq = wpre.delta_q[slot]
        dp = wpre.delta_p[slot]
        ex = self.core.state.ex_wheel
        delta_o = make_pose(dp, dq)
        T_prev = self.core.state.poses[slot - 1]
        T_new = pose_compose(pose_compose(pose_compose(T_prev, ex), delta_o), pose_inverse(ex))
        st = self.core.state
        self.core = self.core._replace(state=st._replace(poses=st.poses.at[slot].set(T_new)))

    def _slide_fill_window(self):
        from .estimator.buffers import slide_old_imu_buffer, slide_old_wheel_buffer
        from .estimator.window import slide_old_state, slide_old_tracks

        st = self.core.state
        self.core = self.core._replace(
            state=slide_old_state(st),
            tracks=slide_old_tracks(st, self.core.tracks),
            imu_buf=slide_old_imu_buffer(self.core.imu_buf),
            wheel_buf=slide_old_wheel_buffer(self.core.wheel_buf),
            lines=(slide_old_lines(st, self.core.lines)
                   if self.core.lines is not None else None),
        )
        self.ts.pop(0)
        self.frame_count -= 1

    # ---------------------------------------------------------------- init

    def _imu_stats(self):
        samples = [s for interval in self.all_imu_window for s in interval]
        if not samples:
            return None
        accs = np.stack([s[1] for s in samples])
        gyrs = np.stack([s[2] for s in samples])
        return accs.mean(0), gyrs.mean(0), accs.var(0).sum(), gyrs.mean(0)

    def _initialize(self) -> bool:
        """3-mode dispatch (``Estimator::initialStructure``,
        estimator.cpp:1557-1847): stationary → bias-only; excited + wheel →
        gyro-bias solve + wheel linear alignment + gravity alignment; else →
        visual SfM + PnP + VisualIMUAlignment (path C,
        estimator.cpp:1712-1847, dispatch initial_aligment.cpp:640-653)."""
        cfg = self.cfg
        stats = self._imu_stats()
        if stats is None:
            return False
        acc_mean, gyr_mean, acc_var, _ = stats
        st = self.core.state

        if acc_var < cfg.init.stationary_acc_var:
            ba, bg, R0 = stationary_bias_init(
                jnp.asarray(acc_mean, self.dtype), jnp.asarray(gyr_mean, self.dtype),
                cfg.imu.g_norm,
            )
            # g2r(acc_mean) is the yaw-free world-from-body rotation
            poses = jnp.tile(
                jnp.concatenate([jnp.zeros(3, self.dtype), mat_to_quat(R0)]), (self.f, 1)
            )
            sbs = jnp.zeros_like(st.sbs)
            sbs = sbs.at[:, 3:6].set(ba).at[:, 6:9].set(bg)
            self.core = self.core._replace(state=st._replace(poses=poses, sbs=sbs))
            return True

        # dynamic / wheel-activation path (path B, estimator.cpp:1645-1682):
        # gyro bias from wheel-predicted rotations + wheel linear alignment.
        # On failure (or without a wheel) fall through to the visual path —
        # the reference's general initializer.
        n18 = noise_cov(cfg.imu.acc_n, cfg.imu.gyr_n, cfg.imu.acc_w, cfg.imu.gyr_w, self.dtype)
        imu_pre = preintegrate_imu_window(self.core.imu_buf, st.sbs, n18)
        if cfg.wheel.enabled and self._wheel_excitation_init(st, imu_pre):
            return True
        return self._visual_initialize(imu_pre)

    def _wheel_excitation_init(self, st, imu_pre) -> bool:
        """Wheel-activation init (path B): gyro bias from the wheel-predicted
        window rotations, wheel-aided linear alignment, gravity alignment."""
        cfg = self.cfg
        n18 = noise_cov(cfg.imu.acc_n, cfg.imu.gyr_n, cfg.imu.acc_w, cfg.imu.gyr_w, self.dtype)
        n12 = wheel_noise_cov(cfg.wheel.vel_n, cfg.wheel.gyr_n, self.dtype)
        valid = jnp.asarray(np.arange(self.f) >= 1)
        dbg = solve_gyroscope_bias(st.poses[:, 3:7], imu_pre, valid)
        sbs = st.sbs.at[:, 6:9].add(dbg)
        st = st._replace(sbs=sbs)

        # re-preintegrate at corrected bias and run the wheel linear alignment
        imu_pre = preintegrate_imu_window(self.core.imu_buf, st.sbs, n18)
        wheel_pre = preintegrate_wheel_window(self.core.wheel_buf, st.s_wheel, st.td_wheel, n12)
        Rs = quat_to_mat(st.poses[:, 3:7])
        Ts = st.poses[:, 0:3]
        tic = st.ex_cam[0:3]
        tio = st.ex_wheel[0:3]
        rio = quat_to_mat(st.ex_wheel[3:7])
        ok, g_est, vels_body, s = linear_alignment_wheel(
            Rs, Ts, imu_pre, wheel_pre, tic, tio, rio, cfg.imu.g_norm
        )
        if not bool(ok):
            return False
        st = align_window_to_gravity(st, g_est, vels_body, cfg.imu.g_norm)

        if cfg.solver.calibrate_extrinsic:
            # ESTIMATE_EXTRINSIC=2: bootstrap ric by hand-eye calibration from
            # adjacent-pair essential rotations vs IMU delta rotations
            # (CalibrationExRotation call site estimator.cpp:905-925)
            ric, cal_ok = self._hand_eye_bootstrap(imu_pre)
            if bool(cal_ok):
                ex = st.ex_cam.at[3:7].set(mat_to_quat(ric).astype(self.dtype))
                st = st._replace(ex_cam=ex)
        self.core = self.core._replace(state=st)
        return True

    def _visual_initialize(self, imu_pre) -> bool:
        """Visual-SfM initialization (path C — the reference's general mode,
        ``estimator.cpp:1712-1847``): global SfM over the window
        (relativePose → GlobalSFM.construct → PnP every frame), gyro bias
        from SfM rotations, then the VisualIMUAlignment linear system picked
        by sensor availability (initial_aligment.cpp:640-653: WD | Wheel |
        Depth | mono) and gravity alignment (visualInitialAlign,
        estimator.cpp:1849-1926).

        Divergence: the fork re-installs the stationary accel-bias formula
        after a successful visual init (estimator.cpp:1826-1837) — skipped
        here, since ``aver_g`` mixes true acceleration into the bias when the
        platform is moving (upstream VINS-Mono does not do this either)."""
        from .estimator.sfm import sfm_construct

        cfg = self.cfg
        st = self.core.state
        use_depth = bool(cfg.use_depth) and bool(
            np.any(np.asarray(self.core.tracks.obs[..., 4]) > 0.1))
        poses_cam, ok = sfm_construct(
            self.core.tracks, jax.random.PRNGKey(len(self.ts)),
            use_depth=use_depth,
        )
        if not ok:
            return False
        poses_cam = poses_cam.astype(self.dtype)
        ric = quat_to_mat(st.ex_cam[3:7])
        tic = st.ex_cam[0:3]
        # body rotation from SfM camera rotation: R_w_b = R_w_c · RICᵀ
        # (estimator.cpp:1758 frame.R = Q[i] · RIC[0].transpose())
        R_body = jnp.einsum("kij,lj->kil", quat_to_mat(poses_cam[:, 3:7]), ric)
        q_body = mat_to_quat(R_body)
        Ts = poses_cam[:, 0:3]                 # SfM camera centers

        # gyro bias from the SfM rotations, then re-preintegrate
        n18 = noise_cov(cfg.imu.acc_n, cfg.imu.gyr_n, cfg.imu.acc_w, cfg.imu.gyr_w, self.dtype)
        valid = jnp.asarray(np.arange(self.f) >= 1)
        dbg = solve_gyroscope_bias(q_body, imu_pre, valid)
        st = st._replace(sbs=st.sbs.at[:, 6:9].add(dbg))
        imu_pre = preintegrate_imu_window(self.core.imu_buf, st.sbs, n18)

        if cfg.wheel.enabled:
            from .estimator.initialization import linear_alignment_wd

            n12 = wheel_noise_cov(cfg.wheel.vel_n, cfg.wheel.gyr_n, self.dtype)
            wheel_pre = preintegrate_wheel_window(
                self.core.wheel_buf, st.s_wheel, st.td_wheel, n12)
            tio = st.ex_wheel[0:3]
            rio = quat_to_mat(st.ex_wheel[3:7])
            if use_depth:
                ok, g_est, vels_body, s = linear_alignment_wd(
                    R_body, Ts, imu_pre, wheel_pre, tic, tio, rio, cfg.imu.g_norm)
            else:
                ok, g_est, vels_body, s = linear_alignment_wheel(
                    R_body, Ts, imu_pre, wheel_pre, tic, tio, rio, cfg.imu.g_norm)
        else:
            from .estimator.initialization import (
                linear_alignment_depth, linear_alignment_mono,
            )

            if use_depth:
                ok, g_est, vels_body, s = linear_alignment_depth(
                    R_body, Ts, imu_pre, tic, cfg.imu.g_norm)
            else:
                ok, g_est, vels_body, s = linear_alignment_mono(
                    R_body, Ts, imu_pre, tic, cfg.imu.g_norm)
        if not bool(ok):
            return False

        # camera centers → body origins at the recovered scale, re-zeroed at
        # frame 0 (visualInitialAlign: Ps[i] = s·Pi − Ri·TIC − (s·P0 − R0·TIC))
        Ps = s * Ts - jnp.einsum("kij,j->ki", R_body, tic)
        Ps = Ps - Ps[0]
        st = st._replace(poses=jnp.concatenate([Ps, q_body], axis=-1).astype(self.dtype))
        st = align_window_to_gravity(st, g_est, vels_body, cfg.imu.g_norm)
        self.core = self.core._replace(state=st)
        return True

    def _hand_eye_bootstrap(self, imu_pre):
        """Relative camera rotations (essential-matrix RANSAC on each adjacent
        frame pair of the window's tracks) + IMU preintegrated delta rotations
        → ``calibrate_extrinsic_rotation`` (initial_ex_rotation.cpp:22-79)."""
        import jax

        from .estimator.initialization import calibrate_extrinsic_rotation
        from .estimator.sfm import relative_pose_ransac

        tr = self.core.tracks
        q_cam, q_imu, valid = [], [], []
        key = jax.random.PRNGKey(0)
        for k in range(self.f - 1):
            both = np.asarray(tr.obs_valid[:, k] & tr.obs_valid[:, k + 1] & tr.active)
            if both.sum() < 12:
                continue
            xi = tr.obs[:, k, 0:2]
            xj = tr.obs[:, k + 1, 0:2]
            key, sub = jax.random.split(key)
            pose_rel, _, ok = relative_pose_ransac(xi, xj, jnp.asarray(both), sub)
            if not bool(ok):
                continue
            q_cam.append(np.asarray(pose_rel[3:7]))  # q_ci_cj, matches delta_q q_bi_bj
            q_imu.append(np.asarray(imu_pre.delta_q[k + 1]))
            valid.append(True)
        if len(q_cam) < 3:
            return None, False
        return calibrate_extrinsic_rotation(
            jnp.asarray(np.stack(q_cam), self.dtype),
            jnp.asarray(np.stack(q_imu), self.dtype),
            jnp.asarray(valid),
        )

    # ------------------------------------------------------------- solve step

    def _nonlinear_frame(self, t, feats, is_keyframe):
        f = self.f
        iv, wv = self._drain_interval(t)
        self.ts.append(t)
        if len(self.ts) > f:
            self.ts.pop(0)
        self._write_interval(f - 1, iv, wv)
        self._assign_slots(feats, f - 1)
        self._assign_line_slots(f - 1)
        out = self._run_step(marg_old=is_keyframe, propagate_newest=True)
        self._check_failure()
        return out

    def _check_failure(self):
        """failureDetection → clearState reboot (estimator.cpp:1140-1148,
        2847-2888): exploding bias norms restart the estimator from the
        initialization phase, keeping the sensor queues."""
        failed = getattr(self, "_last_out_failed", None)
        if failed is None:
            from .estimator.gates import failure_detection

            failed = failure_detection(np.asarray(self.core.state.sbs),
                                       ba_thresh=self.cfg.solver.fail_ba_thresh,
                                       bg_thresh=self.cfg.solver.fail_bg_thresh)
        if failed:
            self.reboot()

    def reboot(self):
        """clearState + setParameter equivalent: reset window state, tracks,
        prior and mode; sensor queues and tracker ids survive (the reference
        keeps subscriptions alive and re-enters INITIAL)."""
        from .estimator.assembly import empty_prior
        from .estimator.window import empty_state, empty_tracks
        from .gnss.factors import empty_gnss_obs

        cfg = self.cfg
        f, ml = self.f, cfg.solver.max_landmarks
        self.core = EstimatorCore(
            state=self._initial_state(),
            tracks=empty_tracks(ml, f, self.dtype),
            imu_buf=empty_imu_buffer(f, cfg.solver.max_imu_per_interval, self.dtype),
            wheel_buf=empty_wheel_buffer(f, cfg.solver.max_wheel_per_interval, self.dtype),
            prior=empty_prior(self.layout, f, self.dtype),
            gnss_obs=(empty_gnss_obs(f, cfg.gnss.max_sats, self.dtype)
                      if cfg.gnss.enabled else None),
            lines=(empty_line_tracks(cfg.lines.max_lines, f, self.dtype)
                   if cfg.use_line else None),
        )
        self.solver_flag = self.INITIAL
        self.frame_count = 0
        self.ts = []
        self.slot_of = {}
        self.free_slots = list(range(ml))
        self.line_slot_of = {}
        self.free_line_slots = list(range(cfg.lines.max_lines)) if cfg.use_line else []
        self.all_imu_window = []
        self.gnss_aligned = False
        self._first_gnss_opt = True   # estimator.cpp:152
        self._gnss_pre_epochs = []
        self._mirror_synced = False
        self._fp_seed = None
        self._last_sb = None
        self._last_out_failed = None
        if getattr(self, "_burst_chunk", 0):
            self._burst_xs, self._burst_meta = [], []
        self.reboots = getattr(self, "reboots", 0) + 1

    # -------------------------------------------------------- checkpointing

    def save_state(self, path: str) -> None:
        """Snapshot the full estimator — device core + the host bookkeeping
        (slot maps, window timestamps, mode) — so a later process resumes
        mid-sequence instead of cold re-initializing (SURVEY §5: the
        reference's VIO state dies with the process; this is the
        checkpointed-window extension). Call :meth:`flush_burst` first in
        burst mode (``GroundFusionSystem.finish`` does)."""
        from .utils.checkpoint import _flatten

        out: dict = {}
        _flatten(self.core, "core.", out)
        out.update(
            solver_flag=np.int64(self.solver_flag),
            frame_count=np.int64(self.frame_count),
            ts=np.asarray(self.ts, np.float64),
            slot_keys=np.asarray(list(self.slot_of.keys()), np.int64),
            slot_vals=np.asarray(list(self.slot_of.values()), np.int64),
            free_slots=np.asarray(self.free_slots, np.int64),
            line_slot_keys=np.asarray(list(self.line_slot_of.keys()), np.int64),
            line_slot_vals=np.asarray(list(self.line_slot_of.values()), np.int64),
            free_line_slots=np.asarray(self.free_line_slots, np.int64),
            gnss_aligned=np.bool_(self.gnss_aligned),
            traj_t=np.asarray([t for t, _ in self.trajectory], np.float64),
            traj_p=(np.stack([p for _, p in self.trajectory])
                    if self.trajectory else np.zeros((0, 7))),
            keyframe_flags=np.asarray(self.keyframe_flags, bool),
        )
        if self.gnss is not None:
            if self.gnss.anc0 is not None:
                out["gnss_anc0"] = np.asarray(self.gnss.anc0, np.float64)
            out["gnss_track_keys"] = np.asarray(
                list(self.gnss.track_count.keys()), np.int64)
            out["gnss_track_vals"] = np.asarray(
                list(self.gnss.track_count.values()), np.int64)
        np.savez_compressed(path, **out)

    def load_state(self, path: str) -> None:
        """Restore a :meth:`save_state` snapshot. The first frame after a
        resume is forced to be a keyframe (the tracker's feature-id ↔ slot
        continuity is re-established from the restored slot map, but the
        previous frame's feature set is not persisted). The config must
        match the one that saved (same table shapes / enabled blocks)."""
        data = np.load(path)
        core_data = {k[len("core."):]: v for k, v in data.items()
                     if k.startswith("core.")}

        import jax.numpy as jnp2

        def rebuild(tmpl, prefix):
            if hasattr(tmpl, "_fields"):
                return type(tmpl)(*[
                    rebuild(getattr(tmpl, n), f"{prefix}{n}.")
                    for n in tmpl._fields])
            if tmpl is None:
                return None
            return jnp2.asarray(core_data[prefix[:-1]],
                                jnp2.asarray(tmpl).dtype)

        self.core = rebuild(self.core, "")
        self.solver_flag = int(data["solver_flag"])
        self.frame_count = int(data["frame_count"])
        self.ts = [float(t) for t in data["ts"]]
        self.slot_of = {int(k): int(v) for k, v in
                        zip(data["slot_keys"], data["slot_vals"])}
        self.free_slots = [int(s) for s in data["free_slots"]]
        self.line_slot_of = {int(k): int(v) for k, v in
                             zip(data["line_slot_keys"], data["line_slot_vals"])}
        self.free_line_slots = [int(s) for s in data["free_line_slots"]]
        self.gnss_aligned = bool(data["gnss_aligned"])
        self.trajectory = [(float(t), p) for t, p in
                           zip(data["traj_t"], data["traj_p"])]
        self.keyframe_flags = [bool(b) for b in data["keyframe_flags"]]
        if self.gnss is not None and "gnss_anc0" in data:
            self.gnss.set_anchor(np.asarray(data["gnss_anc0"], np.float64))
        if self.gnss is not None and "gnss_track_keys" in data:
            self.gnss.track_count = {int(k): int(v) for k, v in
                                     zip(data["gnss_track_keys"],
                                         data["gnss_track_vals"])}
        self._prev_feats = {}
        self._fp = None
        self._fp_seed = None
        self._last_sb = None
        self._last_out_failed = None
        self._mirror_synced = False

    def anchor_ecef(self) -> Optional[np.ndarray]:
        """Absolute ECEF anchor (float64 expansion anchor + the state's
        ENU delta column), or None before GNSS-VI alignment."""
        if self.gnss is None or self.gnss.anc0 is None:
            return None
        return self.gnss.anchor_ecef(np.asarray(self.core.state.anc_ecef))

    def _attach_gnss_epoch(self):
        """Gate + store the pending epoch into the window table at its
        bracketing-frame slot. The reference interpolates the state between
        the two frames that straddle the epoch time (``estimator.cpp:
        3193-3207``: lower_idx from Headers vs obs time, ts_ratio =
        (upper−obs)/(upper−lower)); slot k of the table is defined as
        "bracketed by frames k and k+1", so the epoch lands at the lower
        frame with its true interpolation ratio."""
        if self.gnss is None or self._pending_gnss is None:
            return
        t_obs, obs_list = self._pending_gnss
        anc_abs = (self.gnss.anchor_ecef(self.core.state.anc_ecef)
                   if self.gnss_aligned else None)
        obs = self.gnss.process_epoch(obs_list, self.gnss_aligned, anc_abs)
        self._pending_gnss = None
        if not obs or self.core.gnss_obs is None or len(self.ts) < 2:
            return
        if not self.gnss_aligned:
            # no expansion anchor yet: keep the raw (float64) epoch host-side
            # and install it into the window table at alignment
            # (_install_window_epochs) — the factors are gnss_ready-gated
            # until then anyway
            self._gnss_pre_epochs.append((float(t_obs), obs))
            return
        self._write_gnss_slot(float(t_obs), obs, anc_abs)

    def _write_gnss_slot(self, t_obs: float, obs: list, anc_abs) -> None:
        ts = np.asarray(self.ts, np.float64)
        lower = int(np.searchsorted(ts, t_obs, side="right") - 1)
        lower = max(0, min(lower, len(ts) - 2, self.f - 2))
        denom = max(float(ts[lower + 1] - ts[lower]), 1e-9)
        ratio = float(np.clip((ts[lower + 1] - t_obs) / denom, 0.0, 1.0))
        for o in obs:
            o["ratio"] = ratio
        slot = self.gnss.build_slot(obs, anc_abs)
        g = self.core.gnss_obs
        upd = {}
        for k, v in slot.items():
            arr = getattr(g, k)
            upd[k] = arr.at[lower].set(jnp.asarray(v, arr.dtype))
        self.core = self.core._replace(gnss_obs=g._replace(**upd))

    def _try_gnss_align(self):
        """GNSSVIAlign trigger (estimator.cpp:1928-2043): once NON_LINEAR
        with enough filtered epochs, run coarse SPP + yaw GN + anchor
        refinement and install the result into the state."""
        if self.gnss is None or self.gnss_aligned:
            return
        epochs = [e for e in self.gnss.epochs if len(e) >= 4]
        if len(epochs) < 5:
            return
        from .gnss.align import gnss_vi_align

        st = self.core.state
        n = min(len(self.gnss.epochs), self.f)
        local_pos = np.asarray(st.poses[-n:, 0:3])
        local_vel = np.asarray(st.sbs[-n:, 0:3])
        eps = self.gnss.epochs[-n:]
        anc, yaw, rcv_dt, ok = gnss_vi_align(
            local_pos, local_vel, eps, min_speed=self.cfg.gnss.low_speed_yaw_fix
        )
        if not ok:
            return
        # install the float64 expansion anchor; the state's anchor column is
        # the ENU DELTA from it (zero at alignment) — absolute ECEF math at
        # f32 quantizes at meters, so it never reaches the device
        # (gnss/factors.GnssObsWindow)
        self.gnss.set_anchor(anc)
        self.core = self.core._replace(state=st._replace(
            anc_ecef=jnp.zeros(3, self.dtype),
            yaw_enu=jnp.asarray(yaw, self.dtype),
            rcv_dt=jnp.tile(jnp.asarray(rcv_dt, self.dtype), (self.f, 1)),
        ))
        self.gnss_aligned = True
        self._install_window_epochs(anc)

    def _install_window_epochs(self, anc) -> None:
        """Install the raw epochs received BEFORE alignment into the window
        table, reduced against the freshly-installed float64 anchor — the
        role the reference's per-factor atmosphere/weight recomputation plays
        (gnss_psr_dopp_factor.cpp:78-89): pre-alignment slots must not keep
        placeholder values. Raw float64 observations were kept host-side
        precisely so no f32-truncated pseudorange ever feeds a reduction."""
        eps = [e for e in self._gnss_pre_epochs
               if self.ts and self.ts[0] <= e[0] <= self.ts[-1] + 1e-9]
        self._gnss_pre_epochs = []
        for t_obs, obs in eps:
            self._write_gnss_slot(t_obs, obs, np.asarray(anc, np.float64))

    def _run_step(self, marg_old: bool, propagate_newest: bool = False):
        f = self.f
        if self.gnss is not None:
            self._attach_gnss_epoch()
            self._try_gnss_align()
        # newest-frame speed for the low-speed yaw gate: the previous step's
        # fetched sb IS sbs[F-1] post-slide (both slide branches keep the
        # newest slot), so no device readback is needed past the first frame
        last_sb = getattr(self, "_last_sb", None)
        if last_sb is not None:
            speed = float(np.linalg.norm(last_sb[0:3]))
        else:
            speed = float(np.linalg.norm(np.asarray(self.core.state.sbs[f - 1, 0:3])))
        frame_dts = np.diff(np.asarray(self.ts, np.float64), prepend=self.ts[0])
        # anomaly/stationarity gates are computed inside the jitted step from
        # the window buffers (estimator/gates.device_frame_gates); the flags
        # below are host OVERRIDES only
        wheel_valid = np.arange(f) >= 1
        flags = StepFlags(
            marg_old=jnp.asarray(bool(marg_old)),
            stationary=jnp.asarray(False),
            wheel_valid=jnp.asarray(wheel_valid),
            imu_valid=jnp.asarray(np.arange(f) >= 1),
            td_obs=jnp.zeros(f, self.dtype),
            gnss_ready=jnp.asarray(self.gnss_aligned),
            frame_dts=jnp.asarray(frame_dts[:f], self.dtype),
            fix_yaw_enu=jnp.asarray(speed < self.cfg.gnss.low_speed_yaw_fix),
            first_gnss_opt=jnp.asarray(self._first_gnss_opt),
            propagate_newest=jnp.asarray(bool(propagate_newest)),
        )
        self._first_gnss_opt = False
        core_new, out = self.step_fn(self.core, flags)
        self.core = core_new
        # ONE batched device→host fetch for everything the host needs from
        # this step (pose, speed/bias vector, failure flag) — sequential
        # np.asarray reads cost one tunnel round trip EACH
        import jax

        pose, sb, failed = jax.device_get((out["pose"], out["sb"], out["failed"]))
        pose = np.asarray(pose, np.float64)
        self._last_sb = np.asarray(sb, np.float64)
        self._last_out_failed = bool(failed)
        self._fp = None   # fastPredict re-seeds from the fresh optimized state
        self._fp_seed = (pose, self._last_sb)
        self.trajectory.append((self.ts[-1], pose))
        self.keyframe_flags.append(bool(marg_old))
        if not marg_old:
            # second-new slide dropped frame F-2's timestamp
            self.ts = self.ts[: f - 2] + [self.ts[f - 1]]
            # frame-slot bookkeeping for feature start frames is array-side
        else:
            self.ts = self.ts[1:]
        return pose

    # ---------------------------------------------------------------- output

    def write_tum(self, path: str) -> None:
        """TUM-format trajectory dump (``visualization.cpp:346-358``)."""
        with open(path, "w") as fp:
            for t, p in self.trajectory:
                # TUM: t x y z qx qy qz qw
                fp.write(
                    f"{t:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                    f"{p[4]:.6f} {p[5]:.6f} {p[6]:.6f} {p[3]:.6f}\n"
                )
