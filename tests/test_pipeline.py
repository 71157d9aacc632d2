"""End-to-end pipeline test: stream synthetic sensors through the host
Estimator (wheel-activation init path) and check ATE against ground truth —
the golden-replay analog of the reference's rosbag protocol (SURVEY §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ground_fusion_tpu.config import Config
from ground_fusion_tpu.pipeline import Estimator, FrameFeature
from ground_fusion_tpu.sim.synthetic import (
    SimParams,
    body_T_cam,
    gt_pose7,
    imu_sample,
    make_landmarks,
    project_landmarks,
    wheel_sample,
)
from ground_fusion_tpu.utils.evaluate import ate_rmse

DT = jnp.float64


def run_pipeline(n_frames=35, pix_noise=0.0, with_depth=True, seed=0, cfg=None,
                 n_landmarks=200, burst=0, sp=None, drop_feats=None):
    """``sp``: override SimParams (adversarial scenarios); ``drop_feats``:
    optional ``fn(frame_idx) -> keep_fraction`` culling the feature dict (the
    feature-starvation scenario)."""
    cfg = cfg if cfg is not None else Config()
    sp = sp if sp is not None else SimParams(pix_noise=pix_noise, seed=seed)
    est = Estimator(cfg, dtype=DT)
    if burst:
        est.enable_burst(burst)
    ex = body_T_cam(DT)
    pts_w = jnp.asarray(make_landmarks(n_landmarks, sp, seed=seed + 1), DT)
    rng = np.random.default_rng(seed + 7)

    frame_dt = 1.0 / sp.frame_rate
    imu_dt = 1.0 / sp.imu_rate
    wheel_dt = 1.0 / sp.wheel_rate
    t0 = 0.0
    a, g = np.asarray(imu_sample(t0, sp), dtype=np.float64)
    est.input_imu(t0, a, g)
    if cfg.wheel.enabled:
        v, wg = np.asarray(wheel_sample(t0, sp), dtype=np.float64)
        est.input_wheel(t0, v, wg)

    gt = []
    for k in range(n_frames):
        t = t0 + k * frame_dt
        if k > 0:
            tp = t - frame_dt
            for ti in np.arange(tp + imu_dt, t + 0.5 * imu_dt, imu_dt):
                a, g = np.asarray(imu_sample(ti, sp), dtype=np.float64)
                est.input_imu(float(ti), a, g)
            if cfg.wheel.enabled:
                for ti in np.arange(tp + wheel_dt, t + 0.5 * wheel_dt, wheel_dt):
                    v, wg = np.asarray(wheel_sample(ti, sp), dtype=np.float64)
                    est.input_wheel(float(ti), v, wg)
        uv, z, vis = project_landmarks(gt_pose7(t, sp), ex, pts_w)
        uv, z, vis = np.asarray(uv), np.asarray(z), np.asarray(vis)
        if pix_noise > 0:
            uv = uv + rng.normal(0, pix_noise, uv.shape)
        keep_ids = np.nonzero(vis)[0]
        if drop_feats is not None:
            frac = float(drop_feats(k))
            keep_ids = keep_ids[: max(0, int(round(frac * len(keep_ids))))]
        feats = {
            int(i): FrameFeature(
                x=float(uv[i, 0]), y=float(uv[i, 1]),
                depth=float(z[i]) if with_depth else 0.0,
            )
            for i in keep_ids
        }
        est.input_frame(t, feats)
        gt.append((t, np.asarray(gt_pose7(t, sp))))
    if burst:
        est.flush_burst()
    return est, dict(gt)


@pytest.mark.slow
def test_e2e_vio_wheel_ate():
    est, gt = run_pipeline(n_frames=35, pix_noise=0.0)
    assert len(est.trajectory) >= 20, "estimator never left initialization"
    est_xyz = np.stack([p[0:3] for _, p in est.trajectory])
    gt_xyz = np.stack([gt[t][0:3] for t, _ in est.trajectory])
    ate = ate_rmse(est_xyz, gt_xyz)
    assert ate < 0.05, f"ATE {ate:.4f} m on exact measurements"


def test_e2e_vio_wheel_smoke():
    """Default-gate smoke of the slow VIO+wheel replay (VERDICT r3 weak #7:
    one true end-to-end path per subsystem inside the fast suite): shorter
    sequence, same correctness bound."""
    est, gt = run_pipeline(n_frames=18, pix_noise=0.0)
    assert len(est.trajectory) >= 5, "estimator never left initialization"
    est_xyz = np.stack([p[0:3] for _, p in est.trajectory])
    gt_xyz = np.stack([gt[t][0:3] for t, _ in est.trajectory])
    ate = ate_rmse(est_xyz, gt_xyz)
    assert ate < 0.05, f"smoke ATE {ate:.4f} m"


def test_e2e_gnss_smoke():
    """Default-gate smoke of the tight-GNSS replay: alignment + active
    psr/dopp factors on a shortened sequence."""
    _run_gnss_pipeline(n_frames=24, epoch_every=3)


def _no_wheel_cfg(use_depth: bool):
    """No wheel + the stationary gate closed — forces init through the
    visual-SfM path (estimator.cpp:1712-1847), the reference's primary mode
    for mono/RGBD+IMU rigs (VERDICT r2 missing #1)."""
    import dataclasses

    cfg = Config()
    # the visual init converts SfM camera rotations to body rotations through
    # q_ic, so the config extrinsic must match the sim's body_T_cam (the
    # wheel/stationary paths never consult camera orientation, which is why
    # the other E2E tests get away with the identity default)
    q_ic = tuple(float(v) for v in np.asarray(body_T_cam(DT))[3:7])
    return dataclasses.replace(
        cfg,
        use_depth=use_depth,
        wheel=dataclasses.replace(cfg.wheel, enabled=False),
        init=dataclasses.replace(cfg.init, stationary_acc_var=0.0),
        camera=dataclasses.replace(cfg.camera, q_ic=q_ic),
        # dense enough tracks that the pivot search finds ≥20 correspondences
        # (relativePose demands 20 corr + 30/460 parallax)
        solver=dataclasses.replace(cfg.solver, max_landmarks=256),
    )


def test_e2e_visual_init_rgbd_short():
    """Short RGBD+IMU (no wheel) replay in the DEFAULT test selection: the
    estimator must initialize via SfM + depth linear alignment and track."""
    est, gt = run_pipeline(n_frames=16, cfg=_no_wheel_cfg(use_depth=True),
                           n_landmarks=600)
    assert len(est.trajectory) >= 4, "visual-SfM initialization never fired"
    est_xyz = np.stack([p[0:3] for _, p in est.trajectory])
    gt_xyz = np.stack([gt[t][0:3] for t, _ in est.trajectory])
    ate = ate_rmse(est_xyz, gt_xyz)
    assert ate < 0.08, f"ATE {ate:.4f} m (visual init, RGBD, exact meas)"


@pytest.mark.slow
def test_e2e_visual_init_rgbd_ate():
    est, gt = run_pipeline(n_frames=35, cfg=_no_wheel_cfg(use_depth=True),
                           n_landmarks=600)
    assert len(est.trajectory) >= 20
    est_xyz = np.stack([p[0:3] for _, p in est.trajectory])
    gt_xyz = np.stack([gt[t][0:3] for t, _ in est.trajectory])
    ate = ate_rmse(est_xyz, gt_xyz)
    assert ate < 0.05, f"ATE {ate:.4f} m (visual init, RGBD)"


@pytest.mark.slow
def test_e2e_visual_init_mono_ate():
    """Mono+IMU (no wheel, no depth): scale must come out of the mono linear
    alignment (LinearAlignment, initial_aligment.cpp:199-280)."""
    est, gt = run_pipeline(n_frames=35, with_depth=False,
                           cfg=_no_wheel_cfg(use_depth=False), n_landmarks=600)
    assert len(est.trajectory) >= 20, "mono visual init never fired"
    est_xyz = np.stack([p[0:3] for _, p in est.trajectory])
    gt_xyz = np.stack([gt[t][0:3] for t, _ in est.trajectory])
    ate = ate_rmse(est_xyz, gt_xyz)
    assert ate < 0.12, f"ATE {ate:.4f} m (visual init, mono)"


@pytest.mark.slow
def test_e2e_vio_wheel_ate_noisy():
    est, gt = run_pipeline(n_frames=35, pix_noise=1.5 / 460.0)
    est_xyz = np.stack([p[0:3] for _, p in est.trajectory])
    gt_xyz = np.stack([gt[t][0:3] for t, _ in est.trajectory])
    ate = ate_rmse(est_xyz, gt_xyz)
    assert ate < 0.15, f"ATE {ate:.4f} m with 1.5px noise"


def _run_gnss_pipeline(burst=0, epoch_every=1, n_frames=30, outage=None):
    """GNSS-enabled E2E: synthetic satellites + pseudorange/Doppler epochs;
    the pipeline must align (yaw/anchor) and keep ATE low with the GNSS
    factor stack active. ``burst``: enable chunked replay (auto-flushes
    around epochs); ``epoch_every``: frames between GNSS epochs;
    ``outage``: optional (k0, k1) frame range with NO epochs — the
    tunnel/canyon outage + re-acquisition scenario."""
    import dataclasses

    from ground_fusion_tpu.gnss.coords import (
        EARTH_OMG, LIGHT_SPEED, ecef2geo, ecef2rotation, enu2ecef, geo2ecef,
        sat_azel,
    )
    from ground_fusion_tpu.gnss.ephemeris import saastamoinen_tropo
    from ground_fusion_tpu.sim.synthetic import gt_velocity

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, gnss=dataclasses.replace(cfg.gnss, enabled=True, track_num_thresh=1)
    )
    sp = SimParams()
    est = Estimator(cfg, dtype=DT)
    if burst:
        est.enable_burst(burst)
    ex = body_T_cam(DT)
    pts_w = jnp.asarray(make_landmarks(200, sp, seed=1), DT)

    # GNSS world: anchor + ENU-local yaw
    anc_true = geo2ecef(np.array([np.deg2rad(31.0), np.deg2rad(121.4), 12.0]))
    yaw_true = 0.25
    R_el = ecef2rotation(anc_true)
    cy, sy = np.cos(yaw_true), np.sin(yaw_true)
    R = R_el @ np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1.0]])
    rng = np.random.default_rng(3)
    sats = []
    for k in range(10):
        az = rng.uniform(0, 2 * np.pi)
        el = rng.uniform(np.deg2rad(35), np.deg2rad(80))
        sats.append(enu2ecef(anc_true, 2.2e7 * np.array(
            [np.cos(el) * np.sin(az), np.cos(el) * np.cos(az), np.sin(el)])))
    sats = np.stack(sats)
    sat_vel = rng.normal(0, 2500, (10, 3))
    dt_true = np.array([15.0, 0.0, 0.0, 22.0])
    ddt_true = 4.0

    # NOTE: the local world of the estimator differs from the sim GT frame by
    # the init gauge (first pose at origin). The GNSS epochs must be generated
    # in the TRUE physical frame: P_ecef from the sim GT pose mapped through
    # (anc_true, yaw_true) ∘ T_gt0⁻¹ so that frame 0 sits at the local origin.
    from ground_fusion_tpu.geometry.se3 import pose_compose, pose_inverse, pose_apply

    T0_inv = pose_inverse(gt_pose7(0.0, sp))

    def epoch_for(t):
        Tk = gt_pose7(t, sp)
        p_local = np.asarray(pose_apply(T0_inv, Tk[0:3]))
        # velocity in the local frame
        v_world = np.asarray(gt_velocity(t, sp))
        from ground_fusion_tpu.geometry.so3 import quat_to_mat
        R0 = np.asarray(quat_to_mat(T0_inv[3:7]))
        v_local = R0 @ v_world
        P = anc_true + R @ p_local
        V = R @ v_local
        obs = []
        for j in range(10):
            sp_, sv = sats[j], sat_vel[j]
            rng_vec = sp_ - P
            rngn = np.linalg.norm(rng_vec)
            unit = rng_vec / rngn
            sagnac = EARTH_OMG * (sp_[0] * P[1] - sp_[1] * P[0]) / LIGHT_SPEED
            sys = (j % 2) * 3
            # real pseudoranges carry tropospheric delay — generate it with
            # the same model the factor subtracts so the full path is tested
            _, el = sat_azel(P, sp_)
            tropo = saastamoinen_tropo(ecef2geo(P), el)
            d_sagnac = EARTH_OMG / LIGHT_SPEED * (
                sv[0] * P[1] + sp_[0] * V[1] - sv[1] * P[0] - sp_[1] * V[0])
            dopp_est = np.dot(sv - V, unit) + d_sagnac + ddt_true
            obs.append(dict(
                sat=j, sys=sys, sat_pos=sp_, sat_vel=sv,
                psr=rngn + sagnac + dt_true[sys] + tropo, dopp_wl=-dopp_est,
                dopp=-dopp_est, svdt=0.0, svddt=0.0, tgd=0.0,
                psr_std=0.1, dopp_std=0.1, ura=2.0,
            ))
        return obs

    frame_dt = 1.0 / sp.frame_rate
    imu_dt = 1.0 / sp.imu_rate
    wheel_dt = 1.0 / sp.wheel_rate
    t0 = 0.0
    a, g = np.asarray(imu_sample(t0, sp), dtype=np.float64)
    est.input_imu(t0, a, g)
    v, wg = np.asarray(wheel_sample(t0, sp), dtype=np.float64)
    est.input_wheel(t0, v, wg)

    gt = {}
    for k in range(n_frames):
        t = t0 + k * frame_dt
        if k > 0:
            tp = t - frame_dt
            for ti in np.arange(tp + imu_dt, t + 0.5 * imu_dt, imu_dt):
                a, g = np.asarray(imu_sample(ti, sp), dtype=np.float64)
                est.input_imu(float(ti), a, g)
            for ti in np.arange(tp + wheel_dt, t + 0.5 * wheel_dt, wheel_dt):
                v, wg = np.asarray(wheel_sample(ti, sp), dtype=np.float64)
                est.input_wheel(float(ti), v, wg)
        # epochs arrive every frame until VI alignment succeeds (alignment
        # needs ≥5 filtered epochs), then at the sparse cadence — the
        # realistic profile of a 1 Hz receiver against a 15 Hz camera
        in_outage = outage is not None and outage[0] <= k < outage[1]
        if (k % epoch_every == 0 or not est.gnss_aligned) and not in_outage:
            est.input_gnss(t, epoch_for(t))
        uv, z, vis = project_landmarks(gt_pose7(t, sp), ex, pts_w)
        uv, z, vis = np.asarray(uv), np.asarray(z), np.asarray(vis)
        feats = {
            int(i): FrameFeature(x=float(uv[i, 0]), y=float(uv[i, 1]),
                                 depth=float(z[i]))
            for i in np.nonzero(vis)[0]
        }
        est.input_frame(t, feats)
        gt[t] = np.asarray(gt_pose7(t, sp))
    if burst:
        est.flush_burst()

    assert est.gnss_aligned, "GNSS-VI alignment never triggered"
    assert len(est.trajectory) >= min(15, n_frames - 14)
    est_xyz = np.stack([p[0:3] for _, p in est.trajectory])
    gt_xyz = np.stack([gt[t][0:3] for t, _ in est.trajectory])
    ate = ate_rmse(est_xyz, gt_xyz)
    assert ate < 0.1, f"ATE {ate:.4f} m with GNSS enabled"
    # the REAL global-frame check: estimator (anchor, yaw_enu, local pose)
    # must map the newest pose to the true ECEF position — yaw_enu itself
    # absorbs whatever local gauge the init picked, so compare in ECEF
    yaw_est = float(np.asarray(est.core.state.yaw_enu))
    anc_est = np.asarray(est.anchor_ecef())
    cye, sye = np.cos(yaw_est), np.sin(yaw_est)
    R_est = ecef2rotation(anc_est) @ np.array(
        [[cye, -sye, 0], [sye, cye, 0], [0, 0, 1.0]])
    t_last, p_last = est.trajectory[-1]
    p_ecef_est = anc_est + R_est @ p_last[0:3]
    Tk = gt_pose7(t_last, sp)
    p_local_true = np.asarray(pose_apply(T0_inv, Tk[0:3]))
    p_ecef_true = anc_true + R @ p_local_true
    ecef_err = np.linalg.norm(p_ecef_est - p_ecef_true)
    assert ecef_err < 1.0, f"ECEF position error {ecef_err:.2f} m"
    # stash the metrics for external harnesses (scripts/parity_tpu.py)
    est.last_ate = ate
    est.last_ecef_err = float(ecef_err)
    return est


@pytest.mark.slow
def test_e2e_vio_wheel_gnss():
    _run_gnss_pipeline()


@pytest.mark.slow
def test_e2e_vio_wheel_gnss_burst():
    """Same GNSS replay in burst mode: epochs every 5th frame, so staged
    chunks form between the host-interactive epoch frames and the GNSS
    factor stack stays active through scanned steps. Same ATE/ECEF bounds."""
    est = _run_gnss_pipeline(burst=6, epoch_every=5)
    # staging actually happened (not a pure per-frame fallback): at least one
    # flushed chunk covered multiple frames in a single device dispatch
    assert est._burst_flushed_sizes, "no burst chunks were ever flushed"
    assert max(est._burst_flushed_sizes) > 1, (
        f"all chunks were single-frame: {est._burst_flushed_sizes}")


def test_keyframe_decision_parity():
    """addFeatureCheckParallax gates (feature_manager.cpp:57-116): continuity
    gates force a keyframe; otherwise the decision is mean parallax between
    the second- and third-last frames, not the newest pair."""
    import jax.numpy as jnp2

    cfg = Config()
    est = Estimator(cfg, dtype=DT)
    f, ml = est.f, cfg.solver.max_landmarks
    n = 60

    def install(par_23=0.0, par_12=0.0, nobs=6):
        """n tracked features; parallax par_23 between slots F-3/F-2 and
        par_12 between F-2/F-1 (the latter must NOT drive the decision)."""
        tr = est.core.tracks
        ov = np.zeros((ml, f), bool)
        obs = np.zeros((ml, f, 5))
        for s in range(n):
            ov[s, f - nobs:] = True
            obs[s, :, 0] = 0.1
            obs[s, f - 2, 0] = 0.1 + par_23
            obs[s, f - 1, 0] = 0.1 + par_23 + par_12
        est.core = est.core._replace(tracks=tr._replace(
            obs=jnp2.asarray(obs, DT), obs_valid=jnp2.asarray(ov),
            active=jnp2.asarray(np.arange(ml) < n),
        ))
        est.slot_of = {fid: fid for fid in range(n)}
        feats = {fid: FrameFeature(x=0.1, y=0.0) for fid in range(n)}
        est._prev_feats = dict(feats)
        return feats

    thr = cfg.solver.keyframe_parallax_px / cfg.solver.focal

    # (a) weak continuity: < 20 tracked → keyframe
    feats = install()
    assert est._keyframe_decision({fid: feats[fid] for fid in range(10)})
    # (b) > 50% new features → keyframe
    many_new = dict(feats)
    many_new.update({1000 + k: FrameFeature(x=0.0, y=0.0) for k in range(40)})
    assert est._keyframe_decision(many_new)
    # (c) long-track starvation (obs counts < 4) → keyframe
    feats = install(nobs=2)
    assert est._keyframe_decision(feats)
    # (d) healthy tracking + sub-threshold parallax at (F-3, F-2) → NOT a
    # keyframe, even with huge newest-pair parallax (the old-slot pair is
    # what the reference measures)
    feats = install(par_23=0.2 * thr, par_12=50.0 * thr)
    assert not est._keyframe_decision(feats)
    # (e) super-threshold parallax at (F-3, F-2) → keyframe
    feats = install(par_23=2.0 * thr)
    assert est._keyframe_decision(feats)
