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


def run_pipeline(n_frames=35, pix_noise=0.0, with_depth=True, seed=0):
    cfg = Config()
    sp = SimParams(pix_noise=pix_noise, seed=seed)
    est = Estimator(cfg, dtype=DT)
    ex = body_T_cam(DT)
    pts_w = jnp.asarray(make_landmarks(200, sp, seed=seed + 1), DT)
    rng = np.random.default_rng(seed + 7)

    frame_dt = 1.0 / sp.frame_rate
    imu_dt = 1.0 / sp.imu_rate
    wheel_dt = 1.0 / sp.wheel_rate
    t0 = 0.0
    a, g = np.asarray(imu_sample(t0, sp), dtype=np.float64)
    est.input_imu(t0, a, g)
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
            for ti in np.arange(tp + wheel_dt, t + 0.5 * wheel_dt, wheel_dt):
                v, wg = np.asarray(wheel_sample(ti, sp), dtype=np.float64)
                est.input_wheel(float(ti), v, wg)
        uv, z, vis = project_landmarks(gt_pose7(t, sp), ex, pts_w)
        uv, z, vis = np.asarray(uv), np.asarray(z), np.asarray(vis)
        if pix_noise > 0:
            uv = uv + rng.normal(0, pix_noise, uv.shape)
        feats = {
            int(i): FrameFeature(
                x=float(uv[i, 0]), y=float(uv[i, 1]),
                depth=float(z[i]) if with_depth else 0.0,
            )
            for i in np.nonzero(vis)[0]
        }
        est.input_frame(t, feats)
        gt.append((t, np.asarray(gt_pose7(t, sp))))
    return est, dict(gt)


@pytest.mark.slow
def test_e2e_vio_wheel_ate():
    est, gt = run_pipeline(n_frames=35, pix_noise=0.0)
    assert len(est.trajectory) >= 20, "estimator never left initialization"
    est_xyz = np.stack([p[0:3] for _, p in est.trajectory])
    gt_xyz = np.stack([gt[t][0:3] for t, _ in est.trajectory])
    ate = ate_rmse(est_xyz, gt_xyz)
    assert ate < 0.05, f"ATE {ate:.4f} m on exact measurements"


@pytest.mark.slow
def test_e2e_vio_wheel_ate_noisy():
    est, gt = run_pipeline(n_frames=35, pix_noise=1.5 / 460.0)
    est_xyz = np.stack([p[0:3] for _, p in est.trajectory])
    gt_xyz = np.stack([gt[t][0:3] for t, _ in est.trajectory])
    ate = ate_rmse(est_xyz, gt_xyz)
    assert ate < 0.15, f"ATE {ate:.4f} m with 1.5px noise"
