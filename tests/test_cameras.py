"""Camera model round-trips: project(lift(uv)) == uv, lift(project(P)) ∥ P."""

import jax.numpy as jnp
import numpy as np

from ground_fusion_tpu.cameras.models import (
    EquidistantParams,
    MeiParams,
    PinholeParams,
    equidistant_lift_projective,
    equidistant_space_to_plane,
    mei_lift_projective,
    mei_space_to_plane,
    pinhole_lift_projective,
    pinhole_space_to_plane,
)

F64 = jnp.float64


def grid_uv(w=640, h=480, margin=60, n=9):
    us = np.linspace(margin, w - margin, n)
    vs = np.linspace(margin, h - margin, n)
    uu, vv = np.meshgrid(us, vs)
    return jnp.asarray(np.stack([uu.ravel(), vv.ravel()], axis=-1), F64)


def test_pinhole_roundtrip():
    cam = PinholeParams.make(460.0, 459.0, 322.0, 238.5, k1=-0.28, k2=0.07, p1=2e-4, p2=-2e-5, dtype=F64)
    uv = grid_uv()
    ray = pinhole_lift_projective(cam, uv, iters=20)
    uv2 = pinhole_space_to_plane(cam, ray)
    np.testing.assert_allclose(uv2, uv, atol=1e-6)


def test_pinhole_project_points():
    cam = PinholeParams.make(460.0, 460.0, 320.0, 240.0, dtype=F64)
    pts = jnp.array([[0.0, 0.0, 2.0], [0.5, -0.25, 2.0]], F64)
    uv = pinhole_space_to_plane(cam, pts)
    np.testing.assert_allclose(uv[0], [320.0, 240.0], atol=1e-12)
    np.testing.assert_allclose(uv[1], [320 + 460 * 0.25, 240 - 460 * 0.125], atol=1e-12)


def test_equidistant_roundtrip():
    cam = EquidistantParams.make(380.0, 379.0, 320.0, 240.0, k2=0.01, k3=-0.002, k4=0.0005, k5=0.0, dtype=F64)
    uv = grid_uv()
    ray = equidistant_lift_projective(cam, uv, iters=20)
    uv2 = equidistant_space_to_plane(cam, ray)
    np.testing.assert_allclose(uv2, uv, atol=1e-6)


def test_mei_roundtrip():
    cam = MeiParams.make(0.9, 560.0, 561.0, 321.0, 239.0, k1=-0.1, k2=0.02, dtype=F64)
    uv = grid_uv(margin=100)
    ray = mei_lift_projective(cam, uv, iters=20)
    ray = ray / ray[..., 2:3]
    uv2 = mei_space_to_plane(cam, ray)
    np.testing.assert_allclose(uv2, uv, atol=1e-5)


def test_pinhole_full_roundtrip():
    from ground_fusion_tpu.cameras.models import (
        PinholeFullParams, pinhole_full_lift_projective, pinhole_full_space_to_plane,
    )

    cam = PinholeFullParams.make(460.0, 460.0, 320.0, 240.0,
                                 k1=-0.28, k2=0.07, k3=-0.005, k4=-0.27,
                                 k5=0.06, k6=-0.004, p1=1e-4, p2=-2e-4,
                                 dtype=jnp.float64)
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-1, 1, 50), rng.uniform(-0.8, 0.8, 50),
                    rng.uniform(2, 6, 50)], -1)
    uv = pinhole_full_space_to_plane(cam, jnp.asarray(pts))
    rays = pinhole_full_lift_projective(cam, uv)
    norm_gt = pts[:, 0:2] / pts[:, 2:3]
    assert np.abs(np.asarray(rays)[:, 0:2] - norm_gt).max() < 1e-8


def test_scaramuzza_matches_reference_formula():
    """Twin check against the exact OCAMCamera::spaceToPlane formula
    (ScaramuzzaCamera.cc:632-653): theta = atan2(-z, norm), Horner inv_poly,
    affine C/D/E + center."""
    from ground_fusion_tpu.cameras.models import (
        ScaramuzzaParams, scaramuzza_space_to_plane,
    )

    inv_poly = np.array([350.0, 150.0, 20.0, 5.0])
    C, D, E = 1.001, 0.002, -0.001
    cx, cy = 320.0, 240.0
    cam = ScaramuzzaParams.make(
        poly=[-250.0, 0.0, 6e-4, 0.0, 0.0], inv_poly=inv_poly,
        c=C, d=D, e=E, cx=cx, cy=cy, dtype=jnp.float64,
    )
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 2.0, (20, 3))
    uv = np.asarray(scaramuzza_space_to_plane(cam, jnp.asarray(pts)))
    for P, got in zip(pts, uv):
        norm = np.hypot(P[0], P[1])
        theta = np.arctan2(-P[2], norm)
        rho = sum(c * theta**i for i, c in enumerate(inv_poly))
        xn = P[0] / norm * rho
        yn = P[1] / norm * rho
        exp_u = xn * C + yn * D + cx
        exp_v = xn * E + yn + cy
        assert abs(got[0] - exp_u) < 1e-9 and abs(got[1] - exp_v) < 1e-9


def test_make_camera_dispatch_roundtrip():
    """CameraFactory analog (CameraFactory.cc:32-93): every model string
    builds a CameraModel whose project∘lift is identity on the image."""
    import numpy as np

    from ground_fusion_tpu.cameras.models import make_camera

    rng = np.random.default_rng(0)
    uv = jnp.asarray(rng.uniform([100, 80], [540, 400], (64, 2)), F64)
    cases = [
        ("pinhole", (-0.28, 0.07, 2e-4, -2e-5)),
        ("pinhole_full", (-0.3, 0.09, 1e-3, -2e-4, 0.0, 0.0, 2e-4, -1e-4)),
        ("mei", (0.9, -0.2, 0.05, 1e-4, -1e-4)),
        ("equidistant", (-0.01, 0.004, -0.002, 0.0005)),
    ]
    for name, dist in cases:
        cam = make_camera(name, 460.0, 459.0, 320.0, 240.0, dist, dtype=F64)
        assert cam.name.startswith(name.split("_")[0])
        rays = cam.lift_projective(uv)
        rays = rays / rays[..., 2:3]
        uv2 = cam.space_to_plane(rays)
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-3,
                                   err_msg=f"{name} roundtrip")


def test_equidistant_system_e2e():
    """Equidistant-camera synthetic E2E (VERDICT r2 missing #4): features are
    *pixels* distorted through the Kannala-Brandt model; the pipeline must
    undistort them through the dispatched camera and reach point-parity ATE."""
    import numpy as np

    from ground_fusion_tpu.cameras.models import make_camera
    from ground_fusion_tpu.config import Config
    from ground_fusion_tpu.pipeline import Estimator, FrameFeature
    from ground_fusion_tpu.sim.synthetic import (
        SimParams, body_T_cam, gt_pose7, imu_sample, make_landmarks,
        project_landmarks, wheel_sample,
    )
    from ground_fusion_tpu.utils.evaluate import ate_rmse

    import dataclasses

    cfg = Config()
    cfg = dataclasses.replace(cfg, camera=dataclasses.replace(
        cfg.camera, model="equidistant", fx=460.0, fy=460.0, cx=320.0, cy=240.0,
        distortion=(-0.01, 0.004, -0.002, 0.0005)))
    # the dispatched camera — what GroundFusionSystem builds (system.py)
    cam = make_camera(cfg.camera.model, cfg.camera.fx, cfg.camera.fy,
                      cfg.camera.cx, cfg.camera.cy, cfg.camera.distortion,
                      dtype=F64)

    sp = SimParams()
    est = Estimator(cfg, dtype=F64)
    ex = body_T_cam(F64)
    pts_w = jnp.asarray(make_landmarks(200, sp, seed=1), F64)
    frame_dt, imu_dt, wheel_dt = 1.0 / sp.frame_rate, 1.0 / sp.imu_rate, 1.0 / sp.wheel_rate
    t0 = 0.0
    a, g = np.asarray(imu_sample(t0, sp), dtype=np.float64)
    est.input_imu(t0, a, g)
    v, wg = np.asarray(wheel_sample(t0, sp), dtype=np.float64)
    est.input_wheel(t0, v, wg)
    gt = {}
    for k in range(16):
        t = t0 + k * frame_dt
        if k > 0:
            for ti in np.arange(t - frame_dt + imu_dt, t + 0.5 * imu_dt, imu_dt):
                a, g = np.asarray(imu_sample(ti, sp), dtype=np.float64)
                est.input_imu(float(ti), a, g)
            for ti in np.arange(t - frame_dt + wheel_dt, t + 0.5 * wheel_dt, wheel_dt):
                v, wg = np.asarray(wheel_sample(ti, sp), dtype=np.float64)
                est.input_wheel(float(ti), v, wg)
        uv, z, vis = project_landmarks(gt_pose7(t, sp), ex, pts_w)
        # distort to PIXELS through the true equidistant model...
        rays = jnp.concatenate([uv, jnp.ones((uv.shape[0], 1), F64)], -1)
        px = cam.space_to_plane(rays)
        # ...and undistort back through the dispatched model (the tracker path)
        norm = cam.lift_projective(px)
        norm = np.asarray(norm[:, 0:2] / norm[:, 2:3])
        z, vis = np.asarray(z), np.asarray(vis)
        feats = {int(i): FrameFeature(x=float(norm[i, 0]), y=float(norm[i, 1]),
                                      depth=float(z[i]))
                 for i in np.nonzero(vis)[0]}
        est.input_frame(t, feats)
        gt[t] = np.asarray(gt_pose7(t, sp))
    assert len(est.trajectory) >= 4
    est_xyz = np.stack([p[0:3] for _, p in est.trajectory])
    gt_xyz = np.stack([gt[t][0:3] for t, _ in est.trajectory])
    ate = ate_rmse(est_xyz, gt_xyz)
    assert ate < 0.05, f"ATE {ate:.4f} m through the equidistant dispatch"
