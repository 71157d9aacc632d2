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
