"""Camera projection models (camodocal-equivalent surface, batched JAX).

The reference's ``camera_models`` package (``include/camodocal/camera_models/
Camera.h:78-82``) exposes two primitives per model: ``liftProjective`` (pixel ->
normalized ray) and ``spaceToPlane`` (3-D point -> pixel). We reproduce that
surface for the model families Ground-Fusion ships (Pinhole w/ radial-tangential
distortion, PinholeFull, Mei/Cata, Equidistant/fisheye, Scaramuzza) as pure
functions over parameter pytrees so the front-end can ``vmap`` them over feature
batches on the VPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PinholeParams(NamedTuple):
    """fx, fy, cx, cy + radial-tangential distortion (k1, k2, p1, p2)."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    k1: jax.Array
    k2: jax.Array
    p1: jax.Array
    p2: jax.Array

    @staticmethod
    def make(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, dtype=jnp.float32):
        return PinholeParams(*[jnp.asarray(v, dtype=dtype) for v in (fx, fy, cx, cy, k1, k2, p1, p2)])


def _radtan_distort(cam: PinholeParams, xy: jax.Array) -> jax.Array:
    """Apply radial-tangential distortion delta to normalized coords
    (PinholeCamera::distortion, camera_models/src/PinholeCamera.cc)."""
    x, y = xy[..., 0], xy[..., 1]
    x2, y2, xy2 = x * x, y * y, x * y
    r2 = x2 + y2
    rad = cam.k1 * r2 + cam.k2 * r2 * r2
    dx = x * rad + 2.0 * cam.p1 * xy2 + cam.p2 * (r2 + 2.0 * x2)
    dy = y * rad + 2.0 * cam.p2 * xy2 + cam.p1 * (r2 + 2.0 * y2)
    return jnp.stack([dx, dy], axis=-1)


def pinhole_space_to_plane(cam: PinholeParams, pts: jax.Array) -> jax.Array:
    """3-D point in camera frame -> pixel (spaceToPlane)."""
    xy = pts[..., 0:2] / pts[..., 2:3]
    xy_d = xy + _radtan_distort(cam, xy)
    u = cam.fx * xy_d[..., 0] + cam.cx
    v = cam.fy * xy_d[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def pinhole_lift_projective(cam: PinholeParams, uv: jax.Array, iters: int = 8) -> jax.Array:
    """Pixel -> normalized ray [x, y, 1] by fixed-point undistortion
    (PinholeCamera::liftProjective recursive-distortion path)."""
    mx_d = (uv[..., 0] - cam.cx) / cam.fx
    my_d = (uv[..., 1] - cam.cy) / cam.fy
    d = jnp.stack([mx_d, my_d], axis=-1)

    def body(_, u):
        return d - _radtan_distort(cam, u)

    u = jax.lax.fori_loop(0, iters, body, d)
    ones = jnp.ones(u.shape[:-1] + (1,), dtype=u.dtype)
    return jnp.concatenate([u, ones], axis=-1)


class EquidistantParams(NamedTuple):
    """Kannala-Brandt / equidistant fisheye: fx(mu), fy(mv), cx(u0), cy(v0), k2..k5."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    k2: jax.Array
    k3: jax.Array
    k4: jax.Array
    k5: jax.Array

    @staticmethod
    def make(fx, fy, cx, cy, k2=0.0, k3=0.0, k4=0.0, k5=0.0, dtype=jnp.float32):
        return EquidistantParams(*[jnp.asarray(v, dtype=dtype) for v in (fx, fy, cx, cy, k2, k3, k4, k5)])


def _equi_theta_poly(cam: EquidistantParams, theta: jax.Array) -> jax.Array:
    t2 = theta * theta
    return theta * (1.0 + t2 * (cam.k2 + t2 * (cam.k3 + t2 * (cam.k4 + t2 * cam.k5))))


def equidistant_space_to_plane(cam: EquidistantParams, pts: jax.Array) -> jax.Array:
    """(EquidistantCamera::spaceToPlane, camera_models/src/EquidistantCamera.cc)."""
    r = jnp.linalg.norm(pts[..., 0:2], axis=-1)
    theta = jnp.arctan2(r, pts[..., 2])
    d = _equi_theta_poly(cam, theta)
    scale = d / jnp.maximum(r, 1e-12)
    u = cam.fx * scale * pts[..., 0] + cam.cx
    v = cam.fy * scale * pts[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def equidistant_lift_projective(cam: EquidistantParams, uv: jax.Array, iters: int = 10) -> jax.Array:
    """Invert the theta-polynomial with Newton iterations (the reference uses a
    companion-matrix root solve; Newton from theta=d is equivalent here)."""
    mx = (uv[..., 0] - cam.cx) / cam.fx
    my = (uv[..., 1] - cam.cy) / cam.fy
    d = jnp.sqrt(mx * mx + my * my)

    def body(_, theta):
        f = _equi_theta_poly(cam, theta) - d
        t2 = theta * theta
        fp = 1.0 + t2 * (3.0 * cam.k2 + t2 * (5.0 * cam.k3 + t2 * (7.0 * cam.k4 + t2 * 9.0 * cam.k5)))
        return theta - f / jnp.maximum(fp, 1e-12)

    theta = jax.lax.fori_loop(0, iters, body, d)
    scale = jnp.tan(theta) / jnp.maximum(d, 1e-12)
    ones = jnp.ones(mx.shape + (1,), dtype=mx.dtype)
    return jnp.concatenate([jnp.stack([mx * scale, my * scale], axis=-1), ones], axis=-1)


class MeiParams(NamedTuple):
    """Mei (catadioptric) model: xi + radtan + projective (CataCamera.cc)."""

    xi: jax.Array
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    k1: jax.Array
    k2: jax.Array
    p1: jax.Array
    p2: jax.Array

    @staticmethod
    def make(xi, fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, dtype=jnp.float32):
        return MeiParams(*[jnp.asarray(v, dtype=dtype) for v in (xi, fx, fy, cx, cy, k1, k2, p1, p2)])


def mei_space_to_plane(cam: MeiParams, pts: jax.Array) -> jax.Array:
    z = pts[..., 2] + cam.xi * jnp.linalg.norm(pts, axis=-1)
    xy = pts[..., 0:2] / z[..., None]
    ph = PinholeParams(cam.fx, cam.fy, cam.cx, cam.cy, cam.k1, cam.k2, cam.p1, cam.p2)
    xy_d = xy + _radtan_distort(ph, xy)
    u = cam.fx * xy_d[..., 0] + cam.cx
    v = cam.fy * xy_d[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def mei_lift_projective(cam: MeiParams, uv: jax.Array, iters: int = 8) -> jax.Array:
    ph = PinholeParams(cam.fx, cam.fy, cam.cx, cam.cy, cam.k1, cam.k2, cam.p1, cam.p2)
    mx_d = (uv[..., 0] - cam.cx) / cam.fx
    my_d = (uv[..., 1] - cam.cy) / cam.fy
    d = jnp.stack([mx_d, my_d], axis=-1)

    def body(_, u):
        return d - _radtan_distort(ph, u)

    m = jax.lax.fori_loop(0, iters, body, d)
    r2 = jnp.sum(m * m, axis=-1)
    # unproject from the unit sphere (CataCamera::liftProjective)
    xi = cam.xi
    disc = jnp.maximum(1.0 + (1.0 - xi * xi) * r2, 0.0)
    zs = (xi + jnp.sqrt(disc)) / (1.0 + r2)
    z = zs - xi
    ones = jnp.ones(z.shape + (1,), dtype=z.dtype)
    return jnp.concatenate([m * (zs / jnp.maximum(z, 1e-12))[..., None], ones], axis=-1)


class PinholeFullParams(NamedTuple):
    """PinholeFull: rational-polynomial distortion k1..k6 + tangential p1,p2
    (camera_models/src/PinholeFullCamera.cc)."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    k1: jax.Array
    k2: jax.Array
    k3: jax.Array
    k4: jax.Array
    k5: jax.Array
    k6: jax.Array
    p1: jax.Array
    p2: jax.Array

    @staticmethod
    def make(fx, fy, cx, cy, k1=0.0, k2=0.0, k3=0.0, k4=0.0, k5=0.0, k6=0.0,
             p1=0.0, p2=0.0, dtype=jnp.float32):
        return PinholeFullParams(*[jnp.asarray(v, dtype=dtype) for v in
                                   (fx, fy, cx, cy, k1, k2, k3, k4, k5, k6, p1, p2)])


def _rational_distort(cam: PinholeFullParams, xy: jax.Array) -> jax.Array:
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    num = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    den = 1.0 + r2 * (cam.k4 + r2 * (cam.k5 + r2 * cam.k6))
    s = num / jnp.maximum(den, 1e-12)
    xd = x * s + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * s + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def pinhole_full_space_to_plane(cam: PinholeFullParams, pts: jax.Array) -> jax.Array:
    xy = pts[..., 0:2] / pts[..., 2:3]
    d = _rational_distort(cam, xy)
    u = cam.fx * d[..., 0] + cam.cx
    v = cam.fy * d[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def pinhole_full_lift_projective(cam: PinholeFullParams, uv: jax.Array,
                                 iters: int = 10) -> jax.Array:
    """Fixed-point undistortion of the rational model."""
    mx = (uv[..., 0] - cam.cx) / cam.fx
    my = (uv[..., 1] - cam.cy) / cam.fy
    d = jnp.stack([mx, my], axis=-1)

    def body(_, u):
        return u + (d - _rational_distort(cam, u))

    u = jax.lax.fori_loop(0, iters, body, d)
    ones = jnp.ones(u.shape[:-1] + (1,), dtype=u.dtype)
    return jnp.concatenate([u, ones], axis=-1)


class ScaramuzzaParams(NamedTuple):
    """Scaramuzza omnidirectional model (OCamCalib): cam2world polynomial
    ``poly`` (deg 4), world2cam inverse polynomial ``inv_poly`` (deg N),
    affine c,d,e + center (camera_models OCAMCamera)."""

    poly: jax.Array       # [5]  a0..a4 (a1 = 0 by convention)
    inv_poly: jax.Array   # [K]
    c: jax.Array
    d: jax.Array
    e: jax.Array
    cx: jax.Array
    cy: jax.Array

    @staticmethod
    def make(poly, inv_poly, c=1.0, d=0.0, e=0.0, cx=0.0, cy=0.0, dtype=jnp.float32):
        return ScaramuzzaParams(
            jnp.asarray(poly, dtype), jnp.asarray(inv_poly, dtype),
            *[jnp.asarray(v, dtype) for v in (c, d, e, cx, cy)],
        )


def scaramuzza_space_to_plane(cam: ScaramuzzaParams, pts: jax.Array) -> jax.Array:
    """world2cam: theta (from optical axis) -> rho via inverse polynomial."""
    norm = jnp.linalg.norm(pts[..., 0:2], axis=-1)
    theta = jnp.arctan2(-pts[..., 2], jnp.maximum(norm, 1e-12))
    rho = jnp.zeros_like(theta)
    for k in range(cam.inv_poly.shape[0] - 1, -1, -1):
        rho = rho * theta + cam.inv_poly[k]
    u = pts[..., 0] / jnp.maximum(norm, 1e-12) * rho
    v = pts[..., 1] / jnp.maximum(norm, 1e-12) * rho
    x = u * cam.c + v * cam.d + cam.cx
    y = u * cam.e + v + cam.cy
    return jnp.stack([x, y], axis=-1)


_OCAM_FLIP = (1.0, -1.0, -1.0)   # 180° about x: pipeline z-forward ↔ OCam −z


def scaramuzza_space_to_plane_zfwd(cam: ScaramuzzaParams, pts: jax.Array) -> jax.Array:
    """Scaramuzza projection of z-FORWARD camera-frame points — the frame
    every other model (and the tracker/estimator pipeline) uses. The OCam
    math itself looks along −z (``theta = atan2(-z, norm)``,
    ScaramuzzaCamera.cc:632-653), so bridge with a 180° rotation about x."""
    return scaramuzza_space_to_plane(cam, pts * jnp.asarray(_OCAM_FLIP, pts.dtype))


def scaramuzza_lift_projective(cam: ScaramuzzaParams, uv: jax.Array) -> jax.Array:
    """cam2world: invert the affine, evaluate the forward polynomial → ray in
    the pipeline's z-forward frame. The OCam-frame ray is ``(u, v, −z(ρ))``
    (ScaramuzzaCamera.cc liftProjective); applying the same 180°-about-x
    bridge as :func:`scaramuzza_space_to_plane_zfwd` gives ``(u, −v, z)``, so
    ``project_zfwd ∘ lift`` is the identity by construction (the pair is
    mutually consistent in ONE frame — the earlier sign-normalized variant
    silently reversed rays for models whose poly keeps z > 0)."""
    inv_det = 1.0 / jnp.maximum(cam.c - cam.d * cam.e, 1e-12)
    xp = uv[..., 0] - cam.cx
    yp = uv[..., 1] - cam.cy
    u = inv_det * (xp - cam.d * (yp))
    v = inv_det * (-cam.e * xp + cam.c * yp)
    rho = jnp.sqrt(u * u + v * v)
    z = jnp.zeros_like(rho)
    for k in range(cam.poly.shape[0] - 1, -1, -1):
        z = z * rho + cam.poly[k]
    ray = jnp.stack([u, -v, z], axis=-1)
    return ray / jnp.maximum(jnp.abs(ray[..., 2:3]), 1e-12) * jnp.sign(ray[..., 2:3])


# ---------------------------------------------------------------------------
# Factory (CameraFactory.cc:32-93 analog)
# ---------------------------------------------------------------------------


class CameraModel(NamedTuple):
    """A dispatched camera: parameter pytree + the two camodocal primitives
    (``liftProjective`` / ``spaceToPlane``) bound for it. Built by
    :func:`make_camera` from the config's model string, the analog of
    ``camodocal::CameraFactory::generateCamera`` (CameraFactory.cc:32-93)."""

    name: str
    params: NamedTuple
    lift: object       # (params, uv [...,2]) -> ray [...,3]
    project: object    # (params, pts [...,3]) -> uv [...,2]

    def lift_projective(self, uv):
        return self.lift(self.params, uv)

    def space_to_plane(self, pts):
        return self.project(self.params, pts)


def make_camera(model: str, fx: float, fy: float, cx: float, cy: float,
                distortion=(), dtype=jnp.float32) -> CameraModel:
    """Build the camera selected by ``cfg.camera.model``.

    Distortion-tuple layout per model (mirrors the per-model YAML blocks the
    reference's CameraFactory parses):
      pinhole       k1, k2, p1, p2
      pinhole_full  k1..k6, p1, p2
      mei           xi, k1, k2, p1, p2
      equidistant   k2, k3, k4, k5        (Kannala-Brandt)
      scaramuzza    a0..a4 (cam2world poly), then the world2cam inv_poly
    """
    m = model.lower().replace("-", "_")
    d = tuple(float(v) for v in distortion)

    def pad(n):
        return d + (0.0,) * (n - len(d))

    if m in ("pinhole", "radtan"):
        params = PinholeParams.make(fx, fy, cx, cy, *pad(4)[:4], dtype=dtype)
        return CameraModel("pinhole", params, pinhole_lift_projective,
                           pinhole_space_to_plane)
    if m in ("pinhole_full", "pinholefull"):
        params = PinholeFullParams.make(fx, fy, cx, cy, *pad(8)[:8], dtype=dtype)
        return CameraModel("pinhole_full", params, pinhole_full_lift_projective,
                           pinhole_full_space_to_plane)
    if m in ("mei", "cata", "catadioptric"):
        xi, k1, k2, p1, p2 = pad(5)[:5]
        params = MeiParams.make(xi, fx, fy, cx, cy, k1, k2, p1, p2, dtype=dtype)
        return CameraModel("mei", params, mei_lift_projective, mei_space_to_plane)
    if m in ("equidistant", "kannala_brandt", "fisheye"):
        params = EquidistantParams.make(fx, fy, cx, cy, *pad(4)[:4], dtype=dtype)
        return CameraModel("equidistant", params, equidistant_lift_projective,
                           equidistant_space_to_plane)
    if m in ("scaramuzza", "ocam"):
        poly = pad(5)[:5]
        inv_poly = d[5:] if len(d) > 5 else (fx,)   # rho ≈ f·theta fallback
        params = ScaramuzzaParams.make(poly, inv_poly, cx=cx, cy=cy, dtype=dtype)
        # bind the z-forward pair so project ∘ lift = id in the same frame
        # convention as every other dispatched model
        return CameraModel("scaramuzza", params, scaramuzza_lift_projective,
                           scaramuzza_space_to_plane_zfwd)
    raise ValueError(f"unknown camera model {model!r}")
