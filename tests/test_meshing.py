"""TSDF fusion + surface-nets extraction against an analytic surface."""

import numpy as np

from ground_fusion_tpu.global_layers.meshing import TsdfVolume, write_mesh_ply


def _render_sphere_depth(w, h, fx, fy, cx, cy, center_c, radius):
    """Ray-cast a sphere (center in camera frame) → depth image (z-depth)."""
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    dirs = np.stack([(u - cx) / fx, (v - cy) / fy, np.ones_like(u, float)], -1)
    # solve |t*d - c|² = r² for smallest positive t, then z = t * d_z = t
    b = -2 * dirs @ center_c
    a = np.sum(dirs * dirs, axis=-1)
    cc = center_c @ center_c - radius**2
    disc = b * b - 4 * a * cc
    t = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0.0))) / (2 * a), 0.0)
    return np.where((disc > 0) & (t > 0.1), t, 0.0)


def test_tsdf_sphere_mesh(tmp_path):
    w = h = 120
    fx = fy = 100.0
    cx, cy = 60.0, 60.0
    radius = 0.5
    vol = TsdfVolume(origin=(-1.0, -1.0, -1.0), size_m=2.0, resolution=64,
                     depth_max=5.0)

    # 4 views: camera on a circle of radius 2 around the origin, looking at
    # the sphere at the world origin. Build poses directly: camera z-axis
    # points from cam position toward origin.
    for ang in np.linspace(0, 2 * np.pi, 4, endpoint=False):
        cam_pos = 2.0 * np.array([np.cos(ang), np.sin(ang), 0.0])
        z_axis = -cam_pos / np.linalg.norm(cam_pos)
        x_axis = np.cross(np.array([0.0, 0.0, 1.0]), z_axis)
        x_axis /= np.linalg.norm(x_axis)
        y_axis = np.cross(z_axis, x_axis)
        R_wc = np.stack([x_axis, y_axis, z_axis], axis=1)
        # quaternion from R (w,x,y,z) via trace method
        tr = np.trace(R_wc)
        qw = np.sqrt(max(tr + 1.0, 1e-12)) / 2
        qx = (R_wc[2, 1] - R_wc[1, 2]) / (4 * qw)
        qy = (R_wc[0, 2] - R_wc[2, 0]) / (4 * qw)
        qz = (R_wc[1, 0] - R_wc[0, 1]) / (4 * qw)
        pose = np.concatenate([cam_pos, [qw, qx, qy, qz]])

        center_c = R_wc.T @ (np.zeros(3) - cam_pos)
        depth = _render_sphere_depth(w, h, fx, fy, cx, cy, center_c, radius)
        color = np.full((h, w, 3), 200.0)
        vol.integrate(depth, color, pose, fx, fy, cx, cy)

    verts, cols, tris = vol.extract_mesh(min_weight=1.0)
    assert len(verts) > 200
    assert len(tris) > 200
    r = np.linalg.norm(verts, axis=1)
    # extracted vertices sit on the sphere within ~1.5 voxels
    err = np.abs(r - radius)
    assert np.median(err) < 1.5 * vol.voxel, np.median(err)
    # faces index valid vertices
    assert tris.min() >= 0 and tris.max() < len(verts)
    # colors fused from the input
    assert np.median(cols) > 100

    out = tmp_path / "mesh.ply"
    write_mesh_ply(str(out), verts, cols, tris)
    head = out.read_text().splitlines()[:12]
    assert head[0] == "ply" and any("element face" in l for l in head)
