"""Dense voxel color map + occupancy grid tests (pose_graph.cpp:191-244,
grid_mapper.cpp:12-57 semantics)."""

import os

import jax.numpy as jnp
import numpy as np

from ground_fusion_tpu.global_layers.dense_map import (
    OccupancyGrid2D,
    VoxelColorMap,
    sample_rgbd,
)


def test_voxel_map_accumulates_and_gates():
    vm = VoxelColorMap(voxel_size=0.1, capacity=1 << 14)
    rng = np.random.default_rng(0)
    # a dense cluster at (1,1,1) and a single stray point far away
    cluster = 1.0 + rng.normal(0, 0.01, (200, 3))
    stray = np.array([[5.0, 5.0, 5.0]])
    pts = np.concatenate([cluster, stray])
    rgb = np.concatenate([np.tile([200.0, 50.0, 30.0], (200, 1)),
                          [[255.0, 255.0, 255.0]]])
    vm.insert(pts, rgb, np.ones(len(pts), bool))
    centers, colors = vm.export(min_count=3)
    # density gate kills the stray, keeps the cluster voxels
    assert len(centers) >= 1
    assert np.linalg.norm(centers - np.array([1.0, 1.0, 1.0]), axis=1).max() < 0.2
    assert np.abs(colors[0] - np.array([200, 50, 30])).max() < 1.0
    vm.save_ply("/tmp/test_map.ply", min_count=3)
    assert os.path.getsize("/tmp/test_map.ply") > 100


def test_sample_rgbd_gates():
    depth = np.zeros((120, 160), np.float32)
    depth[40:80, 50:110] = 2.0
    color = np.full((120, 160, 3), 128.0, np.float32)
    color[60, 80] = 255.0   # white pixel culled
    gx, gy, d, rgb, ok = sample_rgbd(jnp.asarray(depth), jnp.asarray(color),
                                     stride=4, boundary=20)
    ok = np.asarray(ok)
    d = np.asarray(d)
    assert ok.sum() > 20
    assert np.all(d[ok] == 2.0)


def test_occupancy_grid_rays():
    og = OccupancyGrid2D(size_m=20.0, resolution=0.1)
    sensor = np.array([0.0, 0.0])
    angles = np.linspace(-0.5, 0.5, 32)
    ends = np.stack([3.0 * np.cos(angles), 3.0 * np.sin(angles)], -1)
    for _ in range(5):
        og.update(sensor, ends, np.ones(32, bool))
    p = og.probability()

    def cell(xy):
        return tuple(reversed(((np.asarray(xy) - og.origin) / og.res).astype(int)))

    def patch(xy, r=1):
        cy, cx = cell(xy)
        return p[cy - r : cy + r + 1, cx - r : cx + r + 1]

    # ±1-cell neighborhood: endpoint cell index is quantization-sensitive
    assert patch([3.0, 0.0]).max() > 0.9, "endpoint should be occupied"
    assert patch([1.5, 0.0]).min() < 0.3, "mid-ray should be free"
    assert abs(p[cell([8.0, 8.0])] - 0.5) < 0.05, "unobserved stays unknown"
    og.save_pgm("/tmp/test_grid.pgm")
    assert os.path.getsize("/tmp/test_grid.pgm") > 1000
