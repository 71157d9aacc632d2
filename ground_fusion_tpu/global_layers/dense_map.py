"""Dense RGBD color mapping + 2-D occupancy grid, as device scatters.

Re-design of the dense_map node's mapping path (``pose_graph_node.cpp:598-624``
RGBD sampling with stride/margins/depth gates; ``pose_graph.cpp:191-244``
density-gated octree insertion + radius outlier removal; ``support_files/
grid_mapping/grid_mapper.cpp:12-57`` log-odds inverse sensor model): the octree
becomes a fixed-capacity voxel hash accumulated with one ``scatter-add`` per
keyframe (counts + color sums), density/outlier gates become count thresholds
at export, and the occupancy grid is a batched ray-march scatter. PCD/PLY
export included; Poisson/MLS surface meshing is delegated to offline tools
(the reference also runs it offline on the saved cloud,
``pose_graph_node.cpp:133-318``)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.se3 import pose_apply


def sample_rgbd(depth: jax.Array, color: jax.Array, stride: int = 4,
                boundary: int = 20, d_min: float = 0.1, d_max: float = 7.0):
    """Strided RGBD sampling (pose_graph_node.cpp:598-624): every ``stride``
    px inside the boundary margins, depth-gated, white-pixel culled. Returns
    (pts_cam [N,3], rgb [N,3], valid [N]) at fixed N = grid size."""
    h, w = depth.shape
    ys = jnp.arange(boundary, h - boundary, stride)
    xs = jnp.arange(boundary, w - boundary, stride)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    gy, gx = gy.reshape(-1), gx.reshape(-1)
    d = depth[gy, gx]
    rgb = color[gy, gx]
    ok = (d > d_min) & (d < d_max) & ~jnp.all(rgb > 250, axis=-1)
    # normalized-plane ray assumes rectified coords are produced upstream;
    # here depth image is aligned so pixel → cam via intrinsics happens in
    # the caller (we return pixel + depth and let the camera model lift)
    return gx, gy, d, rgb, ok


class VoxelColorMap:
    """Fixed-capacity voxel-hash color accumulator.

    Divergence note: the reference uses a PCL color octree with per-point
    density gating (``getVoxelDensityAtPoint < 3``); a modular hash with
    scatter-add accumulation is the branch-free analog — rare hash collisions
    blend colors of distinct voxels instead of erroring, and the density gate
    is applied at export as a minimum-count filter."""

    def __init__(self, voxel_size: float = 0.05, capacity: int = 1 << 20,
                 dtype=jnp.float32):
        self.voxel_size = voxel_size
        self.capacity = capacity
        self.counts = jnp.zeros((capacity,), jnp.int32)
        self.color_sum = jnp.zeros((capacity, 3), dtype)
        self.pos_sum = jnp.zeros((capacity, 3), dtype)

    @staticmethod
    @partial(jax.jit, static_argnames=("capacity",))
    def _insert(counts, color_sum, pos_sum, pts_w, rgb, valid,
                voxel_size: float, capacity: int):
        v = jnp.floor(pts_w / voxel_size).astype(jnp.int32)
        # FNV-style integer hash of the voxel triple
        h = (v[:, 0] * 73856093) ^ (v[:, 1] * 19349663) ^ (v[:, 2] * 83492791)
        idx = jnp.abs(h) % capacity
        w = valid.astype(jnp.int32)
        counts = counts.at[idx].add(w)
        wf = valid.astype(color_sum.dtype)[:, None]
        color_sum = color_sum.at[idx].add(rgb.astype(color_sum.dtype) * wf)
        pos_sum = pos_sum.at[idx].add(pts_w.astype(pos_sum.dtype) * wf)
        return counts, color_sum, pos_sum

    def insert(self, pts_w, rgb, valid):
        self.counts, self.color_sum, self.pos_sum = self._insert(
            self.counts, self.color_sum, self.pos_sum,
            jnp.asarray(pts_w), jnp.asarray(rgb), jnp.asarray(valid),
            self.voxel_size, self.capacity,
        )

    def clear(self) -> None:
        """Drop all accumulated voxels — the rebuild-after-loop reset
        (``updatePath``'s ``octree->deleteTree(); cloud->clear()``,
        pose_graph.cpp:875-930)."""
        self.counts = jnp.zeros_like(self.counts)
        self.color_sum = jnp.zeros_like(self.color_sum)
        self.pos_sum = jnp.zeros_like(self.pos_sum)

    def export(self, min_count: int = 3):
        """Occupied voxels passing the density gate → (centers [M,3],
        colors [M,3]) — the radius-outlier analog (pose_graph.cpp:228-239)."""
        counts = np.asarray(self.counts)
        keep = counts >= min_count
        c = counts[keep][:, None].astype(np.float64)
        centers = np.asarray(self.pos_sum)[keep] / c
        colors = np.asarray(self.color_sum)[keep] / c
        return centers, colors

    def save_ply(self, path: str, min_count: int = 3):
        """ASCII PLY export (the 'd'-key PCD dump analog,
        pose_graph_node.cpp:733-743)."""
        pts, cols = self.export(min_count)
        write_cloud_ply(path, pts, cols)


def write_cloud_ply(path: str, pts: np.ndarray, cols: np.ndarray) -> None:
    with open(path, "w") as fp:
        fp.write("ply\nformat ascii 1.0\n")
        fp.write(f"element vertex {len(pts)}\n")
        fp.write("property float x\nproperty float y\nproperty float z\n")
        fp.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        fp.write("end_header\n")
        for p, c in zip(pts, cols):
            r, g, b = np.clip(c, 0, 255).astype(int)
            fp.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} {r} {g} {b}\n")


class OccupancyGrid2D:
    """Log-odds 2-D occupancy grid (grid_mapper.cpp:12-57): each beam marches
    fixed steps from sensor to endpoint scattering `l_free`, endpoint cell
    gets `l_occ`; clamped log-odds."""

    def __init__(self, size_m: float = 50.0, resolution: float = 0.05,
                 l_occ: float = 0.85, l_free: float = -0.4,
                 l_min: float = -2.0, l_max: float = 3.5):
        self.res = resolution
        self.n = int(size_m / resolution)
        self.logodds = jnp.zeros((self.n, self.n), jnp.float32)
        self.l_occ, self.l_free = l_occ, l_free
        self.l_min, self.l_max = l_min, l_max
        self.origin = np.array([-size_m / 2, -size_m / 2])

    @staticmethod
    @partial(jax.jit, static_argnames=("n", "steps"))
    def _update(logodds, origin_xy, res, sensor_xy, ends_xy, valid,
                l_occ, l_free, l_min, l_max, n: int, steps: int = 128):
        # free-space ray march: `steps` samples strictly inside each beam
        alphas = (jnp.arange(1, steps + 1) / (steps + 1))[None, :, None]
        pts = sensor_xy[None, None, :] + alphas * (ends_xy[:, None, :] - sensor_xy[None, None, :])
        cells = jnp.floor((pts - origin_xy[None, None, :]) / res).astype(jnp.int32)
        cx = jnp.clip(cells[..., 0], 0, n - 1).reshape(-1)
        cy = jnp.clip(cells[..., 1], 0, n - 1).reshape(-1)
        w = jnp.repeat(valid, steps).astype(jnp.float32)
        # scatter-max-1 per beam-cell approximated by scatter-add of the
        # per-sample free update scaled down by samples-per-cell density
        logodds = logodds.at[cy, cx].add(l_free * w / 4.0)
        endc = jnp.floor((ends_xy - origin_xy[None, :]) / res).astype(jnp.int32)
        ex = jnp.clip(endc[:, 0], 0, n - 1)
        ey = jnp.clip(endc[:, 1], 0, n - 1)
        logodds = logodds.at[ey, ex].add(l_occ * valid.astype(jnp.float32))
        return jnp.clip(logodds, l_min, l_max)

    def update(self, sensor_xy, ends_xy, valid):
        self.logodds = self._update(
            self.logodds, jnp.asarray(self.origin, jnp.float32),
            jnp.asarray(self.res, jnp.float32),
            jnp.asarray(sensor_xy, jnp.float32), jnp.asarray(ends_xy, jnp.float32),
            jnp.asarray(valid), self.l_occ, self.l_free, self.l_min, self.l_max,
            self.n,
        )

    def probability(self) -> np.ndarray:
        lo = np.asarray(self.logodds)
        return 1.0 - 1.0 / (1.0 + np.exp(lo))

    def save_pgm(self, path: str):
        """Grid export loadable as a prior map (pose_graph_node.cpp:861-901
        loads such offline-built grids). The world scale is recorded in a
        PGM comment line (`# res <m/cell> origin <ox> <oy>`) — the PGM pixel
        format itself carries no resolution, so without this a non-default
        grid would silently reload at the wrong world scale."""
        p = self.probability()
        img = np.clip((1.0 - p) * 255, 0, 255).astype(np.uint8)
        with open(path, "wb") as fp:
            fp.write(f"P5\n# res {float(self.res)!r} origin "
                     f"{float(self.origin[0])!r} {float(self.origin[1])!r}\n"
                     f"{self.n} {self.n}\n255\n".encode())
            fp.write(img.tobytes())

    @classmethod
    def load_pgm(cls, path: str, resolution: float | None = None, **kw):
        """Rebuild a grid from a saved PGM — the prior-occupancy-map load of
        the dense-map node (pose_graph_node.cpp:861-901: reads an
        offline-built grid image and republishes it as the prior map).
        Probabilities are recovered from the 8-bit image and clamped to the
        log-odds bounds, so save→load round-trips to quantization.

        Resolution: an explicit ``resolution`` argument wins; otherwise the
        `# res … origin …` metadata comment written by :meth:`save_pgm` is
        used; otherwise the 0.05 m/cell default."""
        meta_res, meta_origin = None, None
        with open(path, "rb") as fp:
            assert fp.readline().strip() == b"P5", "not a binary PGM"
            dims = fp.readline().split()
            while dims and dims[0].startswith(b"#"):
                if len(dims) >= 3 and dims[1] == b"res":
                    meta_res = float(dims[2])
                    if len(dims) >= 6 and dims[3] == b"origin":
                        meta_origin = np.array([float(dims[4]), float(dims[5])])
                dims = fp.readline().split()
            w, h = int(dims[0]), int(dims[1])
            fp.readline()               # maxval
            img = np.frombuffer(fp.read(w * h), np.uint8).reshape(h, w)
        assert w == h, "occupancy grids are square"
        if resolution is None:
            resolution = meta_res if meta_res is not None else 0.05
        grid = cls(size_m=w * resolution, resolution=resolution, **kw)
        if meta_origin is not None:
            grid.origin = meta_origin
        p = np.clip(1.0 - img.astype(np.float64) / 255.0, 1e-4, 1 - 1e-4)
        lo = np.clip(np.log(p / (1.0 - p)), grid.l_min, grid.l_max)
        grid.logodds = jnp.asarray(lo, jnp.float32)
        return grid
