#!/usr/bin/env python
"""Render a synthetic image sequence from the simulator into the dataset
directory layout (io/dataset.py) — gives the FULL system (KLT front-end
included) an end-to-end driveable input without any external dataset.

    python scripts/make_synth_seq.py <out_dir> [n_frames]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from ground_fusion_tpu.sim.synthetic import (
    SimParams,
    body_T_cam,
    gt_pose7,
    imu_sample,
    make_landmarks,
    project_landmarks,
    wheel_sample,
)

FX = FY = 460.0
CX, CY = 320.0, 240.0
W, H = 640, 480


def render(uv_px, z, vis, rng):
    """Gaussian blobs at projected landmark pixels over a dark background."""
    img = rng.normal(8.0, 1.0, (H, W)).astype(np.float32)
    depth = np.zeros((H, W), np.float32)
    ys, xs = np.mgrid[0:7, 0:7] - 3
    blob = 200.0 * np.exp(-(xs**2 + ys**2) / 4.0)
    for (u, v), d, ok in zip(uv_px, z, vis):
        if not ok:
            continue
        ui, vi = int(round(u)), int(round(v))
        if 4 <= ui < W - 4 and 4 <= vi < H - 4:
            img[vi - 3 : vi + 4, ui - 3 : ui + 4] += blob
            depth[vi - 3 : vi + 4, ui - 3 : ui + 4] = d
    return np.clip(img, 0, 255), depth


def main(out_dir: str, n_frames: int = 40):
    sp = SimParams(omega=0.25)
    os.makedirs(os.path.join(out_dir, "img"), exist_ok=True)
    ex = body_T_cam(jnp.float64)
    pts_w = jnp.asarray(make_landmarks(600, sp, seed=1), jnp.float64)
    rng = np.random.default_rng(0)

    frame_dt = 1.0 / sp.frame_rate
    imu_rows, wheel_rows, frame_rows, gt_rows = [], [], [], []
    t0 = 0.0
    for k in range(n_frames):
        t = t0 + k * frame_dt
        tp = t - frame_dt if k else t
        for ti in np.arange(tp, t + 1e-9, 1.0 / sp.imu_rate) if k else [t]:
            a, g = np.asarray(imu_sample(float(ti), sp), dtype=np.float64)
            imu_rows.append([ti, *a, *g])
        for ti in np.arange(tp, t + 1e-9, 1.0 / sp.wheel_rate) if k else [t]:
            v, wg = np.asarray(wheel_sample(float(ti), sp), dtype=np.float64)
            wheel_rows.append([ti, *v, *wg])

        pose = gt_pose7(t, sp)
        uv, z, vis = project_landmarks(pose, ex, pts_w)
        uv_px = np.asarray(uv) * [FX, FY] + [CX, CY]
        img, depth = render(uv_px, np.asarray(z), np.asarray(vis), rng)
        np.save(os.path.join(out_dir, "img", f"{k:05d}.npy"), img)
        np.save(os.path.join(out_dir, "img", f"{k:05d}_d.npy"), depth)
        frame_rows.append(f"{t:.6f},img/{k:05d}.npy,img/{k:05d}_d.npy")
        p = np.asarray(pose)
        gt_rows.append(f"{t:.6f} {p[0]} {p[1]} {p[2]} {p[4]} {p[5]} {p[6]} {p[3]}")

    # drop duplicate t=0 rows from the k=0 seeding
    np.savetxt(os.path.join(out_dir, "imu.csv"), np.asarray(imu_rows), delimiter=",")
    np.savetxt(os.path.join(out_dir, "wheel.csv"), np.asarray(wheel_rows), delimiter=",")
    with open(os.path.join(out_dir, "frames.csv"), "w") as f:
        f.write("\n".join(frame_rows) + "\n")
    with open(os.path.join(out_dir, "gt.csv"), "w") as f:
        f.write("\n".join(gt_rows) + "\n")
    print(f"wrote {n_frames} frames to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 40)
