"""Full-system E2E: rendered images through the CLI surface — tracker,
estimator, native ingest, dataset IO, TUM output, ATE evaluation (the
rosbag-replay analog at the binary level)."""

import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_cli_full_system(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seq = str(tmp_path / "seq")
    out = str(tmp_path / "out")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "camera:\n  fx: 460.0\n  fy: 460.0\n  cx: 320.0\n  cy: 240.0\n"
        "tracker:\n  max_features: 128\n  min_dist_px: 25.0\n  depth_max: 7.0\n"
        "use_depth: true\n"
    )
    env = dict(os.environ,
               PYTHONPATH=root,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    subprocess.run([sys.executable, os.path.join(root, "scripts/make_synth_seq.py"),
                    seq, "35"], check=True, env=env, timeout=300)
    r = subprocess.run([sys.executable, "-m", "ground_fusion_tpu", str(cfg), seq, out,
                        "--save-state"],
                       check=True, env=env, timeout=500, capture_output=True, text=True)
    assert "trajectory written" in r.stdout
    est = np.loadtxt(os.path.join(out, "vio.txt"))
    gt = np.loadtxt(os.path.join(seq, "gt.csv"))
    assert len(est) >= 20
    gt_i = np.stack([np.interp(est[:, 0], gt[:, 0], gt[:, i]) for i in (1, 2, 3)], -1)
    from ground_fusion_tpu.utils.evaluate import ate_rmse

    ate = ate_rmse(est[:, 1:4], gt_i)
    assert ate < 0.1, f"full-system ATE {ate:.4f} m"
    assert os.path.exists(os.path.join(out, "timing.txt"))
    assert os.path.exists(os.path.join(out, "td.csv"))
    # dead-reckoning diagnostic paths are fed at sensor rate
    # (pure_imu_propagate/pure_wheel_propagate, visualization.cpp:58-68)
    pure_imu = np.loadtxt(os.path.join(out, "pure_imu.txt"), ndmin=2)
    pure_wheel = np.loadtxt(os.path.join(out, "pure_wheel.txt"), ndmin=2)
    assert len(pure_imu) > 200 and pure_imu.shape[1] == 8
    assert len(pure_wheel) > 100 and pure_wheel.shape[1] == 8
    assert np.all(np.isfinite(pure_wheel))
    # dead-reckoned wheel track actually moves along the trajectory
    assert np.linalg.norm(pure_wheel[-1, 1:4] - pure_wheel[0, 1:4]) > 0.1
    # --save-state wrote the resume snapshot
    assert os.path.exists(os.path.join(out, "vio_state.npz"))


@pytest.mark.slow
def test_cli_full_system_burst(tmp_path):
    """Same binary-level replay with ``--burst 8`` (K window steps per device
    dispatch): the accelerated replay must hold the same ATE bound."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seq = str(tmp_path / "seq")
    out = str(tmp_path / "out")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "camera:\n  fx: 460.0\n  fy: 460.0\n  cx: 320.0\n  cy: 240.0\n"
        "tracker:\n  max_features: 128\n  min_dist_px: 25.0\n  depth_max: 7.0\n"
        "use_depth: true\n"
    )
    env = dict(os.environ,
               PYTHONPATH=root,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    subprocess.run([sys.executable, os.path.join(root, "scripts/make_synth_seq.py"),
                    seq, "35"], check=True, env=env, timeout=300)
    r = subprocess.run([sys.executable, "-m", "ground_fusion_tpu", str(cfg), seq, out,
                        "--burst", "8"],
                       check=True, env=env, timeout=500, capture_output=True, text=True)
    assert "trajectory written" in r.stdout
    est = np.loadtxt(os.path.join(out, "vio.txt"))
    gt = np.loadtxt(os.path.join(seq, "gt.csv"))
    assert len(est) >= 20
    gt_i = np.stack([np.interp(est[:, 0], gt[:, 0], gt[:, i]) for i in (1, 2, 3)], -1)
    from ground_fusion_tpu.utils.evaluate import ate_rmse

    ate = ate_rmse(est[:, 1:4], gt_i)
    assert ate < 0.1, f"full-system burst ATE {ate:.4f} m"
