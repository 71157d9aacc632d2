"""Output surfaces beyond TUM trajectories: calibration iterate dumps,
per-sensor dead-reckoning paths, statistics printing.

The reference's output inventory (SURVEY §2 #22, §5 observability):
extrinsic/td/intrinsic CSV dumps (``parameters.cpp:167-283``), ~30 live
topics including the pure IMU / pure wheel dead-reckoning diagnostic paths
(``visualization.cpp:58-68``), printStatistics per frame."""

from __future__ import annotations

import os

import numpy as np


class CalibrationDump:
    """Appends one row per solve of the online-calibrated quantities
    (EX_CALIB_RESULT_PATH / td CSV analogs)."""

    def __init__(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        self.paths = {
            "ex_cam": os.path.join(out_dir, "extrinsic_cam.csv"),
            "ex_wheel": os.path.join(out_dir, "extrinsic_wheel.csv"),
            "intrinsic_wheel": os.path.join(out_dir, "intrinsic_wheel.csv"),
            "td": os.path.join(out_dir, "td.csv"),
        }
        for p in self.paths.values():
            open(p, "w").close()

    def append(self, t: float, state) -> None:
        ex = np.asarray(state.ex_cam)
        exw = np.asarray(state.ex_wheel)
        s = np.asarray(state.s_wheel)
        with open(self.paths["ex_cam"], "a") as f:
            f.write(f"{t:.6f}," + ",".join(f"{v:.6f}" for v in ex) + "\n")
        with open(self.paths["ex_wheel"], "a") as f:
            f.write(f"{t:.6f}," + ",".join(f"{v:.6f}" for v in exw) + "\n")
        with open(self.paths["intrinsic_wheel"], "a") as f:
            f.write(f"{t:.6f},{s[0]:.6f},{s[1]:.6f},{s[2]:.6f}\n")
        with open(self.paths["td"], "a") as f:
            f.write(f"{t:.6f},{float(state.td):.6f},{float(state.td_wheel):.6f}\n")


class DeadReckoningPaths:
    """Pure-IMU and pure-wheel propagation tracks for debugging
    (``pure_imu_propagate`` / ``pure_wheel_propagate`` topics,
    fastPredictPureIMU estimator.cpp:4032-4093)."""

    def __init__(self):
        self.imu_path: list[tuple[float, np.ndarray]] = []
        self.wheel_path: list[tuple[float, np.ndarray]] = []
        self._imu_state = None   # (p, q, v)
        self._wheel_state = None  # (p, q)

    def propagate_imu(self, t, dt, acc0, gyr0, acc1, gyr1, ba, bg, g_norm):
        from ..geometry.so3 import quat_mul, quat_normalize, quat_to_mat

        if self._imu_state is None:
            self._imu_state = (np.zeros(3), np.array([1.0, 0, 0, 0]), np.zeros(3))
        p, q, v = self._imu_state
        g = np.array([0.0, 0.0, g_norm])
        R0 = np.asarray(quat_to_mat(np.asarray(q)))
        un_acc0 = R0 @ (acc0 - ba) - g
        un_gyr = 0.5 * (gyr0 + gyr1) - bg
        dq = np.concatenate([[1.0], 0.5 * un_gyr * dt])
        q = np.asarray(quat_normalize(quat_mul(np.asarray(q), np.asarray(dq))))
        R1 = np.asarray(quat_to_mat(q))
        un_acc1 = R1 @ (acc1 - ba) - g
        un_acc = 0.5 * (un_acc0 + un_acc1)
        p = p + v * dt + 0.5 * un_acc * dt * dt
        v = v + un_acc * dt
        self._imu_state = (p, q, v)
        self.imu_path.append((t, np.concatenate([p, q])))

    def propagate_wheel(self, t, dt, vel, gyr):
        from ..geometry.so3 import quat_mul, quat_normalize, quat_to_mat

        if self._wheel_state is None:
            self._wheel_state = (np.zeros(3), np.array([1.0, 0, 0, 0]))
        p, q = self._wheel_state
        R = np.asarray(quat_to_mat(np.asarray(q)))
        p = p + R @ (vel * dt)
        dq = np.concatenate([[1.0], 0.5 * gyr * dt])
        q = np.asarray(quat_normalize(quat_mul(np.asarray(q), np.asarray(dq))))
        self._wheel_state = (p, q)
        self.wheel_path.append((t, np.concatenate([p, q])))

    def write_tum(self, imu_path: str, wheel_path: str):
        for path, track in ((imu_path, self.imu_path), (wheel_path, self.wheel_path)):
            with open(path, "w") as fp:
                for t, p in track:
                    fp.write(f"{t:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                             f"{p[4]:.6f} {p[5]:.6f} {p[6]:.6f} {p[3]:.6f}\n")


def print_statistics(t: float, state, cost: float, stats=None) -> str:
    """printStatistics equivalent (estimator.cpp:675 path)."""
    p = np.asarray(state.poses[-1, 0:3])
    v = np.asarray(state.sbs[-1, 0:3])
    ba = np.linalg.norm(np.asarray(state.sbs[-1, 3:6]))
    bg = np.linalg.norm(np.asarray(state.sbs[-1, 6:9]))
    line = (f"t={t:.2f} p=[{p[0]:.3f},{p[1]:.3f},{p[2]:.3f}] "
            f"|v|={np.linalg.norm(v):.2f} |ba|={ba:.3f} |bg|={bg:.4f} "
            f"cost={cost:.3f}")
    if stats is not None:
        line += f" solve_ms={stats.mean('solve'):.1f}"
    return line
