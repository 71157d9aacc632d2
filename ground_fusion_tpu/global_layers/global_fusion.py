"""Global GPS/VIO fusion: 6-DoF pose graph with position priors.

Re-design of ``global_fusion`` (``globalOpt.{h,cpp}``: background thread
building a VIO-relative-pose chain + GPS position priors over all poses,
``Factors.h:26-50`` TError 3-dim position prior /σ, ``:52-135``
RelativeRTError 6-dim relative pose with t_var=0.1/q_var=0.01; GeographicLib
LocalCartesian geodetic↔ENU, ``globalOpt.cpp:31-41``; WGPS_T_WVIO alignment
update ``:216-226``): the whole graph linearizes batched (forward-mode AD per
edge) into dense rows over the padded [6·N] tangent and relaxes with a fixed
GN scan — the same solver shape as the 4-DoF loop graph.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.se3 import pose_boxplus, pose_compose, pose_inverse
from ..geometry.so3 import mat_to_quat, quat_conj, quat_mul, quat_to_mat
from ..gnss.coords import ecef2rotation, geo2ecef


class GlobalEdges(NamedTuple):
    i: jax.Array         # [E] int32 — VIO chain edges (i, i+1)
    j: jax.Array
    rel: jax.Array       # [E,7] measured relative pose (i frame)
    w_t: jax.Array       # [E]
    w_q: jax.Array       # [E]
    valid: jax.Array     # [E]


class GlobalPriors(NamedTuple):
    k: jax.Array         # [P] node index
    pos: jax.Array       # [P,3] global position measurement
    w: jax.Array         # [P,3] 1/σ per axis
    valid: jax.Array     # [P]


def _rel_residual(pose_i, pose_j, rel, w_t, w_q):
    """RelativeRTError (Factors.h:52-135): translation of j in i's frame minus
    measured, quaternion difference vector, weighted."""
    q_i = pose_i[3:7]
    dp = pose_j[0:3] - pose_i[0:3]
    from ..geometry.so3 import quat_rotate_inv

    t_ij = quat_rotate_inv(q_i, dp)
    r_t = (t_ij - rel[0:3]) * w_t
    q_ij = quat_mul(quat_conj(q_i), pose_j[3:7])
    dq = quat_mul(quat_conj(rel[3:7]), q_ij)
    r_q = 2.0 * dq[1:4] * w_q
    return jnp.concatenate([r_t, r_q])


@partial(jax.jit, static_argnames=("iters",))
def optimize_global(poses: jax.Array, node_valid: jax.Array, edges: GlobalEdges,
                    priors: GlobalPriors, iters: int = 5):
    """GN over the padded [N,7] pose array; node 0 held fixed only through
    the priors (as the reference: first pose constrained by its GPS prior)."""
    n = poses.shape[0]
    dtype = poses.dtype

    def linearize(poses):
        def edge_one(i, j, rel, wt, wq, ok):
            def r_of(d):
                return _rel_residual(
                    pose_boxplus(poses[i], d[0:6]), pose_boxplus(poses[j], d[6:12]),
                    rel, wt, wq,
                )

            z = jnp.zeros(12, dtype)
            r = r_of(z)
            J = jax.jacfwd(r_of)(z)
            return jnp.where(ok, r, 0.0), jnp.where(ok, J, 0.0)

        r_e, J_e = jax.vmap(edge_one)(edges.i, edges.j, edges.rel, edges.w_t,
                                      edges.w_q, edges.valid)
        cols_e = jnp.concatenate(
            [(6 * edges.i)[:, None] + jnp.arange(6)[None, :],
             (6 * edges.j)[:, None] + jnp.arange(6)[None, :]], axis=1)

        def prior_one(k, pos, w, ok):
            def r_of(d):
                return (pose_boxplus(poses[k], d)[0:3] - pos) * w

            z = jnp.zeros(6, dtype)
            r = r_of(z)
            J = jax.jacfwd(r_of)(z)
            return jnp.where(ok, r, 0.0), jnp.where(ok, J, 0.0)

        r_p, J_p = jax.vmap(prior_one)(priors.k, priors.pos, priors.w, priors.valid)
        cols_p = (6 * priors.k)[:, None] + jnp.arange(6)[None, :]

        def dense(Jb, cols, rb):
            e, rr, nn = Jb.shape
            Jd = jnp.zeros((e, rr, 6 * n), dtype)
            Jd = Jd.at[jnp.arange(e)[:, None, None], jnp.arange(rr)[None, :, None],
                       cols[:, None, :]].set(Jb)
            return Jd.reshape(e * rr, 6 * n), rb.reshape(-1)

        J1, r1 = dense(J_e, cols_e, r_e)
        J2, r2 = dense(J_p, cols_p, r_p)
        return jnp.concatenate([J1, J2]), jnp.concatenate([r1, r2])

    free = jnp.repeat(node_valid.astype(dtype), 6)

    def gn(poses, _):
        J, r = linearize(poses)
        J = J * free[None, :]
        H = J.T @ J
        g = J.T @ r
        damp = 1e-6 * jnp.diagonal(H) + 1e-8 + (1.0 - free)
        L = jnp.linalg.cholesky(H + jnp.diag(damp))
        dx = jax.scipy.linalg.cho_solve((L, True), -g) * free
        return pose_boxplus(poses, dx.reshape(n, 6)), None

    poses, _ = jax.lax.scan(gn, poses, None, length=iters)
    return poses


class GlobalFusion:
    """Host wrapper: ingest VIO odometry + GPS fixes, optimize, maintain the
    WGPS_T_WVIO alignment (globalOpt.cpp:43-236)."""

    def __init__(self, max_poses: int = 1024, t_var: float = 0.1, q_var: float = 0.01):
        self.max_poses = max_poses
        self.w_t = 1.0 / t_var
        self.w_q = 1.0 / q_var
        self.vio_poses: list[np.ndarray] = []
        self.times: list[float] = []
        self.gps: dict[int, tuple[np.ndarray, float]] = {}   # idx -> (enu, acc)
        self.ref_lla: Optional[np.ndarray] = None
        self.wgps_T_wvio = np.concatenate([np.zeros(3), [1, 0, 0, 0]])
        self.global_poses: list[np.ndarray] = []

    def input_odom(self, t: float, pose7: np.ndarray):
        self.vio_poses.append(np.asarray(pose7, np.float64))
        self.times.append(t)
        T = pose_compose(jnp.asarray(self.wgps_T_wvio), jnp.asarray(pose7, np.float64))
        self.global_poses.append(np.asarray(T))
        if len(self.vio_poses) > self.max_poses:
            self.vio_poses.pop(0)
            self.times.pop(0)
            self.global_poses.pop(0)
            self.gps = {k - 1: v for k, v in self.gps.items() if k > 0}

    def input_gps(self, t: float, lat_deg: float, lon_deg: float, alt: float,
                  accuracy: float):
        """NavSatFix → local ENU via the first fix as datum
        (globalOpt.cpp:97-105 GPS2XYZ)."""
        lla = np.array([np.deg2rad(lat_deg), np.deg2rad(lon_deg), alt])
        if self.ref_lla is None:
            self.ref_lla = lla
            self.ref_ecef = geo2ecef(lla)
            self.ref_R = ecef2rotation(self.ref_ecef)
        enu = self.ref_R.T @ (geo2ecef(lla) - self.ref_ecef)
        # associate with the nearest odometry pose
        if not self.times:
            return
        k = int(np.argmin(np.abs(np.asarray(self.times) - t)))
        self.gps[k] = (enu, max(accuracy, 0.1))

    def optimize(self, iters: int = 5):
        n = len(self.vio_poses)
        if n < 2 or not self.gps:
            return
        poses0 = np.stack(self.global_poses)
        vio = np.stack(self.vio_poses)
        rels = []
        for i in range(n - 1):
            rels.append(np.asarray(pose_compose(
                pose_inverse(jnp.asarray(vio[i])), jnp.asarray(vio[i + 1]))))
        edges = GlobalEdges(
            i=jnp.arange(n - 1, dtype=jnp.int32),
            j=jnp.arange(1, n, dtype=jnp.int32),
            rel=jnp.asarray(np.stack(rels)),
            w_t=jnp.full(n - 1, self.w_t),
            w_q=jnp.full(n - 1, self.w_q),
            valid=jnp.ones(n - 1, bool),
        )
        ks = sorted(self.gps.keys())
        priors = GlobalPriors(
            k=jnp.asarray(ks, jnp.int32),
            pos=jnp.asarray(np.stack([self.gps[k][0] for k in ks])),
            w=jnp.asarray(np.stack([np.full(3, 1.0 / self.gps[k][1]) for k in ks])),
            valid=jnp.ones(len(ks), bool),
        )
        out = optimize_global(jnp.asarray(poses0), jnp.ones(n, bool), edges,
                              priors, iters)
        out = np.asarray(out)
        self.global_poses = [out[i] for i in range(n)]
        # update WGPS_T_WVIO from the newest pose (globalOpt.cpp:216-226)
        T_g = jnp.asarray(out[n - 1])
        T_v = jnp.asarray(vio[n - 1])
        self.wgps_T_wvio = np.asarray(pose_compose(T_g, pose_inverse(T_v)))

    def write_tum(self, path: str):
        with open(path, "w") as fp:
            for t, p in zip(self.times, self.global_poses):
                fp.write(f"{t:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                         f"{p[4]:.6f} {p[5]:.6f} {p[6]:.6f} {p[3]:.6f}\n")
