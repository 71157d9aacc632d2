"""4-DoF pose-graph relaxation + host keyframe graph with drift broadcast.

Device side re-designs ``PoseGraph::optimize4DoF``
(``dense_map/src/pose_graph.cpp:529-705``: per-KF yaw + translation, Ceres
autodiff ``FourDOFError``/``FourDOFWeightError`` (pose_graph.h:199-288),
sequential edges to 4 predecessors, loop edges with yaw/10 weighting, first
looped keyframe held fixed): all edges linearize batched via forward-mode AD
into dense rows over the padded [4·MAX_KF] state and the graph relaxes with a
fixed GN scan — one Cholesky per iteration on the MXU.

Host side mirrors ``PoseGraph::addKeyFrame``/``detectLoop``/``findConnection``
(pose_graph.cpp:77-512, keyframe.cpp:194-352) using the device kernels from
:mod:`.brief`, :mod:`.bow`, :mod:`.pnp`, plus the drift composition applied to
keyframes after the optimized span (pose_graph.cpp:674-696)."""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.so3 import mat_to_quat, mat_to_ypr, quat_to_mat, ypr_to_mat
from .bow import KeyframeDatabase, bow_histogram, word_selector, words_of
from .brief import brief_describe, brief_pattern, fast_detect, match_brief
from .pnp import pnp_ransac


def _normalize_angle(a):
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


class GraphEdges(NamedTuple):
    """Padded edge table for the 4-DoF graph."""

    i: jax.Array        # [E] int32
    j: jax.Array        # [E]
    t_ij: jax.Array     # [E,3] relative translation in frame i (yaw-frame)
    yaw_ij: jax.Array   # [E] relative yaw
    pitch_i: jax.Array  # [E] fixed pitch of node i (from VIO)
    roll_i: jax.Array   # [E]
    w_t: jax.Array      # [E] translation weight
    w_yaw: jax.Array    # [E] yaw weight (sequential 1, loop 1/10 — the
                        #     FourDOFWeightError /10 factor)
    valid: jax.Array    # [E] bool


def edge_residual(yaw_i, t_i, yaw_j, t_j, e_tij, e_yaw, pitch_i, roll_i, w_t, w_yaw):
    """FourDOFError (pose_graph.h:199-241): translation expressed in node i's
    full (yaw,pitch,roll) frame, yaw difference normalized."""
    Ri = ypr_to_mat(jnp.stack([yaw_i, pitch_i, roll_i]))
    r_t = (Ri.T @ (t_j - t_i) - e_tij) * w_t
    r_y = _normalize_angle(yaw_j - yaw_i - e_yaw) * w_yaw
    return jnp.concatenate([r_t, r_y[None]])


def linearize_edges(yaws: jax.Array, ts: jax.Array, edges: GraphEdges, n: int):
    """Batched forward-AD linearization of every 4-DoF edge into dense rows
    over the [4·N] state; invalid edges are zero rows. Shared by the
    single-device solve below and the edge-sharded mesh solve
    (:mod:`...parallel.sharded`)."""
    dtype = ts.dtype

    def one(i, j, tij, yij, pi, ri, wt, wy, ok):
        def r_of(d):
            return edge_residual(
                yaws[i] + d[0], ts[i] + d[1:4], yaws[j] + d[4], ts[j] + d[5:8],
                tij, yij, pi, ri, wt, wy,
            )

        z = jnp.zeros(8, dtype)
        r = r_of(z)
        J = jax.jacfwd(r_of)(z)
        w = ok.astype(dtype)
        return r * w, J * w

    r, J = jax.vmap(one)(edges.i, edges.j, edges.t_ij, edges.yaw_ij,
                         edges.pitch_i, edges.roll_i, edges.w_t,
                         edges.w_yaw, edges.valid)      # [E,4], [E,4,8]
    cols = jnp.concatenate(
        [
            (4 * edges.i)[:, None],
            (4 * edges.i)[:, None] + 1 + jnp.arange(3)[None, :],
            (4 * edges.j)[:, None],
            (4 * edges.j)[:, None] + 1 + jnp.arange(3)[None, :],
        ],
        axis=1,
    )                                                   # [E,8]
    e = r.shape[0]
    Jd = jnp.zeros((e, 4, 4 * n), dtype)
    Jd = Jd.at[jnp.arange(e)[:, None, None], jnp.arange(4)[None, :, None],
               cols[:, None, :]].set(J)
    return Jd.reshape(e * 4, 4 * n), r.reshape(-1)


@partial(jax.jit, static_argnames=("iters",))
def optimize_4dof(yaws: jax.Array, ts: jax.Array, node_valid: jax.Array,
                  fixed: jax.Array, edges: GraphEdges, iters: int = 5):
    """GN relaxation of the padded graph. yaws [N], ts [N,3]; ``fixed`` masks
    nodes held constant (the first looped keyframe, pose_graph.cpp:596-603).
    """
    n = yaws.shape[0]
    dtype = ts.dtype

    def linearize(yaws, ts):
        return linearize_edges(yaws, ts, edges, n)

    free = (node_valid & ~fixed).astype(dtype)
    free4 = jnp.repeat(free, 4)

    def gn(carry, _):
        yaws, ts = carry
        Jd, r = linearize(yaws, ts)
        Jd = Jd * free4[None, :]
        H = Jd.T @ Jd
        g = Jd.T @ r
        damp = 1e-6 * jnp.diagonal(H) + 1e-8 + (1.0 - free4)
        L = jnp.linalg.cholesky(H + jnp.diag(damp))
        dx = jax.scipy.linalg.cho_solve((L, True), -g) * free4
        dx = dx.reshape(n, 4)
        return (yaws + dx[:, 0], ts + dx[:, 1:4]), None

    (yaws, ts), _ = jax.lax.scan(gn, (yaws, ts), None, length=iters)
    return yaws, ts


class GraphEdges6(NamedTuple):
    """Padded edge table for the 6-DoF graph (``optimize6DoF``)."""

    i: jax.Array        # [E] int32
    j: jax.Array        # [E]
    t_ij: jax.Array     # [E,3] relative translation in frame i
    q_ij: jax.Array     # [E,4] relative rotation (wxyz), frame i → j
    w_t: jax.Array      # [E] translation weight (1/t_var, reference 1/0.1)
    w_q: jax.Array      # [E] rotation weight (1/q_var, reference 1/0.01)
    valid: jax.Array    # [E] bool


def edge_residual_6dof(q_i, t_i, q_j, t_j, e_tij, e_qij, w_t, w_q):
    """RelativeRTError (global_fusion Factors.h:52 — the same autodiff cost
    ``optimize6DoF`` builds, pose_graph.cpp:785-795): translation expressed
    in node i's full rotation frame; rotation residual is the vector part of
    the error quaternion."""
    from ..geometry.so3 import quat_conj, quat_mul, quat_rotate_inv

    r_t = (quat_rotate_inv(q_i, t_j - t_i) - e_tij) * w_t
    q_rel = quat_mul(quat_conj(q_i), q_j)
    dq = quat_mul(quat_conj(e_qij), q_rel)
    r_q = 2.0 * dq[1:4] * jnp.sign(dq[0]) * w_q
    return jnp.concatenate([r_t, r_q])


def linearize_edges_6dof(quats: jax.Array, ts: jax.Array, edges: GraphEdges6,
                         n: int):
    """Batched forward-AD linearization of every 6-DoF edge into dense rows
    over the [6·N] tangent (δθ(3) + δt(3) per node)."""
    from ..geometry.so3 import quat_mul, quat_normalize

    dtype = ts.dtype

    def boxplus(q, dth):
        return quat_normalize(quat_mul(q, jnp.concatenate([jnp.ones(1, dtype), 0.5 * dth])))

    def one(i, j, tij, qij, wt, wq, ok):
        def r_of(d):
            return edge_residual_6dof(
                boxplus(quats[i], d[0:3]), ts[i] + d[3:6],
                boxplus(quats[j], d[6:9]), ts[j] + d[9:12],
                tij, qij, wt, wq,
            )

        z = jnp.zeros(12, dtype)
        r = r_of(z)
        J = jax.jacfwd(r_of)(z)
        w = ok.astype(dtype)
        return r * w, J * w

    r, J = jax.vmap(one)(edges.i, edges.j, edges.t_ij, edges.q_ij,
                         edges.w_t, edges.w_q, edges.valid)   # [E,6], [E,6,12]
    cols = jnp.concatenate(
        [(6 * edges.i)[:, None] + jnp.arange(6)[None, :],
         (6 * edges.j)[:, None] + jnp.arange(6)[None, :]], axis=1)
    e = r.shape[0]
    Jd = jnp.zeros((e, 6, 6 * n), dtype)
    Jd = Jd.at[jnp.arange(e)[:, None, None], jnp.arange(6)[None, :, None],
               cols[:, None, :]].set(J)
    return Jd.reshape(e * 6, 6 * n), r.reshape(-1)


@partial(jax.jit, static_argnames=("iters",))
def optimize_6dof(quats: jax.Array, ts: jax.Array, node_valid: jax.Array,
                  fixed: jax.Array, edges: GraphEdges6, iters: int = 5):
    """Full-SE(3) graph relaxation (``PoseGraph::optimize6DoF``,
    pose_graph.cpp:707-860): per-KF quaternion + translation, sequential
    edges to 4 predecessors and loop edges as RelativeRTError, first looped
    keyframe fixed. quats [N,4] wxyz, ts [N,3]."""
    from ..geometry.so3 import quat_mul, quat_normalize

    n = quats.shape[0]
    dtype = ts.dtype
    free = (node_valid & ~fixed).astype(dtype)
    free6 = jnp.repeat(free, 6)

    def gn(carry, _):
        quats, ts = carry
        Jd, r = linearize_edges_6dof(quats, ts, edges, n)
        Jd = Jd * free6[None, :]
        H = Jd.T @ Jd
        g = Jd.T @ r
        damp = 1e-6 * jnp.diagonal(H) + 1e-8 + (1.0 - free6)
        L = jnp.linalg.cholesky(H + jnp.diag(damp))
        dx = (jax.scipy.linalg.cho_solve((L, True), -g) * free6).reshape(n, 6)
        quats = quat_normalize(quat_mul(
            quats, jnp.concatenate([jnp.ones((n, 1), dtype), 0.5 * dx[:, 0:3]], -1)))
        return (quats, ts + dx[:, 3:6]), None

    (quats, ts), _ = jax.lax.scan(gn, (quats, ts), None, length=iters)
    return quats, ts


class Keyframe(NamedTuple):
    index: int
    t: float
    pose: np.ndarray          # [7] world_T_body from VIO
    kp: np.ndarray            # [K,2] pixel keypoints
    kp_norm: np.ndarray       # [K,2] normalized
    desc: np.ndarray          # [K,8] uint32 packed BRIEF
    kp_ok: np.ndarray         # [K]
    win_pts3d: np.ndarray     # [M,3] window landmarks (world)
    win_norm: np.ndarray      # [M,2] their normalized obs in this KF
    win_desc: np.ndarray      # [M,8] BRIEF at the VIO feature pixels
    win_ok: np.ndarray        # [M]


class PoseGraph:
    """Host keyframe graph: place recognition, geometric verification, 4-DoF
    relaxation in the background cadence, drift broadcast."""

    def __init__(self, cfg, max_kf: int = 512, cam_focal: float = 460.0):
        self.cfg = cfg
        self.max_kf = max_kf
        self.db = KeyframeDatabase(
            capacity=max_kf,
            score_best=cfg.loop.bow_score_best,
            score_min=cfg.loop.bow_score_min,
            min_gap=cfg.loop.min_loop_gap,
        )
        self.sel = jnp.asarray(word_selector())
        pa, pb = brief_pattern()
        self.pat_a = jnp.asarray(pa)
        self.pat_b = jnp.asarray(pb)
        self.kfs: list[Keyframe] = []
        self.loop_edges: list[tuple[int, int, np.ndarray, float]] = []
        self.r_drift = np.eye(3)
        self.t_drift = np.zeros(3)
        self.earliest_loop = None
        self._key = jax.random.PRNGKey(0)

    # ------------------------------------------------------------ keyframes

    def describe(self, img: np.ndarray, win_pts2d: Optional[np.ndarray] = None):
        """FAST + BRIEF for a keyframe image; also describes the VIO window
        feature pixels (computeWindowBRIEFPoint, keyframe.cpp:148-158)."""
        img_j = jnp.asarray(img, jnp.float32)
        pts, ok = fast_detect(img_j, self.cfg.loop.fast_threshold,
                              self.cfg.loop.max_keypoints)
        desc = brief_describe(img_j, pts, self.pat_a, self.pat_b)
        win_desc = None
        if win_pts2d is not None and len(win_pts2d):
            win_desc = np.asarray(
                brief_describe(img_j, jnp.asarray(win_pts2d, jnp.float32),
                               self.pat_a, self.pat_b)
            )
        return np.asarray(pts), np.asarray(ok), np.asarray(desc), win_desc

    def add_keyframe(self, kf: Keyframe, detect_loop: bool = True):
        """addKeyFrame (pose_graph.cpp:77-307): drift-correct the incoming
        pose, BoW-register, attempt loop detection + verification."""
        pose = kf.pose.copy()
        R = np.asarray(quat_to_mat(jnp.asarray(pose[3:7])))
        pose[0:3] = self.r_drift @ pose[0:3] + self.t_drift
        pose[3:7] = np.asarray(mat_to_quat(jnp.asarray(self.r_drift @ R)))
        kf = kf._replace(pose=pose)

        hist = bow_histogram(words_of(jnp.asarray(kf.desc), jnp.asarray(kf.kp_ok),
                                      self.sel))
        loop_idx = self.db.query(hist, kf.index) if detect_loop else -1
        self.db.add(hist)
        self.kfs.append(kf)

        if loop_idx >= 0 and loop_idx < len(self.kfs) - 1:
            self._try_connect(kf, self.kfs[loop_idx])
        return loop_idx

    def _try_connect(self, cur: Keyframe, old: Keyframe):
        """findConnection (keyframe.cpp:332-430): window-BRIEF → old-KF
        matching, PnP-RANSAC, loop edge on success."""
        if cur.win_desc is None or not len(cur.win_desc):
            return False
        idx, matched = match_brief(
            jnp.asarray(cur.win_desc), jnp.asarray(cur.win_ok),
            jnp.asarray(old.desc), jnp.asarray(old.kp_ok),
            self.cfg.loop.hamming_thresh,
        )
        idx, matched = np.asarray(idx), np.asarray(matched)
        if matched.sum() < self.cfg.loop.min_matches:
            return False
        obs_old = old.kp_norm[idx]                      # [M,2] matched obs in old
        self._key, sub = jax.random.split(self._key)
        # seed at old KF camera pose; solve old camera pose from cur 3-D pts
        pose_ref, inliers, ok = pnp_ransac(
            jnp.asarray(old.pose, jnp.float64),
            jnp.asarray(cur.win_pts3d, jnp.float64),
            jnp.asarray(obs_old, jnp.float64),
            jnp.asarray(matched & cur.win_ok),
            sub,
            min_inliers=self.cfg.loop.min_matches,
        )
        if not bool(ok):
            return False
        # relative transform old_T_cur from PnP result
        T_old = np.asarray(pose_ref)
        R_old = np.asarray(quat_to_mat(jnp.asarray(T_old[3:7])))
        R_cur = np.asarray(quat_to_mat(jnp.asarray(cur.pose[3:7])))
        t_rel = R_old.T @ (cur.pose[0:3] - T_old[0:3])
        R_rel = R_old.T @ R_cur
        yaw_rel = float(np.asarray(mat_to_ypr(jnp.asarray(R_rel)))[0])
        q_rel = np.asarray(mat_to_quat(jnp.asarray(R_rel)))
        self.loop_edges.append((old.index, cur.index, t_rel, yaw_rel, q_rel))
        if self.earliest_loop is None or old.index < self.earliest_loop:
            self.earliest_loop = old.index
        return True

    # ------------------------------------------------------------- optimize

    def optimize(self, iters: int = 5):
        """optimize4DoF over all keyframes — or the full-SE(3) optimize6DoF
        variant (pose_graph.cpp:707-860) when ``loop.graph_6dof`` is set;
        returns updated drift (pose_graph.cpp:529-705)."""
        if not self.loop_edges or len(self.kfs) < 2:
            return
        if getattr(self.cfg.loop, "graph_6dof", False):
            return self._optimize_6dof(iters)
        n = len(self.kfs)
        poses = np.stack([k.pose for k in self.kfs])
        Rs = np.asarray(quat_to_mat(jnp.asarray(poses[:, 3:7])))
        ypr = np.asarray(mat_to_ypr(jnp.asarray(Rs)))
        yaws = ypr[:, 0].copy()
        ts = poses[:, 0:3].copy()

        seq_edges = []
        for j in range(1, n):
            for back in range(1, 5):                      # 4 predecessors
                i = j - back
                if i < 0:
                    break
                t_ij = Rs[i].T @ (ts[j] - ts[i])
                seq_edges.append((i, j, t_ij, yaws[j] - yaws[i],
                                  ypr[i, 1], ypr[i, 2], 1.0, 1.0))
        for (i, j, t_rel, yaw_rel, *_rest) in self.loop_edges:
            seq_edges.append((i, j, t_rel, yaw_rel, ypr[i, 1], ypr[i, 2],
                              1.0, 0.1))                  # yaw/10 loop weight

        e = len(seq_edges)
        E = GraphEdges(
            i=jnp.asarray([s[0] for s in seq_edges], jnp.int32),
            j=jnp.asarray([s[1] for s in seq_edges], jnp.int32),
            t_ij=jnp.asarray(np.stack([s[2] for s in seq_edges])),
            yaw_ij=jnp.asarray([s[3] for s in seq_edges]),
            pitch_i=jnp.asarray([s[4] for s in seq_edges]),
            roll_i=jnp.asarray([s[5] for s in seq_edges]),
            w_t=jnp.asarray([s[6] for s in seq_edges]),
            w_yaw=jnp.asarray([s[7] for s in seq_edges]),
            valid=jnp.ones(e, bool),
        )
        fixed = np.zeros(n, bool)
        fixed[self.earliest_loop if self.earliest_loop is not None else 0] = True
        new_yaws, new_ts = optimize_4dof(
            jnp.asarray(yaws), jnp.asarray(ts), jnp.ones(n, bool),
            jnp.asarray(fixed), E, iters,
        )
        new_yaws, new_ts = np.asarray(new_yaws), np.asarray(new_ts)

        # write back optimized poses; drift = newest optimized vs its VIO pose
        # (pose_graph.cpp:674-696: yaw_drift, r_drift = R(yaw_drift),
        #  t_drift = t_opt − r_drift · t_vio)
        for k in range(n):
            dy = new_yaws[k] - yaws[k]
            Rk = np.asarray(quat_to_mat(jnp.asarray(self.kfs[k].pose[3:7])))
            Rz = np.asarray(ypr_to_mat(jnp.asarray([dy, 0.0, 0.0])))
            p = self.kfs[k].pose.copy()
            p[0:3] = new_ts[k]
            p[3:7] = np.asarray(mat_to_quat(jnp.asarray(Rz @ Rk)))
            self.kfs[k] = self.kfs[k]._replace(pose=p)
        dy = new_yaws[n - 1] - yaws[n - 1]
        Rz = np.asarray(ypr_to_mat(jnp.asarray([dy, 0.0, 0.0])))
        self.r_drift = Rz @ self.r_drift
        self.t_drift = new_ts[n - 1] - Rz @ ts[n - 1]

    def _optimize_6dof(self, iters: int = 5):
        """optimize6DoF (pose_graph.cpp:707-860): every keyframe carries a
        full quaternion + translation; sequential edges to 4 predecessors and
        loop edges become RelativeRTError rows with the reference's 0.1/0.01
        variances; drift is the full rotation correction of the newest pose
        (pose_graph.cpp:849-853)."""
        n = len(self.kfs)
        poses = np.stack([k.pose for k in self.kfs])
        quats = poses[:, 3:7].copy()
        ts = poses[:, 0:3].copy()
        Rs = np.asarray(quat_to_mat(jnp.asarray(quats)))

        W_T, W_Q = 1.0 / 0.1, 1.0 / 0.01    # RelativeRTError::Create(.., 0.1, 0.01)
        edges = []
        for j in range(1, n):
            for back in range(1, 5):
                i = j - back
                if i < 0:
                    break
                t_ij = Rs[i].T @ (ts[j] - ts[i])
                q_ij = np.asarray(mat_to_quat(jnp.asarray(Rs[i].T @ Rs[j])))
                edges.append((i, j, t_ij, q_ij, W_T, W_Q))
        for (i, j, t_rel, _yaw, *rest) in self.loop_edges:
            q_rel = rest[0] if rest else np.array([1.0, 0, 0, 0])
            edges.append((i, j, t_rel, q_rel, W_T, W_Q))

        e = len(edges)
        E6 = GraphEdges6(
            i=jnp.asarray([s[0] for s in edges], jnp.int32),
            j=jnp.asarray([s[1] for s in edges], jnp.int32),
            t_ij=jnp.asarray(np.stack([s[2] for s in edges])),
            q_ij=jnp.asarray(np.stack([s[3] for s in edges])),
            w_t=jnp.asarray([s[4] for s in edges]),
            w_q=jnp.asarray([s[5] for s in edges]),
            valid=jnp.ones(e, bool),
        )
        fixed = np.zeros(n, bool)
        fixed[self.earliest_loop if self.earliest_loop is not None else 0] = True
        new_q, new_t = optimize_6dof(
            jnp.asarray(quats), jnp.asarray(ts), jnp.ones(n, bool),
            jnp.asarray(fixed), E6, iters,
        )
        new_q, new_t = np.asarray(new_q), np.asarray(new_t)
        for k in range(n):
            p = self.kfs[k].pose.copy()
            p[0:3] = new_t[k]
            p[3:7] = new_q[k]
            self.kfs[k] = self.kfs[k]._replace(pose=p)
        R_new = np.asarray(quat_to_mat(jnp.asarray(new_q[n - 1])))
        self.r_drift = R_new @ Rs[n - 1].T @ self.r_drift
        self.t_drift = new_t[n - 1] - (R_new @ Rs[n - 1].T) @ ts[n - 1]

    def write_tum(self, path: str) -> None:
        with open(path, "w") as fp:
            for k in self.kfs:
                p = k.pose
                fp.write(f"{k.t:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                         f"{p[4]:.6f} {p[5]:.6f} {p[6]:.6f} {p[3]:.6f}\n")
