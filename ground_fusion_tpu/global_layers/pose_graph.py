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


def _edge_blocks(yaws: jax.Array, ts: jax.Array, edges: GraphEdges):
    """Per-edge forward-AD linearization: residuals [E,4] and the compact
    endpoint Jacobian blocks [E,4,8] (cols 0:4 = node i's (yaw,t), 4:8 =
    node j's). Invalid edges are zeroed. O(E) memory — the building block
    for both the dense-row solve and the matrix-free PCG solve."""
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

    return jax.vmap(one)(edges.i, edges.j, edges.t_ij, edges.yaw_ij,
                         edges.pitch_i, edges.roll_i, edges.w_t,
                         edges.w_yaw, edges.valid)      # [E,4], [E,4,8]


def linearize_edges(yaws: jax.Array, ts: jax.Array, edges: GraphEdges, n: int):
    """Batched forward-AD linearization of every 4-DoF edge into dense rows
    over the [4·N] state; invalid edges are zero rows. Shared by the
    single-device solve below and the edge-sharded mesh solve
    (:mod:`...parallel.sharded`)."""
    dtype = ts.dtype
    r, J = _edge_blocks(yaws, ts, edges)
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


def _pcg(Hv, Minv, g, iters: int):
    """Preconditioned conjugate gradients for H·x = −g with a fixed trip
    count (``lax.scan`` — no data-dependent control flow under jit). ``Hv``
    and ``Minv`` are linear operators over whatever pytree/array shape ``g``
    has; divisions are guarded so converged/degenerate iterations are
    no-ops."""
    def dot(a, b):
        return jnp.sum(a * b)

    x0 = jnp.zeros_like(g)
    r0 = -g
    z0 = Minv(r0)
    p0 = z0

    def body(carry, _):
        x, r, p, rz = carry
        Hp = Hv(p)
        pHp = dot(p, Hp)
        alpha = jnp.where(pHp > 0, rz / jnp.where(pHp > 0, pHp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Hp
        z = Minv(r)
        rz_new = dot(r, z)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, *_), _ = jax.lax.scan(body, (x0, r0, p0, dot(r0, z0)), None,
                              length=iters)
    return x


@partial(jax.jit, static_argnames=("iters", "cg_iters"))
def optimize_4dof_cg(yaws: jax.Array, ts: jax.Array, node_valid: jax.Array,
                     fixed: jax.Array, edges: GraphEdges, iters: int = 5,
                     cg_iters: int = 256):
    """Matrix-free GN relaxation for LARGE graphs — the scale path past the
    dense-Cholesky bucket. Semantics match :func:`optimize_4dof` (same
    residuals, damping, fixed-node handling); the normal matrix H = JᵀJ is
    never materialized: each CG step is two batched ``[E,4,8]`` einsums plus
    segment scatter-adds (O(E) memory, MXU/VPU friendly), preconditioned by
    the inverted 4×4 block diagonal. ``cg_iters`` must cover the graph
    diameter (information moves ≥1 hop per CG iteration on the mostly-chain
    keyframe graph — callers pick ~n/2 for a 4-predecessor chain).

    The reference reaches the same scale through Ceres'
    SPARSE_NORMAL_CHOLESKY on an unbounded graph (pose_graph.cpp:529-705);
    sparse triangular factorization is sequential and pointer-chasing, so
    the TPU-native equivalent is iterative with batched dense blocks."""
    n = yaws.shape[0]
    dtype = ts.dtype
    free = (node_valid & ~fixed).astype(dtype)

    def gn(carry, _):
        yaws, ts = carry
        r, J = _edge_blocks(yaws, ts, edges)            # [E,4], [E,4,8]
        colmask = jnp.concatenate([
            jnp.repeat(free[edges.i][:, None], 4, 1),
            jnp.repeat(free[edges.j][:, None], 4, 1)], axis=1)
        J = J * colmask[:, None, :]
        ge = jnp.einsum("eck,ec->ek", J, r)             # [E,8] = Jᵀr per edge
        g = (jnp.zeros((n, 4), dtype)
             .at[edges.i].add(ge[:, 0:4]).at[edges.j].add(ge[:, 4:8]))
        Ji, Jj = J[:, :, 0:4], J[:, :, 4:8]
        Pblk = (jnp.zeros((n, 4, 4), dtype)
                .at[edges.i].add(jnp.einsum("eci,ecj->eij", Ji, Ji))
                .at[edges.j].add(jnp.einsum("eci,ecj->eij", Jj, Jj)))
        diag_h = jnp.diagonal(Pblk, axis1=1, axis2=2)
        damp = 1e-6 * diag_h + 1e-8 + (1.0 - free)[:, None]   # [N,4]
        Pinv = jnp.linalg.inv(Pblk + jax.vmap(jnp.diag)(damp))

        def Hv(v):
            ve = jnp.concatenate([v[edges.i], v[edges.j]], axis=1)   # [E,8]
            Jv = jnp.einsum("eck,ek->ec", J, ve)                     # [E,4]
            JtJv = jnp.einsum("eck,ec->ek", J, Jv)                   # [E,8]
            out = (jnp.zeros((n, 4), dtype)
                   .at[edges.i].add(JtJv[:, 0:4])
                   .at[edges.j].add(JtJv[:, 4:8]))
            return out + damp * v

        dx = _pcg(Hv, lambda v: jnp.einsum("nij,nj->ni", Pinv, v), g,
                  cg_iters) * free[:, None]
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


def _edge_blocks_6dof(quats: jax.Array, ts: jax.Array, edges: GraphEdges6):
    """6-DoF twin of :func:`_edge_blocks`: residuals [E,6] + endpoint tangent
    Jacobians [E,6,12] (δθ(3)+δt(3) per node)."""
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

    return jax.vmap(one)(edges.i, edges.j, edges.t_ij, edges.q_ij,
                         edges.w_t, edges.w_q, edges.valid)   # [E,6], [E,6,12]


def linearize_edges_6dof(quats: jax.Array, ts: jax.Array, edges: GraphEdges6,
                         n: int):
    """Batched forward-AD linearization of every 6-DoF edge into dense rows
    over the [6·N] tangent (δθ(3) + δt(3) per node)."""
    dtype = ts.dtype
    r, J = _edge_blocks_6dof(quats, ts, edges)
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


@partial(jax.jit, static_argnames=("iters", "cg_iters"))
def optimize_6dof_cg(quats: jax.Array, ts: jax.Array, node_valid: jax.Array,
                     fixed: jax.Array, edges: GraphEdges6, iters: int = 5,
                     cg_iters: int = 256):
    """Matrix-free PCG variant of :func:`optimize_6dof` for large graphs —
    the 6-DoF twin of :func:`optimize_4dof_cg` (block-Jacobi preconditioned,
    [E,6,12] einsum matvecs, fixed trip counts)."""
    from ..geometry.so3 import quat_mul, quat_normalize

    n = quats.shape[0]
    dtype = ts.dtype
    free = (node_valid & ~fixed).astype(dtype)

    def gn(carry, _):
        quats, ts = carry
        r, J = _edge_blocks_6dof(quats, ts, edges)     # [E,6], [E,6,12]
        colmask = jnp.concatenate([
            jnp.repeat(free[edges.i][:, None], 6, 1),
            jnp.repeat(free[edges.j][:, None], 6, 1)], axis=1)
        J = J * colmask[:, None, :]
        ge = jnp.einsum("eck,ec->ek", J, r)
        g = (jnp.zeros((n, 6), dtype)
             .at[edges.i].add(ge[:, 0:6]).at[edges.j].add(ge[:, 6:12]))
        Ji, Jj = J[:, :, 0:6], J[:, :, 6:12]
        Pblk = (jnp.zeros((n, 6, 6), dtype)
                .at[edges.i].add(jnp.einsum("eci,ecj->eij", Ji, Ji))
                .at[edges.j].add(jnp.einsum("eci,ecj->eij", Jj, Jj)))
        diag_h = jnp.diagonal(Pblk, axis1=1, axis2=2)
        damp = 1e-6 * diag_h + 1e-8 + (1.0 - free)[:, None]
        Pinv = jnp.linalg.inv(Pblk + jax.vmap(jnp.diag)(damp))

        def Hv(v):
            ve = jnp.concatenate([v[edges.i], v[edges.j]], axis=1)
            Jv = jnp.einsum("eck,ek->ec", J, ve)
            JtJv = jnp.einsum("eck,ec->ek", J, Jv)
            out = (jnp.zeros((n, 6), dtype)
                   .at[edges.i].add(JtJv[:, 0:6])
                   .at[edges.j].add(JtJv[:, 6:12]))
            return out + damp * v

        dx = _pcg(Hv, lambda v: jnp.einsum("nij,nj->ni", Pinv, v), g,
                  cg_iters) * free[:, None]
        quats = quat_normalize(quat_mul(
            quats, jnp.concatenate([jnp.ones((n, 1), dtype), 0.5 * dx[:, 0:3]], -1)))
        return (quats, ts + dx[:, 3:6]), None

    (quats, ts), _ = jax.lax.scan(gn, (quats, ts), None, length=iters)
    return quats, ts


def _pad_pow2(x: int, lo: int) -> int:
    """Next power-of-two ≥ max(x, lo) — the static shape buckets that bound
    XLA compiles to O(log N) over an unboundedly growing graph."""
    n = lo
    while n < x:
        n *= 2
    return n


class Keyframe(NamedTuple):
    index: int
    t: float
    pose: np.ndarray          # [7] drift-corrected world_T_body (updatePose)
    kp: np.ndarray            # [K,2] pixel keypoints
    kp_norm: np.ndarray       # [K,2] normalized
    desc: np.ndarray          # [K,8] uint32 packed BRIEF
    kp_ok: np.ndarray         # [K]
    win_pts3d: np.ndarray     # [M,3] window landmarks (world)
    win_norm: np.ndarray      # [M,2] their normalized obs in this KF
    win_desc: np.ndarray      # [M,8] BRIEF at the VIO feature pixels
    win_ok: np.ndarray        # [M]
    vio_pose: Optional[np.ndarray] = None   # [7] raw VIO pose (getVioPose) —
                              # sequential edges and optimize() initial values
                              # are built from THIS, exactly like the
                              # reference (pose_graph.cpp:581-612), so
                              # repeated optimizes never compound


class PoseGraph:
    """Host keyframe graph: place recognition, geometric verification, 4-DoF
    relaxation in the background cadence, drift broadcast."""

    # dense-Cholesky bucket limit: graphs padded past this many nodes take
    # the matrix-free PCG path (optimize_4dof_cg) instead of dense rows
    DENSE_NODE_LIMIT = 256

    def __init__(self, cfg, max_kf: int = 512, cam_focal: float = 460.0):
        self.cfg = cfg
        # initial DB allocation only — the database and keyframe list are
        # unbounded (the DB doubles, optimize() pads to power-of-two buckets)
        self.max_kf = max_kf
        if getattr(cfg.loop, "vocab_path", ""):
            # trained DBoW2 vocabulary (brief_k10L6.bin import,
            # pose_graph_node.cpp:788-790): reference-comparable scores, so
            # the reference's own gates apply
            from .dbow_vocab import DBoW2Vocabulary, SparseBowDatabase

            self.vocab = DBoW2Vocabulary.load_binary(cfg.loop.vocab_path)
            self.db = SparseBowDatabase(
                self.vocab, capacity=max_kf,
                score_best=cfg.loop.dbow_score_best,
                score_min=cfg.loop.dbow_score_min,
                min_gap=cfg.loop.min_loop_gap,
            )
        else:
            self.vocab = None
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
        pose, BoW-register, attempt loop detection + verification. The raw
        VIO pose is kept alongside (updateVioPose/getVioPose)."""
        vio_pose = kf.pose.copy()
        pose = kf.pose.copy()
        R = np.asarray(quat_to_mat(jnp.asarray(pose[3:7])))
        pose[0:3] = self.r_drift @ pose[0:3] + self.t_drift
        pose[3:7] = np.asarray(mat_to_quat(jnp.asarray(self.r_drift @ R)))
        kf = kf._replace(pose=pose, vio_pose=vio_pose)

        if self.vocab is not None:
            hist = self.db.bow_vector(kf.desc, kf.kp_ok)
        else:
            hist = bow_histogram(words_of(jnp.asarray(kf.desc),
                                          jnp.asarray(kf.kp_ok), self.sel))
        # loop_idx is a KEYFRAME index (the DB maps slots → kf indices
        # internally); kf.index is the sequential insertion index, so it is
        # also the position in self.kfs
        loop_idx = self.db.query(hist, kf.index) if detect_loop else -1
        self.db.add(hist, kf_index=kf.index)
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
        # only keyframes from the first looped index on participate; both the
        # initial values and the sequential-edge measurements come from RAW
        # VIO poses, so repeated optimizes never compound
        # (pose_graph.cpp:573-612: getVioPose feeds t_array/euler_array and
        # the FourDOFError relatives)
        base = self.earliest_loop if self.earliest_loop is not None else 0
        span = self.kfs[base:]
        n = len(span)
        poses = np.stack([
            k.vio_pose if k.vio_pose is not None else k.pose for k in span])
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
        for (gi, gj, t_rel, yaw_rel, *_rest) in self.loop_edges:
            i, j = gi - base, gj - base                   # local span indices
            seq_edges.append((i, j, t_rel, yaw_rel, ypr[i, 1], ypr[i, 2],
                              1.0, 0.1))                  # yaw/10 loop weight

        # pad nodes and edges to power-of-two buckets so XLA compiles
        # O(log n) programs over the unboundedly growing graph (the
        # reference's Ceres rebuild compiles nothing; a fresh shape per
        # keyframe count would compile O(n) times)
        e = len(seq_edges)
        n_pad = _pad_pow2(n, 16)
        e_pad = _pad_pow2(e, 64)

        def col(k, pad_val=0.0):
            a = np.full((e_pad,), pad_val)
            a[:e] = [s[k] for s in seq_edges]
            return a

        tij = np.zeros((e_pad, 3))
        tij[:e] = np.stack([s[2] for s in seq_edges])
        E = GraphEdges(
            i=jnp.asarray(col(0), jnp.int32), j=jnp.asarray(col(1), jnp.int32),
            t_ij=jnp.asarray(tij), yaw_ij=jnp.asarray(col(3)),
            pitch_i=jnp.asarray(col(4)), roll_i=jnp.asarray(col(5)),
            w_t=jnp.asarray(col(6)), w_yaw=jnp.asarray(col(7)),
            valid=jnp.asarray(np.arange(e_pad) < e),
        )
        node_valid = np.arange(n_pad) < n
        fixed = np.zeros(n_pad, bool)
        fixed[0] = True       # local 0 == first looped keyframe (span base)
        yaws_p = np.zeros(n_pad)
        yaws_p[:n] = yaws
        ts_p = np.zeros((n_pad, 3))
        ts_p[:n] = ts
        solve = (optimize_4dof if n_pad <= self.DENSE_NODE_LIMIT
                 else partial(optimize_4dof_cg, cg_iters=max(64, n_pad // 2)))
        new_yaws, new_ts = solve(
            jnp.asarray(yaws_p), jnp.asarray(ts_p), jnp.asarray(node_valid),
            jnp.asarray(fixed), E, iters=iters,
        )
        new_yaws, new_ts = np.asarray(new_yaws)[:n], np.asarray(new_ts)[:n]

        # write back optimized poses over the span (rotations = yaw
        # correction on the VIO rotation, q_z(dy) ⊗ q_vio — host-numpy, no
        # per-keyframe device dispatch); drift = newest optimized vs its VIO
        # pose (pose_graph.cpp:657-681: updatePose loop then yaw_drift,
        # r_drift = R(yaw_drift), t_drift = t_opt − r_drift · t_vio)
        from ..utils import np_quat

        for k in range(n):
            dy = new_yaws[k] - yaws[k]
            qz = np.array([np.cos(dy / 2), 0.0, 0.0, np.sin(dy / 2)])
            p = np.empty(7)
            p[0:3] = new_ts[k]
            p[3:7] = np_quat.quat_normalize(
                np_quat.quat_mul(qz, poses[k, 3:7]))
            self.kfs[base + k] = self.kfs[base + k]._replace(pose=p)
        dy = new_yaws[n - 1] - yaws[n - 1]
        self.r_drift = np.asarray(ypr_to_mat(jnp.asarray([dy, 0.0, 0.0])))
        self.t_drift = new_ts[n - 1] - self.r_drift @ ts[n - 1]

    def _optimize_6dof(self, iters: int = 5):
        """optimize6DoF (pose_graph.cpp:707-860): every keyframe carries a
        full quaternion + translation; sequential edges to 4 predecessors and
        loop edges become RelativeRTError rows with the reference's 0.1/0.01
        variances; drift is the full rotation correction of the newest pose
        (pose_graph.cpp:849-853)."""
        base = self.earliest_loop if self.earliest_loop is not None else 0
        span = self.kfs[base:]
        n = len(span)
        poses = np.stack([
            k.vio_pose if k.vio_pose is not None else k.pose for k in span])
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
        for (gi, gj, t_rel, _yaw, *rest) in self.loop_edges:
            q_rel = rest[0] if rest else np.array([1.0, 0, 0, 0])
            edges.append((gi - base, gj - base, t_rel, q_rel, W_T, W_Q))

        e = len(edges)
        n_pad = _pad_pow2(n, 16)
        e_pad = _pad_pow2(e, 64)
        ij = np.zeros((e_pad, 2), np.int32)
        ij[:e] = [(s[0], s[1]) for s in edges]
        tij = np.zeros((e_pad, 3))
        tij[:e] = np.stack([s[2] for s in edges])
        qij = np.zeros((e_pad, 4))
        qij[:, 0] = 1.0
        qij[:e] = np.stack([s[3] for s in edges])
        wt = np.zeros(e_pad)
        wt[:e] = [s[4] for s in edges]
        wq = np.zeros(e_pad)
        wq[:e] = [s[5] for s in edges]
        E6 = GraphEdges6(
            i=jnp.asarray(ij[:, 0]), j=jnp.asarray(ij[:, 1]),
            t_ij=jnp.asarray(tij), q_ij=jnp.asarray(qij),
            w_t=jnp.asarray(wt), w_q=jnp.asarray(wq),
            valid=jnp.asarray(np.arange(e_pad) < e),
        )
        node_valid = np.arange(n_pad) < n
        fixed = np.zeros(n_pad, bool)
        fixed[0] = True       # local 0 == first looped keyframe (span base)
        quats_p = np.zeros((n_pad, 4))
        quats_p[:, 0] = 1.0
        quats_p[:n] = quats
        ts_p = np.zeros((n_pad, 3))
        ts_p[:n] = ts
        solve = (optimize_6dof if n_pad <= self.DENSE_NODE_LIMIT
                 else partial(optimize_6dof_cg, cg_iters=max(64, n_pad // 2)))
        new_q, new_t = solve(
            jnp.asarray(quats_p), jnp.asarray(ts_p), jnp.asarray(node_valid),
            jnp.asarray(fixed), E6, iters=iters,
        )
        new_q, new_t = np.asarray(new_q)[:n], np.asarray(new_t)[:n]
        for k in range(n):
            p = np.empty(7)
            p[0:3] = new_t[k]
            p[3:7] = new_q[k]
            self.kfs[base + k] = self.kfs[base + k]._replace(pose=p)
        # full-rotation drift vs the VIO pose (pose_graph.cpp:849-853)
        R_new = np.asarray(quat_to_mat(jnp.asarray(new_q[n - 1])))
        self.r_drift = R_new @ Rs[n - 1].T
        self.t_drift = new_t[n - 1] - self.r_drift @ ts[n - 1]

    def write_tum(self, path: str) -> None:
        with open(path, "w") as fp:
            for k in self.kfs:
                p = k.pose
                fp.write(f"{k.t:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                         f"{p[4]:.6f} {p[5]:.6f} {p[6]:.6f} {p[3]:.6f}\n")
