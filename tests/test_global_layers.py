"""Loop-closure stack tests: FAST/BRIEF matching, BoW scoring, RANSAC PnP,
4-DoF pose-graph relaxation (reference gates from pose_graph.cpp/keyframe.cpp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ground_fusion_tpu.geometry.se3 import pose as make_pose
from ground_fusion_tpu.geometry.so3 import mat_to_quat, ypr_to_mat
from ground_fusion_tpu.global_layers.bow import (
    KeyframeDatabase,
    bow_histogram,
    word_selector,
    words_of,
)
from ground_fusion_tpu.global_layers.brief import (
    brief_describe,
    brief_pattern,
    fast_detect,
    hamming_matrix,
    match_brief,
)
from ground_fusion_tpu.global_layers.pnp import pnp_ransac
from ground_fusion_tpu.global_layers.pose_graph import GraphEdges, optimize_4dof


def _texture(h=120, w=160, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.normal(0, 1, (h // 4, w // 4))
    img = np.kron(base, np.ones((4, 4)))
    pad = np.pad(img, 2, mode="edge")
    from numpy.lib.stride_tricks import sliding_window_view

    img = np.einsum("ijkl->ij", sliding_window_view(pad, (5, 5))) / 25.0
    return (img - img.min()) / (img.max() - img.min()) * 255.0


@pytest.fixture(scope="module")
def pattern():
    pa, pb = brief_pattern()
    return jnp.asarray(pa), jnp.asarray(pb)


def test_fast_brief_self_matching(pattern):
    pa, pb = pattern
    img = _texture(seed=2)
    img_j = jnp.asarray(img, jnp.float32)
    pts, ok = fast_detect(img_j, 20.0, 128)
    assert int(ok.sum()) > 30
    desc = brief_describe(img_j, pts, pa, pb)
    # integer-shifted copy: descriptors at shifted keypoints must match
    shift = np.array([4.0, 2.0], np.float32)
    img2 = np.roll(np.roll(img, 2, axis=0), 4, axis=1)
    desc2 = brief_describe(jnp.asarray(img2, jnp.float32), pts + shift, pa, pb)
    idx, matched = match_brief(desc, ok, desc2, ok, 80)
    idx, matched = np.asarray(idx), np.asarray(matched)
    n_ok = int(np.asarray(ok).sum())
    # most features should match their own shifted copy
    good = (idx[np.asarray(ok)] == np.arange(len(idx))[np.asarray(ok)]) \
        & matched[np.asarray(ok)]
    assert good.mean() > 0.7


def test_hamming_matrix_identity(pattern):
    pa, pb = pattern
    img = jnp.asarray(_texture(seed=4), jnp.float32)
    pts, ok = fast_detect(img, 20.0, 32)
    d = brief_describe(img, pts, pa, pb)
    H = np.asarray(hamming_matrix(d, d))
    assert np.all(np.diag(H) == 0)
    assert H.max() <= 256


def test_bow_same_place_scores_high(pattern):
    pa, pb = pattern
    sel = jnp.asarray(word_selector())
    db = KeyframeDatabase(capacity=64, min_gap=2, score_best=0.30, score_min=0.25)

    def hist_of(seed_or_img):
        img = jnp.asarray(
            seed_or_img if isinstance(seed_or_img, np.ndarray) else _texture(seed=seed_or_img),
            jnp.float32,
        )
        pts, ok = fast_detect(img, 20.0, 256)
        d = brief_describe(img, pts, pa, pb)
        return bow_histogram(words_of(d, ok, sel))

    base = _texture(seed=5)
    for s in range(6):
        db.add(hist_of(s + 10))
    db.add(hist_of(base))           # index 6
    for s in range(3):
        db.add(hist_of(s + 20))
    # revisit the same place later
    q = hist_of(base + np.random.default_rng(0).normal(0, 1.0, base.shape))
    loop = db.query(q, cur_index=12)
    assert loop == 6


def test_pnp_ransac_with_outliers():
    rng = np.random.default_rng(0)
    n = 64
    pts3d = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                      rng.uniform(3, 8, n)], axis=-1)
    R_gt = np.asarray(ypr_to_mat(jnp.asarray([0.2, -0.05, 0.1], jnp.float64)))
    t_gt = np.array([0.4, -0.2, 0.3])
    # pts are in camera frame of a camera at pose (R_gt, t_gt): world pts
    pts_w = pts3d @ R_gt.T + t_gt
    obs = pts3d[:, 0:2] / pts3d[:, 2:3]
    # 30% outliers
    n_out = 20
    obs[:n_out] += rng.uniform(0.1, 0.3, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    pose_gt = np.concatenate([t_gt, np.asarray(mat_to_quat(jnp.asarray(R_gt)))])
    pose0 = pose_gt.copy()
    pose0[0:3] += rng.normal(0, 0.15, 3)   # drifted seed

    pose, inliers, ok = pnp_ransac(
        jnp.asarray(pose0), jnp.asarray(pts_w), jnp.asarray(obs),
        jnp.ones(n, bool), jax.random.PRNGKey(1), min_inliers=25,
    )
    assert bool(ok)
    assert np.linalg.norm(np.asarray(pose)[0:3] - t_gt) < 0.02
    assert int(inliers.sum()) >= n - n_out - 4


def test_optimize_4dof_corrects_drift():
    """Chain with injected yaw drift; one loop edge back to the start must
    pull the end of the chain home (optimize4DoF semantics)."""
    n = 30
    # ground truth: straight line along x
    ts_gt = np.stack([np.arange(n, dtype=np.float64), np.zeros(n), np.zeros(n)], -1)
    yaw_gt = np.zeros(n)
    # drifted estimate: small yaw bias accumulates
    yaw_est = np.cumsum(np.full(n, 0.01))
    ts_est = np.zeros((n, 3))
    for k in range(1, n):
        d = np.array([np.cos(yaw_est[k - 1]), np.sin(yaw_est[k - 1]), 0.0])
        ts_est[k] = ts_est[k - 1] + d

    edges = []
    for j in range(1, n):
        for back in range(1, 5):
            i = j - back
            if i < 0:
                break
            Ri = np.asarray(ypr_to_mat(jnp.asarray([yaw_est[i], 0.0, 0.0])))
            # measured relative motion = drifted odometry
            edges.append((i, j, Ri.T @ (ts_est[j] - ts_est[i]),
                          yaw_est[j] - yaw_est[i], 0.0, 0.0, 1.0, 1.0))
    # loop edge: node n-1 observed at its TRUE pose relative to node 0
    R0 = np.asarray(ypr_to_mat(jnp.asarray([yaw_est[0], 0.0, 0.0])))
    edges.append((0, n - 1, R0.T @ (ts_gt[n - 1] - ts_gt[0]),
                  yaw_gt[n - 1] - yaw_gt[0], 0.0, 0.0, 1.0, 0.1))

    E = GraphEdges(
        i=jnp.asarray([e[0] for e in edges], jnp.int32),
        j=jnp.asarray([e[1] for e in edges], jnp.int32),
        t_ij=jnp.asarray(np.stack([e[2] for e in edges])),
        yaw_ij=jnp.asarray([e[3] for e in edges]),
        pitch_i=jnp.asarray([e[4] for e in edges]),
        roll_i=jnp.asarray([e[5] for e in edges]),
        w_t=jnp.asarray([e[6] for e in edges]),
        w_yaw=jnp.asarray([e[7] for e in edges]),
        valid=jnp.ones(len(edges), bool),
    )
    fixed = np.zeros(n, bool)
    fixed[0] = True
    yaws2, ts2 = optimize_4dof(jnp.asarray(yaw_est), jnp.asarray(ts_est),
                               jnp.ones(n, bool), jnp.asarray(fixed), E, iters=10)
    end_err_before = np.linalg.norm(ts_est[-1] - ts_gt[-1])
    end_err_after = np.linalg.norm(np.asarray(ts2)[-1] - ts_gt[-1])
    assert end_err_after < 0.2 * end_err_before
    assert end_err_after < 0.5


def test_global_fusion_gps_priors():
    """GlobalFusion: drifted VIO chain + GPS priors → globally-aligned path
    and a consistent WGPS_T_WVIO update (globalOpt.cpp semantics)."""
    from ground_fusion_tpu.global_layers.global_fusion import GlobalFusion
    from ground_fusion_tpu.geometry.so3 import mat_to_quat, ypr_to_mat

    gf = GlobalFusion()
    n = 40
    rng = np.random.default_rng(0)
    # true straight path east at 1 m/s; VIO drifts in yaw
    for k in range(n):
        t = float(k)
        yaw_d = 0.004 * k
        Rk = np.asarray(ypr_to_mat(jnp.asarray([yaw_d, 0.0, 0.0], jnp.float64)))
        # drifted VIO position
        if k == 0:
            p = np.zeros(3)
        else:
            prev = gf.vio_poses[-1][0:3]
            d = np.array([np.cos(yaw_d), np.sin(yaw_d), 0.0])
            p = prev + d
        pose = np.concatenate([p, np.asarray(mat_to_quat(jnp.asarray(Rk)))])
        gf.input_odom(t, pose)
        # GPS at true position (east = x) every 2nd step, 10 cm accuracy
        if k % 2 == 0:
            lat0, lon0 = 31.0, 121.4
            east = float(k)
            lat = lat0
            lon = lon0 + np.rad2deg(east / (6378137.0 * np.cos(np.deg2rad(lat0))))
            gf.input_gps(t, lat, lon, 10.0, 0.1)
    gf.optimize(iters=8)
    final = gf.global_poses[-1][0:3]
    err_before = np.linalg.norm(np.stack(gf.vio_poses)[-1][0:3] - np.array([n - 1, 0, 0]))
    err_after = np.linalg.norm(final - np.array([n - 1.0, 0.0, 0.0]))
    assert err_after < 0.35, f"global error {err_after:.3f} (vio drift was {err_before:.3f})"
    assert err_after < 0.3 * err_before


def test_optimize_6dof_recovers_chain():
    """optimize6DoF (pose_graph.cpp:707-860): full-SE(3) relaxation recovers
    a ground-truth chain — including roll/pitch error, which the 4-DoF
    relaxation cannot correct."""
    import numpy as np

    from ground_fusion_tpu.geometry.so3 import mat_to_quat, quat_to_mat, ypr_to_mat
    from ground_fusion_tpu.global_layers.pose_graph import (
        GraphEdges6, optimize_6dof,
    )

    rng = np.random.default_rng(2)
    n = 16
    gt_ypr = np.cumsum(rng.normal(0, 0.08, (n, 3)), axis=0)
    gt_R = np.stack([np.asarray(quat_to_mat(mat_to_quat(
        jnp.asarray(ypr_to_mat(jnp.asarray(y)))))) for y in gt_ypr])
    gt_t = np.cumsum(rng.normal(0, 0.4, (n, 3)), axis=0)
    gt_q = np.stack([np.asarray(mat_to_quat(jnp.asarray(R))) for R in gt_R])

    # noisy init (rotation AND translation), first node exact + fixed
    def boxplus(q, dth):
        from ground_fusion_tpu.geometry.so3 import quat_mul, quat_normalize
        return np.asarray(quat_normalize(quat_mul(
            jnp.asarray(q), jnp.asarray(np.concatenate([[1.0], 0.5 * dth])))))

    q0 = np.stack([boxplus(gt_q[k], rng.normal(0, 0.03, 3)) for k in range(n)])
    t0 = gt_t + rng.normal(0, 0.1, (n, 3))
    q0[0], t0[0] = gt_q[0], gt_t[0]

    ei, ej, tij, qij = [], [], [], []
    for j in range(1, n):
        for back in (1, 2):
            i = j - back
            if i < 0:
                continue
            ei.append(i)
            ej.append(j)
            tij.append(gt_R[i].T @ (gt_t[j] - gt_t[i]))
            qij.append(np.asarray(mat_to_quat(jnp.asarray(gt_R[i].T @ gt_R[j]))))
    e = len(ei)
    E6 = GraphEdges6(
        i=jnp.asarray(ei, jnp.int32), j=jnp.asarray(ej, jnp.int32),
        t_ij=jnp.asarray(np.stack(tij)), q_ij=jnp.asarray(np.stack(qij)),
        w_t=jnp.full(e, 10.0), w_q=jnp.full(e, 100.0),
        valid=jnp.ones(e, bool),
    )
    fixed = jnp.zeros(n, bool).at[0].set(True)
    q1, t1 = optimize_6dof(jnp.asarray(q0), jnp.asarray(t0),
                           jnp.ones(n, bool), fixed, E6, iters=8)
    np.testing.assert_allclose(np.asarray(t1), gt_t, atol=1e-5)
    dots = np.abs(np.sum(np.asarray(q1) * gt_q, axis=1))
    assert np.all(dots > 1.0 - 1e-8), f"rotation error: {1 - dots.min():.2e}"
