"""Mesh-sharded Schur BA: the sharded solve must agree with ground truth to
solver tolerance on the virtual 8-device CPU mesh (SURVEY §4: distributed
windows solved on 1 chip vs N-shard must agree)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ground_fusion_tpu.config import Config
from ground_fusion_tpu.estimator.assembly import SolveInputs, empty_prior
from ground_fusion_tpu.estimator.buffers import (
    preintegrate_imu_window,
    preintegrate_wheel_window,
)
from ground_fusion_tpu.estimator.layout import PER_FRAME, StateLayout
from ground_fusion_tpu.estimator.window import retract
from ground_fusion_tpu.parallel.sharded import make_sharded_gn, shard_tracks
from ground_fusion_tpu.preintegration.imu import noise_cov
from ground_fusion_tpu.preintegration.wheel import wheel_noise_cov
from ground_fusion_tpu.sim.synthetic import SimParams, build_window_problem

DT = jnp.float64


def test_sharded_gn_recovers_window():
    cfg = Config()
    sp = SimParams()
    prob = build_window_problem(cfg, sp, dtype=DT)
    layout = StateLayout(cfg.num_frames, cfg.solver.max_landmarks)
    f = cfg.num_frames

    n18 = noise_cov(cfg.imu.acc_n, cfg.imu.gyr_n, cfg.imu.acc_w, cfg.imu.gyr_w, DT)
    n12 = wheel_noise_cov(cfg.wheel.vel_n, cfg.wheel.gyr_n, DT)
    imu_pre = preintegrate_imu_window(prob["imu_buf"], prob["state"].sbs, n18)
    wheel_pre = preintegrate_wheel_window(
        prob["wheel_buf"], prob["state"].s_wheel, prob["state"].td_wheel, n12
    )
    free = np.ones(layout.total)
    free[: 2 * PER_FRAME] = 0.0
    free[PER_FRAME * f : layout.nx] = 0.0
    inp = SolveInputs(
        imu_pre=imu_pre, imu_valid=prob["interval_valid"],
        wheel_pre=wheel_pre, wheel_valid=prob["interval_valid"],
        plane_valid=jnp.zeros(f, bool), td_obs=jnp.zeros(f, DT),
        prior=empty_prior(layout, f, DT),
        g=jnp.array([0.0, 0.0, sp.g_norm], DT),
        free_mask=jnp.asarray(free, DT),
    )

    rng = np.random.default_rng(3)
    delta = np.zeros(layout.nx)
    for k in range(2, f):
        delta[PER_FRAME * k : PER_FRAME * k + 6] = rng.normal(0, 0.02, 6)
    state0 = retract(prob["state"], jnp.asarray(delta, DT), layout)
    tracks0 = prob["tracks"]._replace(
        inv_depth=prob["tracks"].inv_depth
        * (1.0 + 0.05 * jnp.asarray(rng.normal(0, 1, cfg.solver.max_landmarks)))
    )

    mesh = jax.make_mesh((8,), ("lm",))
    solve = make_sharded_gn(cfg, mesh, iters=10)
    tracks_sh = shard_tracks(tracks0, mesh)
    state1, tracks1 = solve(state0, tracks_sh, inp)

    pos_err = float(jnp.max(jnp.abs(state1.poses[:, 0:3] - prob["state"].poses[:, 0:3])))
    assert pos_err < 2e-3, f"sharded GN pose error {pos_err}"
    dep_err = float(jnp.max(jnp.abs(jnp.where(
        prob["tracks"].active, tracks1.inv_depth - prob["tracks"].inv_depth, 0.0))))
    assert dep_err < 5e-3, f"sharded GN depth error {dep_err}"


def test_sharded_pose_graph_matches_single():
    """Edge-sharded 4-DoF relaxation == single-device optimize_4dof."""
    import numpy as np
    from ground_fusion_tpu.global_layers.pose_graph import (
        GraphEdges, optimize_4dof,
    )
    from ground_fusion_tpu.parallel.sharded import (
        make_sharded_pose_graph, shard_edges,
    )

    rng = np.random.default_rng(5)
    n = 24
    gt_yaw = np.cumsum(rng.normal(0, 0.1, n))
    gt_t = np.cumsum(rng.normal(0, 0.5, (n, 3)), axis=0)
    # noisy initial guess
    yaws0 = gt_yaw + rng.normal(0, 0.05, n)
    ts0 = gt_t + rng.normal(0, 0.1, (n, 3))
    yaws0[0], ts0[0] = gt_yaw[0], gt_t[0]

    def rotz(y):
        c, s = np.cos(y), np.sin(y)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])

    ei, ej, tij, yij = [], [], [], []
    for j in range(1, n):
        for back in (1, 2):
            i = j - back
            if i < 0:
                continue
            ei.append(i)
            ej.append(j)
            tij.append(rotz(gt_yaw[i]).T @ (gt_t[j] - gt_t[i]))
            yij.append(gt_yaw[j] - gt_yaw[i])
    e = len(ei)
    edges = GraphEdges(
        i=jnp.asarray(ei, jnp.int32), j=jnp.asarray(ej, jnp.int32),
        t_ij=jnp.asarray(np.stack(tij)), yaw_ij=jnp.asarray(yij),
        pitch_i=jnp.zeros(e), roll_i=jnp.zeros(e),
        w_t=jnp.ones(e), w_yaw=jnp.ones(e), valid=jnp.ones(e, bool),
    )
    node_valid = jnp.ones(n, bool)
    fixed = jnp.zeros(n, bool).at[0].set(True)

    y1, t1 = optimize_4dof(jnp.asarray(yaws0), jnp.asarray(ts0), node_valid,
                           fixed, edges, iters=6)

    mesh = jax.make_mesh((8,), ("lm",))
    solve = make_sharded_pose_graph(mesh, n_nodes=n, iters=6)
    es = shard_edges(edges, mesh)
    y2, t2 = solve(jnp.asarray(yaws0), jnp.asarray(ts0), node_valid, fixed, es)

    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-8)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), atol=1e-8)
    # and it actually recovers ground truth
    np.testing.assert_allclose(np.asarray(t2), gt_t, atol=1e-5)
