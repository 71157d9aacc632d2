"""Distributed oracle (SURVEY §4): the FULL fused window step executed SPMD
over the virtual 8-device CPU mesh must equal the single-device step to
solver tolerance — all factor classes, LM accept/reject, marginalization and
the slide included, since the sharded program IS the single-chip program
under GSPMD partitioning (parallel/sharded.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ground_fusion_tpu.config import Config
from ground_fusion_tpu.estimator.assembly import empty_prior
from ground_fusion_tpu.estimator.layout import StateLayout
from ground_fusion_tpu.estimator.step import EstimatorCore, StepFlags, make_window_step
from ground_fusion_tpu.parallel.sharded import make_lm_mesh, shard_core
from ground_fusion_tpu.sim.synthetic import SimParams, build_window_problem

DT = jnp.float64


def test_sharded_full_step_matches_single_device():
    """N-device output ≡ single-device `make_window_step` output (both
    marginalization branches)."""
    cfg = Config()
    sp = SimParams()
    step, layout = make_window_step(cfg)
    prob = build_window_problem(cfg, sp, dtype=DT)
    f = cfg.num_frames

    rng = np.random.default_rng(3)
    state0 = prob["state"]._replace(
        poses=prob["state"].poses.at[2:, 0:3].add(
            jnp.asarray(rng.normal(0, 0.01, (f - 2, 3)), DT))
    )
    tracks0 = prob["tracks"]._replace(
        inv_depth=prob["tracks"].inv_depth
        * (1.0 + 0.05 * jnp.asarray(rng.normal(0, 1, cfg.solver.max_landmarks)))
    )
    core = EstimatorCore(
        state=state0, tracks=tracks0, imu_buf=prob["imu_buf"],
        wheel_buf=prob["wheel_buf"], prior=empty_prior(layout, f, DT),
    )

    mesh = make_lm_mesh(8)
    for marg_old in (True, False):
        flags = StepFlags(
            marg_old=jnp.asarray(marg_old), stationary=jnp.asarray(False),
            wheel_valid=prob["interval_valid"], imu_valid=prob["interval_valid"],
            td_obs=jnp.zeros(f, DT),
            frame_dts=jnp.asarray(np.diff(prob["ts"], prepend=prob["ts"][0])),
            propagate_newest=jnp.asarray(False),
        )
        core1, out1 = step(core, flags)
        core8, out8 = step(shard_core(core, mesh), flags)

        np.testing.assert_allclose(
            np.asarray(out8["poses"]), np.asarray(out1["poses"]),
            atol=1e-8, err_msg=f"solved poses diverge (marg_old={marg_old})")
        np.testing.assert_allclose(
            np.asarray(core8.tracks.inv_depth), np.asarray(core1.tracks.inv_depth),
            atol=1e-8, err_msg="slid landmark depths diverge")
        # the prior is a SQUARE-ROOT factor from an eigh: the factor itself is
        # only defined up to an orthogonal rotation within (near-)degenerate
        # eigenspaces, so compare the invariants J0ᵀJ0 (information matrix)
        # and J0ᵀr0 (gradient), not the raw factor
        J1, r1 = np.asarray(core1.prior.J0), np.asarray(core1.prior.r0)
        J8, r8 = np.asarray(core8.prior.J0), np.asarray(core8.prior.r0)
        np.testing.assert_allclose(
            J8.T @ J8, J1.T @ J1, atol=1e-5,
            err_msg="marginalization prior information diverges")
        np.testing.assert_allclose(
            J8.T @ r8, J1.T @ r1, atol=1e-5,
            err_msg="marginalization prior gradient diverges")


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


@pytest.mark.slow
def test_dp_sharded_fleet_matches_unsharded():
    """Data-parallel fleet replay: B=8 batched cores with the sequence axis
    sharded over the 8-device mesh must equal the unsharded batched program
    (zero cross-device communication — the DP scale-out axis)."""
    import dataclasses

    from ground_fusion_tpu.estimator.step import make_window_burst_batched
    from ground_fusion_tpu.parallel.sharded import shard_fleet

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, max_landmarks=32, max_iters=4))
    sp = SimParams()
    _, layout = make_window_step(cfg)
    burst, _ = make_window_burst_batched(cfg)
    prob = build_window_problem(cfg, sp, dtype=DT)
    f = cfg.num_frames

    core = EstimatorCore(
        state=prob["state"], tracks=prob["tracks"], imu_buf=prob["imu_buf"],
        wheel_buf=prob["wheel_buf"], prior=empty_prior(layout, f, DT),
    )
    B, K = 8, 3
    cores, fbs = [], []
    for b in range(B):
        cores.append(core._replace(tracks=core.tracks._replace(
            inv_depth=core.tracks.inv_depth * (1.0 + 0.02 * b))))
        flags = StepFlags(
            marg_old=jnp.asarray(True), stationary=jnp.asarray(False),
            wheel_valid=prob["interval_valid"], imu_valid=prob["interval_valid"],
            td_obs=jnp.zeros(f, DT), propagate_newest=jnp.asarray(False),
        )
        fb = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (K,) + jnp.shape(a)), flags
        )._replace(marg_old=jnp.asarray([(k + b) % 2 == 0 for k in range(K)]))
        fbs.append(fb)
    cores_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cores)
    fb_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=1), *fbs)

    c1, o1 = burst(cores_b, fb_b)

    mesh = make_lm_mesh(8, axis="seq")
    cores_s, fb_s = shard_fleet(cores_b, fb_b, mesh, axis="seq")
    c8, o8 = burst(cores_s, fb_s)

    np.testing.assert_allclose(np.asarray(o8["pose"]), np.asarray(o1["pose"]),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(c8.tracks.inv_depth),
                               np.asarray(c1.tracks.inv_depth), atol=1e-8)
