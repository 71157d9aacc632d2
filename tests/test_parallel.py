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
