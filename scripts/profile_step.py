"""Per-stage device timing of the fused window step.

Timing protocol (round-5 fix): on the remote axon tunnel,
``jax.block_until_ready`` silently does NOT wait for device completion until
the first device→host transfer of the process has happened; after one
``np.asarray`` it blocks for real, and every dispatch then costs a ~25 ms
round trip. Both effects make single-dispatch timing useless, so every number
here comes from K iterations of the stage CHAINED inside one ``lax.scan``
dispatch (a scalar fed through the chain keeps the iterations data-dependent
so XLA cannot collapse them), with the dispatch floor measured and
subtracted:   per_iter = (t(K) - floor) / K.

Run with --cpu for the local-CPU variant (fast iteration, no tunnel).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")
import numpy as np, jax, jax.numpy as jnp
from ground_fusion_tpu.config import Config
from ground_fusion_tpu.estimator.step import make_window_step, make_window_burst
from __graft_entry__ import _example_core_and_flags

cfg = Config()
step, layout = make_window_step(cfg)
core, flags = _example_core_and_flags(cfg, jnp.float32)
ml, f = cfg.solver.max_landmarks, cfg.num_frames
tr = core.tracks._replace(active=jnp.ones(ml,bool), solve_ok=jnp.ones(ml,bool),
    obs=core.tracks.obs.at[...,0].set(0.1).at[...,1].set(-0.05).at[...,4].set(2.0),
    obs_valid=jnp.ones((ml,f),bool), inv_depth=jnp.full((ml,),0.5,jnp.float32))
ib = core.imu_buf._replace(dts=jnp.full_like(core.imu_buf.dts,0.005), acc=core.imu_buf.acc.at[...,2].set(9.805), valid=jnp.ones_like(core.imu_buf.valid))
wb = core.wheel_buf._replace(dts=jnp.full_like(core.wheel_buf.dts,0.01), vel=core.wheel_buf.vel.at[...,0].set(0.5), valid=jnp.ones_like(core.wheel_buf.valid))
core = core._replace(tracks=tr, imu_buf=ib, wheel_buf=wb)

# force truly-blocking dispatch before ANY timing
np.asarray(jax.jit(lambda a: a + 1)(jnp.ones(4)))

def best_of(fn, *args, rounds=3):
    out = fn(*args); jax.block_until_ready(out)
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter(); out = fn(*args); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best

FLOOR = best_of(jax.jit(lambda a: a + 1.0), jnp.ones(4))
print("dispatch floor: %.2f ms" % (FLOOR * 1e3))

def chain_time(make_body, K=64):
    """make_body(eps_scalar) -> scalar; chained K times in one dispatch."""
    def prog(s0):
        def body(s, _):
            return make_body(s), None
        return jax.lax.scan(body, s0, None, length=K)[0]
    t = best_of(jax.jit(prog), jnp.asarray(0.0, jnp.float32))
    return max(t - FLOOR, 0.0) / K * 1e3   # ms / iter

# ---- full step (burst program = production replay path) ----
burst, _ = make_window_burst(cfg)
K = 64
fb = jax.tree_util.tree_map(lambda a: jnp.broadcast_to(a, (K,) + jnp.shape(a)), flags)
t = best_of(burst, core, fb)
step_ms = (t - FLOOR) / K * 1e3
print("full step (burst chain): %.3f ms" % step_ms)

# ---- stages ----
from ground_fusion_tpu.estimator.assembly import SolveInputs, assemble_rows, normal_equations, assemble_residuals
from ground_fusion_tpu.estimator.buffers import preintegrate_imu_window, preintegrate_wheel_window
from ground_fusion_tpu.estimator.solver import SolverParams, solve_window, _solve_delta
from ground_fusion_tpu.estimator.marginalization import marginalize_old, marginalize_second_new
from ground_fusion_tpu.estimator.triangulation import triangulate_all
from ground_fusion_tpu.preintegration.imu import noise_cov
from ground_fusion_tpu.preintegration.wheel import wheel_noise_cov

dtype = jnp.float32
n18 = noise_cov(cfg.imu.acc_n, cfg.imu.gyr_n, cfg.imu.acc_w, cfg.imu.gyr_w, dtype)
n12 = wheel_noise_cov(cfg.wheel.vel_n, cfg.wheel.gyr_n, dtype)
state = core.state
imu_pre = preintegrate_imu_window(core.imu_buf, state.sbs, n18)
wheel_pre = preintegrate_wheel_window(core.wheel_buf, state.s_wheel, state.td_wheel, n12)
inp = SolveInputs(imu_pre=imu_pre, imu_valid=flags.imu_valid, wheel_pre=wheel_pre,
    wheel_valid=flags.wheel_valid, plane_valid=jnp.zeros(f,bool), td_obs=flags.td_obs,
    prior=core.prior, g=jnp.array([0.,0.,9.805],dtype), free_mask=jnp.ones(layout.total,dtype))
params = SolverParams(jnp.asarray(460/1.5,dtype), jnp.asarray(1.0,dtype),
    jnp.asarray([100.,100.,100.],dtype), jnp.asarray(1e-4,dtype), jnp.asarray(3.0,dtype), jnp.asarray(1/3,dtype))

def perturb_state(s, e):
    return state._replace(poses=state.poses + e * 1e-12)

print("preint imu:        %7.3f ms" % chain_time(
    lambda e: jnp.sum(preintegrate_imu_window(
        core.imu_buf._replace(acc=core.imu_buf.acc + e * 1e-12), state.sbs, n18).delta_p)))
print("preint wheel:      %7.3f ms" % chain_time(
    lambda e: jnp.sum(preintegrate_wheel_window(
        core.wheel_buf._replace(vel=core.wheel_buf.vel + e * 1e-12),
        state.s_wheel, state.td_wheel, n12).delta_p)))
print("triangulate:       %7.3f ms" % chain_time(
    lambda e: jnp.sum(triangulate_all(perturb_state(state, e), tr,
                                      depth_max=cfg.tracker.depth_max).inv_depth)))
print("solve (8 it %s/%s): %7.3f ms" % (cfg.solver.method, cfg.solver.linear_solver,
    chain_time(lambda e: solve_window(perturb_state(state, e), tr, inp, layout, params,
        num_iters=cfg.solver.max_iters, method=cfg.solver.method,
        linear_solver=cfg.solver.linear_solver)[2])))
print("  1 iter:          %7.3f ms" % chain_time(
    lambda e: solve_window(perturb_state(state, e), tr, inp, layout, params,
        num_iters=1, method=cfg.solver.method, linear_solver=cfg.solver.linear_solver)[2]))
print("  assemble_rows:   %7.3f ms" % chain_time(
    lambda e: jnp.sum(assemble_rows(perturb_state(state, e), tr, inp, layout,
        params.sqrt_info_scale, params.cauchy_delta, params.plane_sqrt_info)[0])))
print("  assemble_resid:  %7.3f ms" % chain_time(
    lambda e: jnp.sum(assemble_residuals(perturb_state(state, e), tr, inp, layout,
        params.sqrt_info_scale, params.cauchy_delta, params.plane_sqrt_info))))
J, r = assemble_rows(state, tr, inp, layout, params.sqrt_info_scale,
                     params.cauchy_delta, params.plane_sqrt_info)
print("  J shape:", J.shape, " nx:", layout.nx)
print("  JtJ:             %7.3f ms" % chain_time(
    lambda e: jnp.sum(normal_equations(J + e * 1e-12, r)[0])))
H, g = normal_equations(J, r)
print("  chol solve:      %7.3f ms" % chain_time(
    lambda e: jnp.sum(_solve_delta(H + e * 1e-12, g, jnp.asarray(1e-4, dtype),
                                   inp.free_mask))))
print("marginalize_old:   %7.3f ms" % chain_time(
    lambda e: jnp.sum(marginalize_old(perturb_state(state, e), tr, inp, layout,
        params.sqrt_info_scale, params.cauchy_delta, params.plane_sqrt_info).J0)))
print("marginalize_2nd:   %7.3f ms" % chain_time(
    lambda e: jnp.sum(marginalize_second_new(perturb_state(state, e),
        core.prior, layout).J0)))
