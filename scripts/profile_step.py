import os, sys, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# --cpu: force local CPU (the env var is pinned to the remote axon tunnel by
# sitecustomize; per-stage timing there is dominated by dispatch round-trips)
if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")
import numpy as np, jax, jax.numpy as jnp
from ground_fusion_tpu.config import Config
from ground_fusion_tpu.estimator.step import make_window_step
from ground_fusion_tpu.estimator.layout import StateLayout
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

def timeit(fn, *args, n=200):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/n*1e6

print("full step us:", timeit(step, core, flags))

# pieces
from ground_fusion_tpu.estimator.assembly import SolveInputs, empty_prior, assemble_rows, normal_equations, assemble_residuals
from ground_fusion_tpu.estimator.buffers import preintegrate_imu_window, preintegrate_wheel_window
from ground_fusion_tpu.estimator.solver import SolverParams, solve_window, _solve_delta
from ground_fusion_tpu.estimator.marginalization import marginalize_old
from ground_fusion_tpu.estimator.triangulation import triangulate_all
from ground_fusion_tpu.preintegration.imu import noise_cov
from ground_fusion_tpu.preintegration.wheel import wheel_noise_cov

dtype = jnp.float32
n18 = noise_cov(cfg.imu.acc_n, cfg.imu.gyr_n, cfg.imu.acc_w, cfg.imu.gyr_w, dtype)
n12 = wheel_noise_cov(cfg.wheel.vel_n, cfg.wheel.gyr_n, dtype)
state = core.state
pre_i = jax.jit(lambda b, s: preintegrate_imu_window(b, s, n18))
pre_w = jax.jit(lambda b: preintegrate_wheel_window(b, state.s_wheel, state.td_wheel, n12))
print("preint imu us:", timeit(pre_i, core.imu_buf, state.sbs))
print("preint wheel us:", timeit(pre_w, core.wheel_buf))
tri = jax.jit(lambda s, t: triangulate_all(s, t, depth_max=cfg.tracker.depth_max))
print("triangulate us:", timeit(tri, state, tr))

imu_pre = pre_i(core.imu_buf, state.sbs); wheel_pre = pre_w(core.wheel_buf)
inp = SolveInputs(imu_pre=imu_pre, imu_valid=flags.imu_valid, wheel_pre=wheel_pre,
    wheel_valid=flags.wheel_valid, plane_valid=jnp.zeros(f,bool), td_obs=flags.td_obs,
    prior=core.prior, g=jnp.array([0.,0.,9.805],dtype), free_mask=jnp.ones(layout.total,dtype))
params = SolverParams(jnp.asarray(460/1.5,dtype), jnp.asarray(1.0,dtype),
    jnp.asarray([100.,100.,100.],dtype), jnp.asarray(1e-4,dtype), jnp.asarray(3.0,dtype), jnp.asarray(1/3,dtype))

slv = jax.jit(lambda s,t: solve_window(s,t,inp,layout,params,num_iters=8))
print("solve 8 iters us:", timeit(slv, state, tr))
asm = jax.jit(lambda s,t: assemble_rows(s,t,inp,layout,params.sqrt_info_scale,params.cauchy_delta,params.plane_sqrt_info))
print("assemble_rows us:", timeit(asm, state, tr))
res = jax.jit(lambda s,t: assemble_residuals(s,t,inp,layout,params.sqrt_info_scale,params.cauchy_delta,params.plane_sqrt_info))
print("assemble_residuals us:", timeit(res, state, tr))
J, r = asm(state, tr)
print("J shape:", J.shape)
ne = jax.jit(normal_equations)
print("JtJ us:", timeit(ne, J, r))
H, g = ne(J, r)
sd = jax.jit(lambda H,g: _solve_delta(H,g,jnp.asarray(1e-4,dtype),inp.free_mask))
print("cholesky solve us:", timeit(sd, H, g))
mg = jax.jit(lambda s,t: marginalize_old(s,t,inp,layout,params.sqrt_info_scale,params.cauchy_delta,params.plane_sqrt_info))
print("marginalize_old us:", timeit(mg, state, tr))
