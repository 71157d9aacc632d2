"""Multi-PROCESS distributed oracle (VERDICT r4 #5): the same N-device ≡
1-device window-step equality the virtual-mesh tests assert, but with the 8
devices split across TWO OS processes joined by ``jax.distributed`` — a real
process boundary with a coordinator, the closest single-box analog of the
2-host DCN deployment (SURVEY §5 distributed backend). Each worker holds 4
CPU devices; the landmark-sharded window step and the DP fleet both span the
global mesh, and every process checks its addressable shards against a
locally-computed single-device reference.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r'''
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
pid, port = int(sys.argv[1]), sys.argv[2]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert len(jax.devices()) == 8, jax.devices()
assert len(jax.local_devices()) == 4

import numpy as np
import jax.numpy as jnp
sys.path.insert(0, os.environ["GF_REPO"])
from ground_fusion_tpu.config import Config
from ground_fusion_tpu.estimator.assembly import empty_prior
from ground_fusion_tpu.estimator.step import (
    EstimatorCore, StepFlags, make_window_step, make_window_burst_batched,
)
from ground_fusion_tpu.sim.synthetic import SimParams, build_window_problem
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DT = jnp.float64
cfg = Config()
sp = SimParams()
step, layout = make_window_step(cfg)
prob = build_window_problem(cfg, sp, dtype=DT)
f = cfg.num_frames
core = EstimatorCore(state=prob["state"], tracks=prob["tracks"],
                     imu_buf=prob["imu_buf"], wheel_buf=prob["wheel_buf"],
                     prior=empty_prior(layout, f, DT))
flags = StepFlags(marg_old=jnp.asarray(True), stationary=jnp.asarray(False),
                  wheel_valid=prob["interval_valid"],
                  imu_valid=prob["interval_valid"],
                  td_obs=jnp.zeros(f, DT), propagate_newest=jnp.asarray(False))

# single-device local reference (process-local device 0)
core1, out1 = step(core, flags)
ref_poses = np.asarray(out1["poses"])
ref_depth = np.asarray(core1.tracks.inv_depth)

# global landmark-sharded step across both processes: every input is
# identical on both processes, so device_put onto the global mesh is legal
mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("lm",))
shard = NamedSharding(mesh, P("lm"))
repl = NamedSharding(mesh, P())

def place_tracks(tr):
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, shard), tr)

core_g = EstimatorCore(
    state=jax.tree_util.tree_map(lambda a: jax.device_put(a, repl), core.state),
    tracks=place_tracks(core.tracks),
    imu_buf=jax.tree_util.tree_map(lambda a: jax.device_put(a, repl), core.imu_buf),
    wheel_buf=jax.tree_util.tree_map(lambda a: jax.device_put(a, repl), core.wheel_buf),
    prior=jax.tree_util.tree_map(lambda a: jax.device_put(a, repl), core.prior),
)
core8, out8 = step(core_g, flags)

def check_global(x, ref, name, atol=1e-8):
    for s in x.addressable_shards:
        np.testing.assert_allclose(np.asarray(s.data), ref[s.index],
                                   atol=atol, err_msg=f"{name} shard {s.index}")

check_global(out8["poses"], ref_poses, "poses")
check_global(core8.tracks.inv_depth, ref_depth, "inv_depth")

# DP fleet split across the process boundary: B=8 cores, one per device
fleet, _ = make_window_burst_batched(cfg)
K = 3
cores_b = jax.tree_util.tree_map(
    lambda a: jnp.broadcast_to(a, (8,) + jnp.shape(a)), core)
flags_b = jax.tree_util.tree_map(
    lambda a: jnp.broadcast_to(a, (K, 8) + jnp.shape(a)), flags)
cf, of = fleet(cores_b, flags_b)              # local reference
ref_fleet = np.asarray(of["poses"])

b_shard = NamedSharding(mesh, P("lm"))
kb_shard = NamedSharding(mesh, P(None, "lm"))
cores_g = jax.tree_util.tree_map(lambda a: jax.device_put(a, b_shard), cores_b)
flags_g = jax.tree_util.tree_map(lambda a: jax.device_put(a, kb_shard), flags_b)
cfg_, ofg = fleet(cores_g, flags_g)
check_global(ofg["poses"], ref_fleet, "fleet poses")

print(f"WORKER_OK {pid}")
'''


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_step_and_fleet(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    env = dict(os.environ, GF_REPO=repo)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", _WORKER, str(pid), str(port)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {pid}" in out, f"worker {pid} incomplete:\n{out[-4000:]}"
