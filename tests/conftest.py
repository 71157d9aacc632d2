"""Test configuration: force an 8-virtual-device CPU platform.

The container pins ``JAX_PLATFORMS=axon`` (remote TPU tunnel) via
sitecustomize; numeric tests must run on local CPU in f64, and sharding tests
against a virtual 8-device mesh, so we override through jax.config (the env
var is ignored once the plugin registers).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: the estimator tests compile large f64 window
# programs; cache them on disk so re-runs of the suite skip XLA compilation.
# (Harmless machine-feature E-logs from the CPU AOT loader are expected.)
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_compile_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
