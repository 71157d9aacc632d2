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
