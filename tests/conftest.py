"""Test configuration: force an 8-device virtual CPU platform for all tests.

Multi-chip sharding tests run on a simulated mesh (no real pod needed); kernel
parity tests run on CPU in full f32 precision and stay independent of TPU
availability.  Note: the container's sitecustomize imports jax before pytest
starts, so plain env vars are too late — use jax.config.update instead.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
