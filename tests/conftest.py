"""Test configuration: force an 8-device virtual CPU platform for all tests.

Multi-chip sharding tests run on a simulated mesh (no real pod needed); kernel
parity tests run fine on CPU too and keep CI independent of TPU availability.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
