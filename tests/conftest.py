"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

All unit tests run on CPU (the real TPU chip is reserved for benchmarks);
multi-device sharding tests use the 8 virtual host devices.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
