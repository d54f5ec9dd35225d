"""Test configuration: force an 8-device virtual CPU mesh.

All unit tests run on CPU (the real TPU chip is reserved for benchmarks);
multi-device sharding tests use the 8 virtual host devices.

NOTE: the environment sets JAX_PLATFORMS=axon and a sitecustomize may import
jax before this file runs, so the env var alone is not enough — we also flip
the platform via jax.config, which takes effect as long as no backend has
been initialized yet (conftest runs before any test touches devices).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
