"""Test configuration: run everything on a virtual 8-device CPU mesh.

The session environment pre-imports jax and registers the remote 'axon' TPU
platform via a sitecustomize (PYTHONPATH=/root/.axon_site) with
JAX_PLATFORMS=axon latched into jax.config at that import — so plain env-var
overrides are ignored; we must go through jax.config.update before any
backend initializes.  Eager ops dispatched to axon round-trip a network
tunnel (~100ms+/op), so tests must never touch it.

Multi-chip sharding is validated on host-platform virtual devices (the driver
separately dry-runs the multichip path); real-TPU numbers come from bench.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running multi-process / statistical tests"
    )
