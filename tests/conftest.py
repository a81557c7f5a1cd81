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
# Persistent compilation cache for the CPU test programs: the suite
# compiles ~200 XLA programs (several of them large pallas-interpret
# bodies); the disk cache makes reruns skip the native compiles.  Kept
# separate from the chip cache (.jax_cache) so backend keys never mix.
jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

assert jax.default_backend() == "cpu"

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound in-process compiler/runtime state across the suite.

    Two full-suite runs segfaulted (SIGSEGV inside XLA:CPU
    backend_compile, native stack) at ~93% of the suite — always in
    one of the big chain-blocked pallas-kernel compiles, a different
    test each time, with 126 GB RAM free; each crashing test passes in
    isolation.  Dropping the accumulated executable/tracing caches at
    module boundaries removes the state the flaky native compile path
    is sensitive to (and the disk cache above keeps reruns fast)."""
    jax.clear_caches()
    yield


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running multi-process / statistical tests"
    )
