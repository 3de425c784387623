"""Test configuration: force the CPU backend with 8 virtual devices.

The container's sitecustomize registers the tunneled `axon` TPU backend and
overrides JAX_PLATFORMS, so we must flip the config *before* the backend
initializes (any jax op). Every op on the tunneled chip costs ~0.4s of relay
latency — tests would take hours there.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu", "tests must run on CPU"
    yield


@pytest.fixture(scope="module", autouse=True)
def _clear_jit_caches():
    """Drop compiled executables between test modules.

    The XLA:CPU compiler segfaults (reproducibly, in backend_compile) on the
    streaming-decode while_loop graph when hundreds of executables from
    earlier modules are still alive; per-module cache clearing keeps the
    compiler healthy and the suite's memory flat. Each module still shares
    compilations across its own tests (the expensive intra-module reuse)."""
    yield
    jax.clear_caches()
