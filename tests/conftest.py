"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Must set env vars BEFORE jax is imported anywhere; pytest imports conftest
first, so this is the single chokepoint.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize forces jax_platforms="axon,cpu" via
# jax.config at import time, overriding the env var — force CPU back before
# any backend initializes.
jax.config.update("jax_platforms", "cpu")

# persistent XLA compile cache: re-runs of the suite replay executables
# from disk instead of recompiling every jit stage (minutes saved per run)
from gtsfm_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs[:8]


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_executable_count():
    """Free compiled executables after each test module.

    A long pytest process accumulates hundreds of live XLA CPU executables;
    compilation then segfaults inside backend_compile (reproducible at the
    same point twice). Clearing caches per module bounds the live set.
    """
    yield
    jax.clear_caches()
