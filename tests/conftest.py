"""Test configuration: CPU backend with 8 virtual devices (multi-chip
sharding tests without TPU hardware) and x64 for oracle-precision checks."""
import os

# Force CPU: the driver environment pins JAX_PLATFORMS=axon (tunneled TPU),
# but unit tests need x64 + 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Belt and braces: something (a pytest plugin) may import jax before this
# conftest runs, in which case the env var alone is too late.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA compiles of the jitted solver dominate
# the suite wall-clock; cache them across test runs (and xdist workers).
jax.config.update("jax_compilation_cache_dir", "/tmp/idocp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:  # flag name varies across JAX versions
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def iiwa():
    from idocp_tpu.models import iiwa14
    return iiwa14.make_model()


@pytest.fixture(scope="session")
def anymal():
    from idocp_tpu.models import anymal
    return anymal.make_model()


@pytest.fixture(params=["iiwa", "anymal"])
def robot_model(request, iiwa, anymal):
    """Dual fixture: fixed-base and floating-base (reference test pattern,
    SURVEY.md §4.1)."""
    return {"iiwa": iiwa, "anymal": anymal}[request.param]
