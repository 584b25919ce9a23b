"""Test configuration.

Tests run on CPU with 8 virtual devices (so sharding/collective paths are
exercised without a pod) and with float64 enabled (so numerics can be checked
against the reference's double-precision anchors).  The environment variables
must be set before JAX initializes its backends, hence the top-of-module
placement.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402

# The environment may pre-register an accelerator plugin and bake
# JAX_PLATFORMS before this file runs; config.update wins either way.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    jaxlib's CPU JIT aborts inside backend_compile_and_load after a few
    hundred distinct compilations accumulate in one process (reproducible
    at the tail of the full suite); clearing the executable caches at
    module boundaries keeps the live-code footprint bounded."""
    yield
    jax.clear_caches()
