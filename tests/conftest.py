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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# NOTE (round 5): this jaxlib's CPU fusion emitters generate
# NON-TERMINATING code for df64 graphs with nested transcendental rules
# (exp depth >= 2) feeding tree reductions — compile succeeds, dispatch
# returns, the fetch spins forever at 100% CPU.  The workaround flag
# `--xla_cpu_use_fusion_emitters=false` CANNOT be set suite-wide: the
# legacy emitters change f64 reduction summation order, flipping
# bit-parity-pinned trajectories (test_acceptance's 22-iteration README
# anchor measures 23 under it).  The few tests needing deep
# transcendental df64 compiles run themselves in a flagged SUBPROCESS
# (tests/test_polish.py::_run_in_flagged_subprocess).  TPU is
# unaffected.
os.environ["XLA_FLAGS"] = flags
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
