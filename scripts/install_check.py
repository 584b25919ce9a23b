"""Smoke-test an INSTALLED lbfgspp_tpu (not the repo checkout).

Run from outside the repo with the install dir first on PYTHONPATH (see
``make install-check``).  Proves the wheel is self-contained: the JAX
solvers import and solve, and the native C++ core self-builds from the
shipped ``native/*.cpp`` sources (the reference's CI analogously builds
its examples from the installed header set, .bcr/presubmit.yml:1-15).
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

import lbfgspp_tpu  # noqa: E402
from lbfgspp_tpu import LBFGSBParams, LBFGSParams, lbfgs, lbfgsb  # noqa: E402
from lbfgspp_tpu.utils.objectives import rosenbrock  # noqa: E402


def main() -> None:
    if len(sys.argv) > 1:
        want = sys.argv[1]
        got = lbfgspp_tpu.__file__
        assert got.startswith(want), f"imported {got}, expected under {want}"

    res = lbfgs.minimize(
        rosenbrock, jnp.full((10,), -1.0), LBFGSParams(epsilon=1e-6))
    assert float(jnp.max(jnp.abs(res.x - 1.0))) <= 1e-4, res
    print(f"jax L-BFGS ok: niter={int(res.niter)} fx={float(res.fx):.3g}")

    lb, ub = jnp.full((10,), 2.0), jnp.full((10,), 4.0)
    bres = lbfgsb.minimize(
        rosenbrock, jnp.full((10,), 3.0), lb, ub, LBFGSBParams())
    assert abs(float(bres.fx) - 5.0) <= 1e-6, bres
    print(f"jax L-BFGS-B ok: niter={int(bres.niter)} fx={float(bres.fx):.6g}")

    import lbfgspp_tpu.native as native

    assert native.available(), native.build_error()
    nres = native.minimize("rosenbrock", [-1.0] * 10)
    assert nres.status == lbfgspp_tpu.Status.CONVERGED_GRAD, nres
    assert abs(nres.fx) < 1e-8, nres
    print(f"native core ok: niter={nres.niter} fx={nres.fx:.3g}")
    print("install-check PASSED")


if __name__ == "__main__":
    main()
