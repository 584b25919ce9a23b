"""Port of the reference multistart sweep
(examples/example-rosenbrock-bracketing.cpp): for n = 2..16 step 2, solve
from 1024 uniform-random starts with the bracketing line search and assert
max|x_i - 1| <= 1e-4 on every run.

The reference loops the 1024 starts sequentially; here each sweep is ONE
vmapped, jitted device launch — the de-facto convergence regression test
doubling as the batch-mode demo.

Run: python examples/rosenbrock_bracketing.py
"""

import numpy as np
import jax
import jax.numpy as jnp

# The reference program instantiates Scalar=double; run the port in
# f64 so it reproduces the published trajectory standalone (the test
# twin inherits x64 from tests/conftest.py).
jax.config.update("jax_enable_x64", True)

from lbfgspp_tpu import LBFGSParams, minimize
from lbfgspp_tpu.utils.objectives import rosenbrock_fg


def main():
    # Reference solver settings (example-rosenbrock-bracketing.cpp:42-46).
    params = LBFGSParams(epsilon=1e-6, max_iterations=400,
                         max_linesearch=256)
    rng = np.random.default_rng(0)

    for n in range(2, 17, 2):
        solve = jax.jit(jax.vmap(
            lambda x0: minimize(fun_and_grad=rosenbrock_fg, x0=x0,
                                params=params, line_search="bracketing")))
        x0s = jnp.asarray(rng.uniform(-1.0, 1.0, (1024, n)))
        res = solve(x0s)
        err = np.max(np.abs(np.asarray(res.x) - 1.0), axis=1)
        ok = np.mean(err <= 1e-4)
        print(f"n = {n:2d}: {ok * 100:.1f}% of 1024 starts converged to "
              f"max|x-1| <= 1e-4 "
              f"(avg {np.asarray(res.niter).mean():.1f} iterations)")
        assert np.all(err <= 1e-4), f"sweep failed at n={n}"
    print("** All sweeps passed the reference tolerance **")


if __name__ == "__main__":
    main()
