"""Port of the reference line-search comparison harness
(examples/example-rosenbrock-comparison.cpp): for n = 2..24 step 2, solve
1024 random starts with all four line searches and report the average
objective-evaluation and iteration counts per method — simultaneously a
correctness test (every solution validated to max|x_i - 1| <= 1e-4) and
the line-search performance harness.

The reference's sequential loops become one vmapped launch per method.

Run: python examples/rosenbrock_comparison.py [max_n]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

# The reference program instantiates Scalar=double; run the port in
# f64 so it reproduces the published trajectory standalone (the test
# twin inherits x64 from tests/conftest.py).
jax.config.update("jax_enable_x64", True)

from lbfgspp_tpu import LBFGSParams, minimize
from lbfgspp_tpu.utils.objectives import rosenbrock_fg

METHODS = ["backtracking", "bracketing", "nocedalwright", "morethuente"]


def main(max_n=24, nstarts=1024):
    # Reference settings (example-rosenbrock-comparison.cpp:55-60).
    params = LBFGSParams(epsilon=1e-6, max_iterations=400,
                         max_linesearch=256)
    rng = np.random.default_rng(0)

    header = f"{'n':>4s} " + "".join(
        f"{m:>16s}" for m in METHODS)
    print("Average #f-calls (iterations) per solve, 1024 random starts")
    print(header)
    for n in range(2, max_n + 1, 2):
        x0s = jnp.asarray(rng.uniform(-1.0, 1.0, (nstarts, n)))
        row = f"{n:4d} "
        for method in METHODS:
            solve = jax.jit(jax.vmap(
                lambda x0: minimize(fun_and_grad=rosenbrock_fg, x0=x0,
                                    params=params, line_search=method)))
            res = solve(x0s)
            err = np.max(np.abs(np.asarray(res.x) - 1.0), axis=1)
            assert np.all(err <= 1e-4), \
                f"{method} failed validation at n={n}"
            row += (f"{np.asarray(res.nfev).mean():8.1f}"
                    f"({np.asarray(res.niter).mean():5.1f}) ")
        print(row)
    print("** All methods validated on every start **")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 24)
