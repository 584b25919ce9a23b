"""Port of the reference box-constrained example
(examples/example-rosenbrock-box.cpp): chained Rosenbrock n=25 over
[2, 4]^25 with the third variable unbounded and mixed boundary starts.

Run: python examples/rosenbrock_box.py
"""

import numpy as np
import jax
import jax.numpy as jnp

# The reference program instantiates Scalar=double; run the port in
# f64 so it reproduces the published trajectory standalone (the test
# twin inherits x64 from tests/conftest.py).
jax.config.update("jax_enable_x64", True)

from lbfgspp_tpu import LBFGSBParams, minimize_b
from lbfgspp_tpu.utils.objectives import rosenbrock_chained_fg


def main():
    n = 25
    lb = np.full(n, 2.0)
    ub = np.full(n, 4.0)
    lb[2], ub[2] = -np.inf, np.inf          # third variable unbounded
    x0 = np.full(n, 3.0)
    x0[0] = x0[1] = 2.0                      # some starts at the bounds
    x0[5] = x0[7] = 4.0

    res = jax.jit(lambda x: minimize_b(
        fun_and_grad=rosenbrock_chained_fg, x0=x,
        lb=jnp.asarray(lb), ub=jnp.asarray(ub),
        params=LBFGSBParams()))(jnp.asarray(x0))

    print(f"{int(res.niter)} iterations")
    print("x =", res.x)
    print(f"f(x) = {float(res.fx):.10g}")
    print("grad =", res.grad)
    print(f"projected grad norm = {float(res.gnorm):.4g}")


if __name__ == "__main__":
    main()
