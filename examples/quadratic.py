"""Port of the reference free-function example
(examples/example-quadratic.cpp): minimize ||x - d||^2 with a plain
function objective and automatic differentiation.

Run: python examples/quadratic.py
"""

import jax
import jax.numpy as jnp

# The reference program instantiates Scalar=double; run the port in
# f64 so it reproduces the published trajectory standalone (the test
# twin inherits x64 from tests/conftest.py).
jax.config.update("jax_enable_x64", True)

from lbfgspp_tpu import LBFGSParams, minimize


def quadratic(x):
    d = jnp.arange(x.shape[0], dtype=x.dtype)
    return jnp.sum((x - d) ** 2)


def main():
    n = 10
    res = minimize(quadratic, jnp.zeros((n,)),
                   LBFGSParams(epsilon=1e-6, max_iterations=100))
    print(f"{int(res.niter)} iterations")
    print("x =", res.x)
    print(f"f(x) = {float(res.fx):.6g}")


if __name__ == "__main__":
    main()
