"""Port of the reference quick-start (examples/example-rosenbrock.cpp):
float32 Rosenbrock n=10 with the final Hessian accessors printed.

Run: python examples/rosenbrock.py
"""

import jax
import jax.numpy as jnp

from lbfgspp_tpu import (LBFGSParams, minimize, final_approx_hessian,
                         final_approx_inverse_hessian)
from lbfgspp_tpu.utils.objectives import rosenbrock_fg


def main():
    n = 10
    # The reference example uses float (example-rosenbrock.cpp:33-34).
    params = LBFGSParams(epsilon=1e-5, epsilon_rel=1e-5)
    x0 = jnp.zeros((n,), jnp.float32)

    res = jax.jit(lambda x: minimize(fun_and_grad=rosenbrock_fg, x0=x,
                                     params=params))(x0)
    print(f"{int(res.niter)} iterations")
    print("x =", res.x)
    print(f"f(x) = {float(res.fx):.6g}")
    print("Approximate Hessian (5x5 corner):")
    print(final_approx_hessian(res)[:5, :5])
    print("Approximate inverse Hessian (5x5 corner):")
    print(final_approx_inverse_hessian(res)[:5, :5])


if __name__ == "__main__":
    main()
