"""Train a small MLP with L-BFGS over its parameter pytree.

The reference's user contract is a flat vector objective
(/root/reference/README.md:19-22); `minimize_pytree` lifts the same solver
to structured JAX parameters — the canonical "full-batch training with a
quasi-Newton method" workflow.  The parameter tree goes in, the fitted tree
comes out, and it drops straight back into the forward pass.

Run: python examples/mlp_pytree.py
"""

import jax
import jax.numpy as jnp

from lbfgspp_tpu import LBFGSParams, minimize_pytree


def main():
    key = jax.random.PRNGKey(0)
    kx, k1, k2, k3 = jax.random.split(key, 4)

    # Data: a 1-D regression target.
    xs = jax.random.uniform(kx, (256, 1), minval=-3.0, maxval=3.0)
    ys = jnp.sin(2.0 * xs) + 0.3 * xs ** 2

    params0 = {
        "l1": {"w": 0.5 * jax.random.normal(k1, (1, 32)),
               "b": jnp.zeros((32,))},
        "l2": {"w": 0.5 * jax.random.normal(k2, (32, 32)),
               "b": jnp.zeros((32,))},
        "out": {"w": 0.5 * jax.random.normal(k3, (32, 1)),
                "b": jnp.zeros((1,))},
    }

    def forward(p, x):
        h = jnp.tanh(x @ p["l1"]["w"] + p["l1"]["b"])
        h = jnp.tanh(h @ p["l2"]["w"] + p["l2"]["b"])
        return h @ p["out"]["w"] + p["out"]["b"]

    def loss(p):
        return jnp.mean((forward(p, xs) - ys) ** 2)

    nparam = sum(x.size for x in jax.tree.leaves(params0))
    print(f"MLP with {nparam} parameters; initial loss {float(loss(params0)):.4f}")

    res = jax.jit(lambda p: minimize_pytree(
        loss, p, LBFGSParams(epsilon=1e-7, max_iterations=500)))(params0)

    print(f"final loss {float(res.fx):.3e} in {int(res.niter)} iterations "
          f"({int(res.nfev)} evaluations), status {int(res.status)}")
    # The result pytree is a drop-in replacement for the initial parameters.
    rmse = float(jnp.sqrt(jnp.mean((forward(res.x, xs) - ys) ** 2)))
    print(f"train RMSE {rmse:.3e}")


if __name__ == "__main__":
    main()
