"""Lasso regularization path with OWL-QN — one vmap launch.

Classical tooling solves the lasso once per penalty value; here the whole
path is a single batched XLA program (`jax.vmap` over the L1 weight), with
exact zeros in every solution (the orthant projection lands on them).

Run: python examples/lasso_path.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from lbfgspp_tpu import LBFGSParams, minimize_owlqn


def main():
    key = jax.random.PRNGKey(0)
    kA, kw, kn = jax.random.split(key, 3)
    m, n, k_true = 128, 40, 6
    A = jax.random.normal(kA, (m, n)) / jnp.sqrt(m)
    w_true = jnp.zeros(n).at[:k_true].set(jax.random.normal(kw, (k_true,)) * 3)
    b = A @ w_true + 0.02 * jax.random.normal(kn, (m,))

    def loss(x):
        return 0.5 * jnp.sum((A @ x - b) ** 2)

    lam_max = float(jnp.max(jnp.abs(A.T @ b)))
    lams = jnp.geomspace(1e-4 * lam_max, lam_max, 16)

    path = jax.jit(jax.vmap(lambda lam: minimize_owlqn(
        loss, jnp.zeros(n), lam * jnp.ones(n),
        LBFGSParams(epsilon=1e-9, epsilon_rel=0.0, max_iterations=400))))
    res = path(lams)

    nnz = np.asarray((res.x != 0).sum(axis=1))
    print(" lam/lam_max   nnz   loss+L1        iters")
    for i, lam in enumerate(np.asarray(lams)):
        print(f"  {lam/lam_max:9.2e}  {nnz[i]:4d}   {float(res.fx[i]):.6e}"
              f"  {int(res.niter[i]):5d}")
    print(f"true support size: {k_true}; path computed in ONE launch")


if __name__ == "__main__":
    main()
