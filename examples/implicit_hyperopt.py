"""Hyperparameter optimization THROUGH the solver (beyond the C++
reference): gradient-based tuning of a ridge penalty where the training
problem is solved by L-BFGS and differentiated implicitly
(`lbfgspp_tpu.diff.implicit_minimize`).

The outer objective is a validation loss evaluated at the inner argmin
w*(log lambda); its gradient flows through the solve via the implicit
function theorem (one history-preconditioned CG solve per backward
pass, no differentiation of the iteration trace).  The outer loop is —
naturally — the same L-BFGS solver, one level up.

Run: python examples/implicit_hyperopt.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from lbfgspp_tpu import LBFGSParams, minimize
from lbfgspp_tpu.diff import implicit_minimize


def main():
    rng = np.random.default_rng(0)
    n_train, n_val, d = 120, 80, 12

    w_true = rng.standard_normal(d)
    A = jnp.asarray(rng.standard_normal((n_train, d)))
    y = jnp.sign(A @ jnp.asarray(w_true) +
                 0.5 * jnp.asarray(rng.standard_normal(n_train)))
    Av = jnp.asarray(rng.standard_normal((n_val, d)))
    yv = jnp.sign(Av @ jnp.asarray(w_true) +
                  0.5 * jnp.asarray(rng.standard_normal(n_val)))

    inner_params = LBFGSParams(epsilon=1e-10, epsilon_rel=0.0,
                               max_iterations=200)

    def train_loss(w, loglam):
        z = y * (A @ w)
        return jnp.mean(jnp.log1p(jnp.exp(-z))) \
            + 0.5 * jnp.exp(loglam) * jnp.sum(w ** 2)

    def val_loss(loglam):
        w = implicit_minimize(train_loss, jnp.zeros(d), loglam,
                              inner_params).x
        z = yv * (Av @ w)
        return jnp.mean(jnp.log1p(jnp.exp(-z)))

    g0 = float(jax.grad(val_loss)(jnp.asarray(0.0)))
    print(f"d val_loss / d loglam at loglam=0: {g0:+.6f}")

    # Outer optimization of the single hyperparameter — with L-BFGS.
    outer = minimize(lambda t: val_loss(t[0]), jnp.zeros(1),
                     LBFGSParams(epsilon=1e-6, max_iterations=30))
    print(f"best loglam = {float(outer.x[0]):+.4f}  "
          f"(lambda = {float(jnp.exp(outer.x[0])):.4g})")
    print(f"val loss: {float(val_loss(jnp.asarray(0.0))):.6f} at loglam=0 "
          f"-> {float(outer.fx):.6f} tuned, "
          f"{int(outer.niter)} outer iterations")


if __name__ == "__main__":
    main()
