"""The production batch pipeline: f32 throughput with an every-run
quality certificate.

The reference's own acceptance standard is per-run, not aggregate: its
multistart example asserts ``max|x_i - 1| <= 1e-4`` on EVERY one of
1024 random starts (examples/example-rosenbrock-bracketing.cpp:50-54).
In f64 that is trivial; on f32 accelerators a plain solve stalls at the
rounding floor ~1e-4 short of it.  This example runs the bench headline
recipe — the configuration measured at 26k solves/s/chip with the
criterion met on every instance of every probed seed (PERF.md
round-4):

1. a trial-capped f32 main phase (``max_linesearch=2``: under vmap
   every iteration pays the batch-MAX trial count, so the cap collapses
   the trial loop) with ``on_ls_fail="restart"`` (a failed search
   continues from a curvature reset instead of idling the instance);
2. a warm-started df64 pair polish at the reference's full trial budget
   (``polish_params``), inheriting the main phase's curvature history;
3. a deep df64 stage for the hardest ~19% of instances (selection:
   unconverged first, then gradient norm), which certifies the x-space
   criterion through the gradient-norm bound.

Run: python examples/batch_certified.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from lbfgspp_tpu import LBFGSParams
from lbfgspp_tpu.batch import minimize_batched
from lbfgspp_tpu.utils.objectives import rosenbrock


def main():
    B, n = 512, 100
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (B, n)), jnp.float32)

    main_params = LBFGSParams(epsilon=1e-5, max_iterations=162, m=16,
                              max_linesearch=2)
    full_params = LBFGSParams(epsilon=1e-5, max_iterations=162, m=16)

    res = minimize_batched(
        rosenbrock, x0s, main_params,
        direction="rinv",                 # compact-form R^-1 two-loop
        on_ls_fail="restart",             # capped-search robustification
        polish_iters=5, polish_warm=True,
        polish_params=full_params,        # full budget for the df64 phases
        deep_frac=0.19, deep_iters=60)

    err = np.max(np.abs(np.asarray(res.x, np.float64) - 1.0), axis=1)
    q = float(np.mean(err <= 1e-4))
    print(f"batch {B} x n={n} (f32 storage): "
          f"frac within the reference's 1e-4 criterion = {q:.4f}")
    print(f"worst instance error: {err.max():.2e}")
    assert q == 1.0, "every-run criterion violated"
    print("every-run criterion met on all instances")


if __name__ == "__main__":
    main()
