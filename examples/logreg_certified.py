"""Certified batch solves on a TRANSCENDENTAL objective (f* != 0).

`batch_certified.py` shows the bench recipe on Rosenbrock, whose
minimum value is 0 — the friendliest case for f32, because the
objective's floating-point resolution improves as instances converge.
Most production objectives are not like that: a logistic-regression
loss converges to f* ~ O(rows), where one f32 ulp of fx is ~1e-6 x f*
and the line search goes blind to per-step decreases long before the
gradient criterion — BOTH the f32 main phase and a naive df64 polish
stall at ``||g|| ~ sqrt(L * ulp(f*))`` (measured ~1e-3 at f* ~ 25;
PERF.md round-5 "Does the recipe transfer").

This example applies the two round-5 recipe rules that make the same
three-phase pipeline transfer, untuned, to this family:

1. ``polish_shift=True`` — each polish evaluates the objective MINUS
   its own df64 value at the phase start, subtracted as a two-word
   (hi, lo) constant inside the pair arithmetic, so sub-ulp(f*)
   decreases stay visible to the line search;
2. certificate-scaled polish exit: the gnorm criterion certifies the
   x-criterion through the optimum's smallest Hessian eigenvalue
   (here >= the ridge lam), so the polish params use
   ``epsilon ~ 0.1 * lam * tol_x`` and ``epsilon_rel = 0`` (the
   default relative test would re-loosen the exit).

Measured on the v5e chip (batch 4096, 3 seeds, PERF.md): every
instance reaches |grad|_inf <= 1e-5 — one order INSIDE the 1e-4
acceptance bar — at ~5k solves/s.

Run: python examples/logreg_certified.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# CPU-only workaround, set BEFORE jax initializes: this jaxlib's CPU
# fusion emitters generate non-terminating code for the nested
# transcendental df64 graphs this example compiles (see CLAUDE.md /
# tests/conftest.py); harmless on TPU (the flag is CPU-specific).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_cpu_use_fusion_emitters" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_cpu_use_fusion_emitters=false").strip()

import numpy as np
import jax
import jax.numpy as jnp

from lbfgspp_tpu import LBFGSParams
from lbfgspp_tpu.batch import minimize_batched


def main():
    rows, n, lam = 64, 32, 0.1
    # TPU: the measured production scale.  CPU: a small batch — the df64
    # polish graphs compile slowly on the CPU backend, and the point of
    # the example is the recipe, not CPU throughput.
    on_tpu = jax.default_backend() not in ("cpu",)
    batch = 512 if on_tpu else 32
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(rows, n)) / np.sqrt(n), jnp.float32)
    b = jnp.asarray(np.sign(rng.normal(size=rows)), jnp.float32)

    def logreg(w):
        # float32 matmul precision: TPU f32 matmuls default to bf16
        # passes whose ~1e-4 gradient noise would sit above the 1e-6
        # polish exit (CLAUDE.md; same wrapper as the round-5
        # measurement script probe_recipe_families.py).
        with jax.default_matmul_precision("float32"):
            z = -b * (a @ w)
            return (jnp.sum(jnp.logaddexp(0.0, z))
                    + 0.5 * lam * jnp.dot(w, w))

    x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (batch, n)), jnp.float32)

    main_params = LBFGSParams(epsilon=1e-5, max_iterations=24, m=16,
                              max_linesearch=2)          # trial-capped
    polish_params = LBFGSParams(epsilon=0.1 * lam * 1e-4,  # certificate
                                epsilon_rel=0.0,           # rule
                                max_iterations=162, m=16)

    res = minimize_batched(
        logreg, x0s, main_params,
        polish_params=polish_params,
        polish_iters=40,
        polish_shift=True,                 # the f* != 0 rule
        direction="rinv",
        on_ls_fail="restart",
        deep_frac=3 / 16, deep_iters=60)

    # certify in f64 against the true gradient
    a64 = np.asarray(a, np.float64)
    b64 = np.asarray(b, np.float64)
    x64 = np.asarray(res.x, np.float64)
    z = -b64 * (x64 @ a64.T)
    g = (-b64 / (1.0 + np.exp(-z))) @ a64 + lam * x64
    gi = np.max(np.abs(g), axis=1)
    print(f"batch {batch}: frac(|grad|_inf <= 1e-4) = "
          f"{float(np.mean(gi <= 1e-4)):.4f}, "
          f"<= 1e-5: {float(np.mean(gi <= 1e-5)):.4f}, "
          f"worst {gi.max():.2e}")
    assert np.all(gi <= 1e-4), "certificate failed"
    print("every instance certified.")


if __name__ == "__main__":
    main()
