"""Benchmark: batched L-BFGS (+ L-BFGS-B) Rosenbrock solves per second per chip.

The BASELINE.json north-star metric: >= 10^4 batched Rosenbrock n=100
solves/s/chip via one vmapped, jitted solve (the reference's analog is a
*sequential* 1024-start loop, examples/example-rosenbrock-comparison.cpp:64).

Prints ONE JSON line.  ``value`` is the headline unconstrained metric
(solves/s, quality-gated: the run also reports the fraction of instances
meeting the reference's own multistart criterion max|x-1| <= 1e-4,
example-rosenbrock-bracketing.cpp:50-54); the box-constrained batched
metric rides along as ``box_*`` fields so rounds are comparable on both
solver families.

Three-phase headline solve: f32 main phase (m=16, 162 iterations,
line search capped at 2 trials with on_ls_fail="restart" — under vmap
every iteration pays the batch-MAX trial count, so the cap collapses
the trial loop, and the restart makes the low cap safe; PERF.md
round-4) + 5 WARM-STARTED df64 pair-polish iterations at the full trial
budget (utils/doublefloat.py) + a straggler-targeted deep df64 stage
(batch.deep_polish) covering every polish-unconverged instance with a
60-iteration cold-df64 budget — recovers the reference's
double-precision solution quality on f32 hardware and meets the
reference's EVERY-RUN multistart criterion (frac = 1.0000).  The enlarged history (m=16 vs the reference default 6) cuts
the iteration count superlinearly on this objective while the
per-iteration [2m, n] products stay cheap at n=100; both phases use the
``direction="rinv"`` compact-form R^-1 two-loop (3 [m, m] matvecs per
direction instead of 2m sequential sweep steps — same direction up to
rounding); the polish inherits the main phase's curvature history
lifted into pair space (batch.polish_solve(warm_history=)), halving the
df64 iterations needed for equal quality.  Measured frontier in
PERF.md.

Runs on the default backend (TPU via axon when available, CPU otherwise);
everything is jitted once and re-run — nothing eager touches the device.
Batch size and repetitions are tunable via BENCH_BATCH / BENCH_REPS.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import dataclasses

    from lbfgspp_tpu import LBFGSParams, LBFGSBParams, lbfgs, lbfgsb
    from lbfgspp_tpu.batch import (polish_solve, polish_solve_b,
                                   _merge_polished, deep_polish)
    from lbfgspp_tpu.utils.objectives import rosenbrock

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    batch = int(os.environ.get("BENCH_BATCH", 4096 if on_tpu else 256))
    reps = int(os.environ.get("BENCH_REPS", 3 if on_tpu else 1))
    n = 100
    dtype = jnp.float32 if on_tpu else jnp.float64

    # --- headline: unconstrained batched solve + warm df64 polish +
    # straggler-targeted deep df64 refinement ---
    # Three phases (PERF.md frontier): f32 main (m=16, rinv), 5 warm df64
    # polish iterations for the 99.9%, then a deep cold-df64 budget for
    # the hardest k_deep instances — this is what closes the last ~0.05%
    # to the reference's every-run criterion.  Cost at the shipped
    # k_deep = 3*batch/16: ~7% of headline throughput (most selected
    # instances converge in a few df64 iterations; the while exits
    # early), measured in the round-4 frontier sweeps.
    # The MAIN phase caps the line search at 2 trials: under vmap every
    # iteration pays the BATCH-MAX trial count (not the 1.2-eval mean),
    # and capping it collapses the trial loop.  Capped searches
    # occasionally FAIL mid-valley; on_ls_fail="restart" (below) turns
    # that from a stopped instance into a curvature-reset continuation,
    # which is what makes the low cap safe (without restart mls=2 breaks
    # a 0.3% tail; with it, 1.0000 on every probed seed — round-4
    # frontier in PERF.md).  The df64 polish/deep phases keep the
    # reference's full trial budget.
    params = LBFGSParams(epsilon=1e-5, max_iterations=162, m=16,
                         max_linesearch=2 if on_tpu else 20)
    pol_params = LBFGSParams(epsilon=1e-5, max_iterations=162, m=16)
    polish_iters = 5
    direction = "rinv"
    # k_deep covers every near-criterion straggler the polish leaves
    # (the x-criterion failures carry mid-pack gradient norms; 3/16 of
    # the batch bounds their measured selection ranks across seeds —
    # scripts/probe_seed_robustness.py) — deep-converging them to the
    # gnorm criterion certifies the x criterion via the Hessian bound.
    k_deep = max(4, 3 * batch // 16)
    deep_iters = 60

    def solve_one(x0):
        # on_ls_fail="restart": the trial-capped search occasionally
        # fails MID-VALLEY on hard instances; stopping there (the
        # reference semantics) would idle the instance for the rest of
        # the budget and hand a poisoned history to the polish — the
        # restart continues from a curvature reset instead.  Measured:
        # this + the k_deep coverage gives frac = 1.0000 on every
        # probed seed (PERF.md round-4 robustness).
        res = lbfgs.minimize(rosenbrock, x0, params, direction=direction,
                             on_ls_fail="restart" if on_tpu else "stop")
        if on_tpu:
            pol = polish_solve(rosenbrock, res.x, pol_params, polish_iters,
                               direction=direction,
                               warm_history=res.history)
            res = _merge_polished(res, pol)
        return res

    def solve_batch(xs):
        res = jax.vmap(solve_one)(xs)
        if on_tpu:
            res = deep_polish(rosenbrock, res, pol_params, k_deep,
                              deep_iters, direction=direction)
        return res

    solve = jax.jit(solve_batch)

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (batch, n)), dtype)

    # Warm-up / compile.  NOTE: on the remote-TPU (axon) backend
    # block_until_ready acks dispatch without awaiting execution, so a
    # device-to-host fetch is the only reliable sync point.
    res = solve(x0s)
    np.asarray(res.fx)

    t0 = time.perf_counter()
    for _ in range(reps):
        res = solve(x0s)
        np.asarray(res.fx)
    dt = time.perf_counter() - t0
    solves_per_s = batch * reps / dt

    xn = np.asarray(res.x, np.float64)
    solved = float(np.mean(np.max(np.abs(xn - 1.0), axis=1) <= 1e-4))
    near = float(np.mean(np.max(np.abs(xn - 1.0), axis=1) <= 1e-3))

    # --- box-constrained batched solve (prefix GCP fast path) ---
    # The judged BASELINE.json box config: Rosenbrock n=10, lb=2, ub=4
    # (README.md:164-193 variant).  Constrained optimum: every pair pins
    # (x_even, x_odd) = (2, 4), f* = 5.0 — an active-boundary problem that
    # exercises the GCP + BOXCQP machinery on every iteration.
    bn = 10
    bbatch = min(batch, 4096)
    bparams = LBFGSBParams(epsilon=1e-6, max_iterations=60)
    lb = jnp.full((bn,), 2.0, dtype)
    ub = jnp.full((bn,), 4.0, dtype)
    sb = lbfgsb.solver(rosenbrock, lb, ub, bparams, gcp="prefix")
    # The f32 box solve terminates at the f32 objective plateau (the
    # past/delta test fires while coordinates are still ~1e-4 off their
    # bounds: ulp(5) ~ 5e-7 hides that error in fx).  The active-set
    # df64 polish (batch.polish_solve_b) pins KKT-consistent bound-active
    # coordinates exactly and refines free ones in pair space.
    bpol_params = dataclasses.replace(pol_params, epsilon=1e-7, m=6)

    def bsolve_one(x0):
        res = sb.finalize(sb.run(sb.init(x0)))
        if on_tpu:
            res = polish_solve_b(rosenbrock, res.x, lb, ub, bpol_params, 4,
                                 prior=res)
        return res

    bsolve = jax.jit(lambda xs: jax.vmap(bsolve_one)(xs))

    bx0 = jnp.asarray(rng.uniform(2.0, 4.0, (bbatch, bn)), dtype)
    bres = bsolve(bx0)
    np.asarray(bres.fx)
    t0 = time.perf_counter()
    for _ in range(reps):
        bres = bsolve(bx0)
        np.asarray(bres.fx)
    bdt = time.perf_counter() - t0
    box_solves_per_s = bbatch * reps / bdt
    bfx = np.asarray(bres.fx, np.float64)
    # Quality gate at the SAME rigor as the headline: the x-space 1e-4
    # criterion against the known constrained optimum — every (even, odd)
    # pair pins at (2, 4) (example-rosenbrock-box.cpp:36-64 analog; the
    # coupling term 100(x_odd - x_even^2)^2 drives x_odd to its bound once
    # x_even is pinned at lb).  fx rides along as a secondary check.
    bx_star = np.tile([2.0, 4.0], bn // 2)
    bxn = np.asarray(bres.x, np.float64)
    box_solved = float(np.mean(np.max(np.abs(bxn - bx_star), axis=1) <= 1e-4))
    box_fx_ok = float(np.mean(bfx <= 5.0 + 1e-3))

    it = params.max_iterations
    phase = (f"main m={params.m} {it} it mls=2+restart + warm df64 polish "
             f"{polish_iters} + deep df64 {deep_iters} on worst {k_deep}, "
             f"rinv" if on_tpu
             else f"main m={params.m} {it} it, no polish (cpu)")
    print(json.dumps({
        "metric": f"batched Rosenbrock n={n} L-BFGS solves/s/chip "
                  f"(batch={batch}, backend={backend}, {phase}, "
                  f"frac_x_within_1e-4={solved:.4f}, within_1e-3={near:.4f})",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1e4, 4),
        "frac_within_1e-4": round(solved, 4),
        "box_metric": f"batched box Rosenbrock n={bn} lb=2 ub=4 L-BFGS-B "
                      f"solves/s/chip (batch={bbatch}, eps=1e-6, "
                      f"prefix GCP{' + active-set df64 polish' if on_tpu else ''}; "
                      f"frac_optimal = x-space max|x-x*|<=1e-4 criterion)",
        "box_value": round(box_solves_per_s, 2),
        "box_vs_target": round(box_solves_per_s / 1e4, 4),
        "box_frac_optimal": round(box_solved, 4),
        "box_frac_fx_ok": round(box_fx_ok, 4),
    }))


if __name__ == "__main__":
    main()
