"""Collective audit: pin the communication footprint of sharded solves.

PERF.md's scaling budget rests on a counted claim: per solver iteration the
sharded L-BFGS program communicates exactly one fused psum for the history
update ([2m+2, 2] Gram/gate product), one fused psum for the two-loop
matvecs, and the line search's per-trial scalar reductions (SURVEY.md §5
distributed-communication audit).  This test compiles the actual sharded
programs on the 8-virtual-device CPU mesh and counts collective ops in the
optimized HLO — if a change adds a per-iteration collective (e.g. un-fusing
a Gram product back into per-dot psums), the static op count jumps and this
fails before any perf run would notice.

Static HLO ops are an upper bound on per-iteration communication: the
whole solve is ONE while loop, so each all-reduce op in its body executes
at most once per iteration (line-search trials run in their own inner loop
whose body is counted once here too).
"""

import conftest  # noqa: F401

import re

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from lbfgspp_tpu import LBFGSParams, LBFGSBParams
from lbfgspp_tpu.parallel.sharded import (minimize_sharded,
                                          minimize_b_sharded, sharding_for)


def _collective_counts(fn, *args):
    txt = jax.jit(fn).lower(*args).compile().as_text()
    # Count op *definitions* (`... = ty[shape] all-reduce(...)`), not the
    # `%all-reduce.N` operand references that mentions of the result make.
    ops = re.findall(r"\b(all-reduce|all-gather|all-to-all"
                     r"|collective-permute|reduce-scatter)\(", txt)
    counts = {}
    for op in ops:
        counts[op] = counts.get(op, 0) + 1
    return counts


def _mesh():
    return Mesh(np.asarray(jax.devices()), ("feat",))


def test_lbfgs_sharded_collective_budget():
    mesh = _mesh()
    n = 8 * 16
    shard = sharding_for(mesh)

    def local_fun(x_local):
        return jnp.sum((x_local - 1.0) ** 2) + 0.1 * jnp.sum(x_local ** 4)

    x0 = jax.device_put(jnp.zeros(n), shard)
    p = LBFGSParams(epsilon=1e-8, max_iterations=50)

    counts = _collective_counts(
        lambda x: minimize_sharded(local_fun, x, p, mesh=mesh), x0)
    total = sum(counts.values())
    # Expected all-reduce sites in the whole program (each at most once per
    # outer iteration): init gnorm/xnorm/step + objective-value psum and
    # directional-derivative psum in the line-search trial body + history
    # fused Gram psum + two-loop fused psum + convergence-test norms.
    # The pinned value is the measured footprint of the current design;
    # the assertion is a regression tripwire, so allow small drift down
    # but none up.
    assert counts.get("all-gather", 0) == 0, counts
    assert counts.get("all-to-all", 0) == 0, counts
    assert counts.get("reduce-scatter", 0) == 0, counts
    # Current footprint: 6 all-reduce ops total — init (gnorm/xnorm/step
    # fused by XLA), line-search trial body (objective + directional
    # derivative), history Gram psum, two-loop psum, convergence norms.
    assert total <= 6, (total, counts)


def test_lbfgsb_sharded_collective_budget():
    mesh = _mesh()
    n = 8 * 16
    shard = sharding_for(mesh)

    def local_fun(x_local):
        return jnp.sum((x_local - 3.0) ** 2)

    x0 = jax.device_put(jnp.full(n, 2.5), shard)
    lb = jax.device_put(jnp.full(n, 2.0), shard)
    ub = jax.device_put(jnp.full(n, 4.0), shard)
    p = LBFGSBParams(epsilon=1e-8, max_iterations=50)

    counts = _collective_counts(
        lambda x, l, u: minimize_b_sharded(local_fun, x, l, u, p, mesh=mesh,
                                           gcp="walk"),
        x0, lb, ub)
    total = sum(counts.values())
    assert counts.get("all-to-all", 0) == 0, counts
    assert counts.get("all-gather", 0) == 0, counts
    # The box solver adds the GCP segment walk (psum-carried interval
    # state), the BOXCQP middle-matrix reductions and the projected-grad
    # pmax / step_max pmin. Current footprint: 27 all-reduce ops.
    assert total <= 27, (total, counts)

    # The round-5 default gcp="auto" compiles BOTH walk branches plus the
    # crossing-count estimate psum; the chunked branch contributes its
    # documented [K]-candidate all-gather (latency-class, 2 collectives
    # per K crossed values at runtime) — so the static definition count
    # grows, but the runtime cost model stays pure-latency all-reduce +
    # one small all-gather per chunk round.
    counts_auto = _collective_counts(
        lambda x, l, u: minimize_b_sharded(local_fun, x, l, u, p,
                                           mesh=mesh),
        x0, lb, ub)
    assert counts_auto.get("all-to-all", 0) == 0, counts_auto
    assert counts_auto.get("all-gather", 0) <= 2, counts_auto
    assert sum(counts_auto.values()) <= 60, counts_auto


def test_lbfgs_rinv_collective_budget_matches_sweeps():
    """``direction="rinv"`` maintains/applies R^{-1} on replicated [m, m]
    state, so its collective footprint must equal the sweeps schedule's
    (6 all-reduce ops; the feeding inner products ride the same fused
    psums)."""
    mesh = _mesh()
    n = 8 * 16
    shard = sharding_for(mesh)

    def local_fun(x_local):
        return jnp.sum((x_local - 1.0) ** 2) + 0.1 * jnp.sum(x_local ** 4)

    x0 = jax.device_put(jnp.zeros(n), shard)
    p = LBFGSParams(epsilon=1e-8, max_iterations=50)

    c_sweeps = _collective_counts(
        lambda x: minimize_sharded(local_fun, x, p, mesh=mesh), x0)
    c_rinv = _collective_counts(
        lambda x: minimize_sharded(local_fun, x, p, mesh=mesh,
                                   direction="rinv"), x0)
    assert sum(c_rinv.values()) == sum(c_sweeps.values()), (c_rinv, c_sweeps)
    assert c_rinv.get("all-gather", 0) == 0, c_rinv


def test_lbfgsb_walk_chunked_collective_budget():
    """The K-chunked segment walk trades K-fold local work for a K-fold
    cut in collective ROUNDS; its static op count must not exceed the
    plain walk's (27 all-reduce)."""
    mesh = _mesh()
    n = 8 * 16
    shard = sharding_for(mesh)

    def local_fun(x_local):
        return jnp.sum((x_local - 3.0) ** 2)

    x0 = jax.device_put(jnp.full(n, 2.5), shard)
    lb = jax.device_put(jnp.full(n, 2.0), shard)
    ub = jax.device_put(jnp.full(n, 4.0), shard)
    p = LBFGSBParams(epsilon=1e-8, max_iterations=50)

    counts = _collective_counts(
        lambda x, l, u: minimize_b_sharded(local_fun, x, l, u, p, mesh=mesh,
                                           gcp="walk_chunked"), x0, lb, ub)
    assert counts.get("all-to-all", 0) == 0, counts
    assert counts.get("all-gather", 0) == 0, counts
    assert sum(counts.values()) <= 27, counts


def test_owlqn_sharded_collective_budget():
    """Sharded OWL-QN: pseudo-gradient + orthant projection add only
    elementwise work; footprint is 5 all-reduce ops (its backtracking
    search needs one trial-body psum, one fewer than NW's two)."""
    from lbfgspp_tpu.parallel.sharded import minimize_owlqn_sharded

    mesh = _mesh()
    n = 8 * 16
    shard = sharding_for(mesh)

    def local_fun(x_local):
        return jnp.sum((x_local - 1.0) ** 2) + 0.1 * jnp.sum(x_local ** 4)

    x0 = jax.device_put(jnp.zeros(n), shard)
    p = LBFGSParams(epsilon=1e-8, max_iterations=50)
    counts = _collective_counts(
        lambda x: minimize_owlqn_sharded(local_fun, x, 0.1, p, mesh=mesh),
        x0)
    assert counts.get("all-gather", 0) == 0, counts
    assert sum(counts.values()) <= 5, counts


def test_implicit_diff_cg_collective_budget():
    """The collective-CG adjoint (backward pass) adds one psum per CG dot
    on top of the forward solve: 12 all-reduce ops preconditioned, 10
    unpreconditioned — and no gathers anywhere."""
    from lbfgspp_tpu.diff import implicit_minimize_sharded

    mesh = _mesh()
    n = 8 * 16
    k = n // 8
    shard = sharding_for(mesh)

    def local_fun_th(x_l, th):
        i = jax.lax.axis_index("feat")
        th_l = jax.lax.dynamic_slice_in_dim(th, i * k, k)
        return jnp.sum(0.5 * (x_l - th_l) ** 2 + 0.1 * (x_l - th_l) ** 4)

    x0 = jax.device_put(jnp.zeros(n), shard)
    theta = jnp.zeros(n)
    p = LBFGSParams(epsilon=1e-8, max_iterations=50)
    for pre, cap in ((True, 12), (False, 10)):
        counts = _collective_counts(
            jax.grad(lambda th, pre=pre: jnp.sum(implicit_minimize_sharded(
                local_fun_th, x0, th, p, mesh=mesh,
                precondition=pre).x ** 2)), theta)
        assert counts.get("all-gather", 0) == 0, counts
        assert sum(counts.values()) <= cap, (pre, counts)
