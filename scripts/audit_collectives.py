"""Per-mode collective audit: count collective ops in the optimized HLO
of EVERY shipped sharded mode on the 8-virtual-device CPU mesh.

This produces the raw numbers behind PERF.md's "sharded communication
budget" table (VERDICT r3 item 7): static collective-op definitions in
the compiled program are an upper bound on collectives per outer solver
iteration (each op in the while body executes at most once per
iteration; ops outside the loops execute once per solve).

    /opt/venv/bin/python scripts/audit_collectives.py
"""

import os
import re
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from lbfgspp_tpu import LBFGSParams, LBFGSBParams
    from lbfgspp_tpu.diff import implicit_minimize_sharded
    from lbfgspp_tpu.parallel.sharded import (minimize_sharded,
                                              minimize_b_sharded,
                                              minimize_owlqn_sharded,
                                              sharding_for)

    mesh = Mesh(np.asarray(jax.devices()), ("feat",))
    shard = sharding_for(mesh)
    n = 8 * 16
    k = n // 8

    def counts(fn, *args):
        txt = jax.jit(fn).lower(*args).compile().as_text()
        ops = re.findall(r"\b(all-reduce|all-gather|all-to-all"
                         r"|collective-permute|reduce-scatter)\(", txt)
        out = {}
        for op in ops:
            out[op] = out.get(op, 0) + 1
        return out

    def local_quad(x_local):
        return jnp.sum((x_local - 1.0) ** 2) + 0.1 * jnp.sum(x_local ** 4)

    x0 = jax.device_put(jnp.zeros(n), shard)
    p = LBFGSParams(epsilon=1e-8, max_iterations=50)
    pb = LBFGSBParams(epsilon=1e-8, max_iterations=50)
    lb = jax.device_put(jnp.full(n, 2.0), shard)
    ub = jax.device_put(jnp.full(n, 4.0), shard)
    xb = jax.device_put(jnp.full(n, 2.5), shard)

    rows = []

    rows.append(("lbfgs sweeps (NW ls)", counts(
        lambda x: minimize_sharded(local_quad, x, p, mesh=mesh), x0)))
    rows.append(("lbfgs rinv (NW ls)", counts(
        lambda x: minimize_sharded(local_quad, x, p, mesh=mesh,
                                   direction="rinv"), x0)))
    rows.append(("lbfgs sweeps (MT ls)", counts(
        lambda x: minimize_sharded(local_quad, x, p, mesh=mesh,
                                   line_search="morethuente"), x0)))
    rows.append(("lbfgsb walk GCP", counts(
        lambda x, l, u: minimize_b_sharded(local_quad, x, l, u, pb,
                                           mesh=mesh), xb, lb, ub)))
    rows.append(("lbfgsb walk_chunked GCP", counts(
        lambda x, l, u: minimize_b_sharded(local_quad, x, l, u, pb,
                                           mesh=mesh, gcp="walk_chunked"),
        xb, lb, ub)))
    rows.append(("owlqn", counts(
        lambda x: minimize_owlqn_sharded(local_quad, x, 0.1, p,
                                         mesh=mesh), x0)))

    def local_fun_th(x_l, th):
        i = jax.lax.axis_index("feat")
        th_l = jax.lax.dynamic_slice_in_dim(th, i * k, k)
        return jnp.sum(0.5 * (x_l - th_l) ** 2 + 0.1 * (x_l - th_l) ** 4)

    theta = jnp.zeros(n)
    for pre in (True, False):
        rows.append((f"implicit-diff CG adjoint (precond={pre})", counts(
            jax.grad(lambda th, pre=pre: jnp.sum(implicit_minimize_sharded(
                local_fun_th, x0, th, p, mesh=mesh,
                precondition=pre).x ** 2)), theta)))

    for tag, c in rows:
        total = sum(c.values())
        print(f"{tag:45s} total={total:3d}  {c}")


if __name__ == "__main__":
    main()
