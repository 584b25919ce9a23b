"""Feature-sharded logistic regression — the BASELINE.json scaling config
in miniature.

The weight vector (and the s/y history) is sharded over a 1-D device mesh;
the only communication is one psum per objective evaluation (the logit
reduction) plus the solver's own fused scalar reductions.  Run on a pod
slice this is the n=1e9 recipe; here it runs on whatever devices exist
(use XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
for a virtual mesh).

Run: python examples/sharded_logreg.py [n_per_device]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from lbfgspp_tpu import LBFGSParams
from lbfgspp_tpu.parallel.sharded import minimize_sharded, sharding_for
from lbfgspp_tpu.utils.objectives import make_sharded_logreg


def main(n_per_device=1024, batch=256):
    ndev = jax.device_count()
    n = n_per_device * ndev
    mesh = Mesh(np.asarray(jax.devices()), ("feat",))
    print(f"{ndev} devices, n = {n}")

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((batch, n)) / np.sqrt(n),
                    jnp.float32)
    w_true = rng.standard_normal(n)
    b = jnp.asarray(np.sign(a @ w_true), jnp.float32)
    a_parts = a.reshape(batch, ndev, n // ndev).transpose(1, 0, 2)

    def local_fg(w_local):
        idx = jax.lax.axis_index("feat")
        a_local = jax.lax.dynamic_index_in_dim(a_parts, idx, 0,
                                               keepdims=False)
        return make_sharded_logreg(a_local, b, "feat")(w_local)

    x0 = jax.device_put(jnp.zeros((n,), jnp.float32), sharding_for(mesh))
    res = jax.jit(lambda x: minimize_sharded(
        local_fun_and_grad=local_fg, x0=x,
        params=LBFGSParams(epsilon=1e-4, max_iterations=200),
        mesh=mesh))(x0)

    print(f"{int(res.niter)} iterations, {int(res.nfev)} f/g evaluations")
    print(f"loss = {float(res.fx):.6g}, ||grad|| = {float(res.gnorm):.3g}")
    print("x sharding:", res.x.sharding)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
