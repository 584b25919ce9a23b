"""Mixed-precision history storage (history_dtype=bfloat16)."""

import numpy as np
import jax.numpy as jnp

from lbfgspp_tpu import LBFGSParams, minimize
from lbfgspp_tpu.utils.objectives import rosenbrock, rosenbrock_fg


def test_bf16_history_converges_f32_solve():
    p = LBFGSParams(epsilon=1e-4, max_iterations=300)
    res = minimize(fun_and_grad=rosenbrock_fg,
                   x0=jnp.zeros((10,), jnp.float32), params=p,
                   history_dtype=jnp.bfloat16)
    assert res.history.s.dtype == jnp.bfloat16
    assert res.x.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(res.x, np.float64), 1.0,
                               atol=1e-2)
    assert float(res.fx) < 1e-4


def test_bf16_history_f64_solve_close_to_exact():
    p = LBFGSParams(epsilon=1e-6, max_iterations=300)
    exact = minimize(fun_and_grad=rosenbrock_fg, x0=jnp.zeros((10,)),
                     params=p)
    mixed = minimize(fun_and_grad=rosenbrock_fg, x0=jnp.zeros((10,)),
                     params=p, history_dtype=jnp.bfloat16)
    # The quantized-curvature approximation costs iterations but reaches
    # the same optimum.
    assert float(mixed.fx) < 1e-10
    np.testing.assert_allclose(np.asarray(mixed.x), np.asarray(exact.x),
                               atol=1e-5)
