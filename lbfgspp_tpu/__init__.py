"""lbfgspp_tpu: a TPU-native limited-memory quasi-Newton solver framework.

A from-scratch JAX/XLA re-design with the capabilities of LBFGS++
(reference at /root/reference): L-BFGS for unconstrained and L-BFGS-B for
box-constrained minimization with four pluggable line searches — expressed as
pure functions over fixed-shape pytrees so that a full solve is one traced XLA
computation, batchable with ``jax.vmap`` and shardable over a device mesh.
"""

from .params import (LBFGSParams, LBFGSBParams,
                     LINESEARCH_BACKTRACKING_ARMIJO,
                     LINESEARCH_BACKTRACKING,
                     LINESEARCH_BACKTRACKING_WOLFE,
                     LINESEARCH_BACKTRACKING_STRONG_WOLFE)
from .types import (Status, SolveResult, LineSearchResult, SUCCESS_STATUSES,
                    make_fun_and_grad)
from .lbfgs import (minimize, final_approx_hessian,
                    final_approx_inverse_hessian, solver, Solver, LBFGSState)
from .lbfgsb import (minimize as minimize_b, solver as solver_b,
                     LBFGSBState)
from .batch import minimize_batched, minimize_b_batched, best_result
from .df64 import minimize_df64
from .diff import implicit_minimize, implicit_minimize_sharded
from .pytree import minimize_pytree, minimize_b_pytree
from .stochastic import minimize_stochastic
from .owlqn import minimize_owlqn

__version__ = "0.4.0"

__all__ = [
    "LBFGSParams", "LBFGSBParams",
    "LINESEARCH_BACKTRACKING_ARMIJO", "LINESEARCH_BACKTRACKING",
    "LINESEARCH_BACKTRACKING_WOLFE", "LINESEARCH_BACKTRACKING_STRONG_WOLFE",
    "Status", "SolveResult", "LineSearchResult", "SUCCESS_STATUSES",
    "make_fun_and_grad",
    "minimize", "final_approx_hessian", "final_approx_inverse_hessian",
    "minimize_b",
    "solver", "solver_b", "Solver", "LBFGSState", "LBFGSBState",
    "minimize_batched", "minimize_b_batched", "best_result",
    "minimize_df64",
    "implicit_minimize", "implicit_minimize_sharded",
    "minimize_pytree", "minimize_b_pytree",
    "minimize_stochastic",
    "minimize_owlqn",
]
