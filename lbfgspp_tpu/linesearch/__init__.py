"""Pluggable line searches.

The reference selects the line search via a template-template parameter
(LBFGS.h:20-22, LBFGSB.h:21-23); here it is a trace-time string/function
choice.  All four searches share the unified signature

``search(fg, param, xp, drt, step_max, step0, fx0, grad0, dg0, axis_name)``

mirroring the reference's unified static call (since v0.3.0, CHANGELOG.md).
"""

from .backtracking import backtracking
from .bracketing import bracketing
from .morethuente import morethuente
from .nocedalwright import nocedalwright
from .speculative import speculative, make_speculative

LINE_SEARCHES = {
    "backtracking": backtracking,
    "bracketing": bracketing,
    "morethuente": morethuente,
    "nocedalwright": nocedalwright,
    # TPU-native batched-throughput search (no reference counterpart):
    # evaluates a K-wide candidate ladder per round, see speculative.py.
    "speculative": speculative,
}


def get_line_search(name_or_fn):
    if callable(name_or_fn):
        return name_or_fn
    try:
        return LINE_SEARCHES[name_or_fn]
    except KeyError:
        raise ValueError(
            f"unknown line search {name_or_fn!r}; available: "
            f"{sorted(LINE_SEARCHES)}") from None


__all__ = ["backtracking", "bracketing", "morethuente", "nocedalwright",
           "speculative", "make_speculative",
           "LINE_SEARCHES", "get_line_search"]
