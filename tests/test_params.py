"""Parameter validation tests (Param.h:191-218, :350-376 semantics)."""

import pytest

from lbfgspp_tpu import LBFGSParams, LBFGSBParams


def test_defaults_match_reference():
    p = LBFGSParams()
    assert (p.m, p.epsilon, p.epsilon_rel) == (6, 1e-5, 1e-5)
    assert (p.past, p.delta, p.max_iterations) == (0, 0.0, 0)
    assert (p.linesearch, p.max_linesearch) == (3, 20)
    assert (p.min_step, p.max_step) == (1e-20, 1e20)
    assert (p.ftol, p.wolfe) == (1e-4, 0.9)


def test_lbfgsb_defaults_match_reference():
    p = LBFGSBParams()
    assert (p.past, p.delta) == (1, 1e-10)
    assert p.max_submin == 10
    assert not hasattr(p, "linesearch")


@pytest.mark.parametrize("kw", [
    dict(m=0), dict(m=-1),
    dict(epsilon=-1e-3), dict(epsilon_rel=-1.0),
    dict(past=-1), dict(delta=-0.5),
    dict(max_iterations=-2),
    dict(linesearch=0), dict(linesearch=4),
    dict(max_linesearch=0),
    dict(min_step=-1e-3),
    dict(max_step=1e-30),
    dict(ftol=0.0), dict(ftol=0.5),
    dict(wolfe=1e-4), dict(wolfe=1.0),
])
def test_invalid_lbfgs_params(kw):
    with pytest.raises(ValueError):
        LBFGSParams(**kw)


@pytest.mark.parametrize("kw", [
    dict(m=0), dict(max_submin=-1), dict(ftol=0.7), dict(wolfe=1.5),
])
def test_invalid_lbfgsb_params(kw):
    with pytest.raises(ValueError):
        LBFGSBParams(**kw)


def test_params_hashable():
    """Frozen dataclasses must be usable as jit static arguments."""
    assert hash(LBFGSParams()) == hash(LBFGSParams())
    assert LBFGSParams() == LBFGSParams()
    assert LBFGSParams(m=8) != LBFGSParams()
