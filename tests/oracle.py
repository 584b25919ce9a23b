"""NumPy scalar oracle for the L-BFGS stack.

A plain-Python/NumPy re-statement of the reference algorithms
(/root/reference/include/LBFGS.h, LBFGSpp/BFGSMat.h and the four line
searches), written from the algorithm description with the same branch order
and update rules.  It serves as a trajectory oracle for the fixed-shape JAX
implementation: both are run in float64 and compared iterate-by-iterate.

This is test-support code, not part of the library.
"""

from __future__ import annotations

import numpy as np


class OracleHistory:
    """Ring-buffer (s, y) history with two-loop recursion
    (BFGSMat.h:61-302 semantics)."""

    def __init__(self, n, m):
        self.m = m
        self.s = np.zeros((m, n))
        self.y = np.zeros((m, n))
        self.ys = np.zeros(m)
        self.theta = 1.0
        self.ncorr = 0
        self.ptr = m

    def add_correction(self, s, y):
        loc = self.ptr % self.m
        self.s[loc] = s
        self.y[loc] = y
        ys = float(np.dot(s, y))
        self.ys[loc] = ys
        self.theta = float(np.dot(y, y)) / ys
        if self.ncorr < self.m:
            self.ncorr += 1
        self.ptr = loc + 1

    def apply_hv(self, v, a):
        res = a * v.copy()
        alpha = np.zeros(self.m)
        j = self.ptr % self.m
        order = []
        for _ in range(self.ncorr):
            j = (j + self.m - 1) % self.m
            alpha[j] = np.dot(self.s[j], res) / self.ys[j]
            res -= alpha[j] * self.y[j]
            order.append(j)
        res /= self.theta
        for j in reversed(order):
            beta = np.dot(self.y[j], res) / self.ys[j]
            res += (alpha[j] - beta) * self.s[j]
        return res


# --------------------------------------------------------------------------
# Line searches.  Each returns (step, fx, grad, dg, x, nfev) or raises
# RuntimeError where the reference throws.
# --------------------------------------------------------------------------

def ls_backtracking(fg, param, xp, drt, step_max, step, fx, grad, dg):
    dec, inc = 0.5, 2.1
    if step <= 0:
        raise RuntimeError("step must be positive")
    fx_init = fx
    dg_init = float(np.dot(grad, drt))
    if dg_init > 0:
        raise RuntimeError("not a descent direction")
    test_decr = param["ftol"] * dg_init
    nfev = 0
    for _ in range(param["max_linesearch"]):
        x = xp + step * drt
        fx, grad = fg(x)
        nfev += 1
        if fx > fx_init + step * test_decr or fx != fx:
            width = dec
        else:
            dg = float(np.dot(grad, drt))
            if param["linesearch"] == 1:
                return step, fx, grad, dg, x, nfev
            if dg < param["wolfe"] * dg_init:
                width = inc
            else:
                if param["linesearch"] == 2:
                    return step, fx, grad, dg, x, nfev
                if dg > -param["wolfe"] * dg_init:
                    width = dec
                else:
                    return step, fx, grad, dg, x, nfev
        if step < param["min_step"]:
            raise RuntimeError("step too small")
        if step > param["max_step"]:
            raise RuntimeError("step too large")
        step *= width
    raise RuntimeError("max_linesearch reached")


def ls_bracketing(fg, param, xp, drt, step_max, step, fx, grad, dg):
    if step <= 0:
        raise RuntimeError("step must be positive")
    fx_init = fx
    dg_init = float(np.dot(grad, drt))
    if dg_init > 0:
        raise RuntimeError("not a descent direction")
    test_decr = param["ftol"] * dg_init
    step_lo, step_hi = 0.0, np.inf
    nfev = 0
    for _ in range(param["max_linesearch"]):
        x = xp + step * drt
        fx, grad = fg(x)
        nfev += 1
        if fx > fx_init + step * test_decr or not np.isfinite(fx):
            step_hi = step
        else:
            dg = float(np.dot(grad, drt))
            if param["linesearch"] == 1:
                return step, fx, grad, dg, x, nfev
            if dg < param["wolfe"] * dg_init:
                step_lo = step
            else:
                if param["linesearch"] == 2:
                    return step, fx, grad, dg, x, nfev
                if dg > -param["wolfe"] * dg_init:
                    step_hi = step
                else:
                    return step, fx, grad, dg, x, nfev
        if step_lo > step_hi:
            raise RuntimeError("bracket inverted")
        if step < param["min_step"]:
            raise RuntimeError("step too small")
        if step > param["max_step"]:
            raise RuntimeError("step too large")
        step = 2 * step if np.isinf(step_hi) else step_lo / 2 + step_hi / 2
    raise RuntimeError("max_linesearch reached")


def _nw_quad_interp(step_lo, step_hi, fx_lo, fx_hi, dg_lo):
    fdiff = fx_hi - fx_lo
    sdiff = step_hi - step_lo
    smid = (step_hi + step_lo) / 2
    cand = fdiff * step_lo - smid * sdiff * dg_lo
    cand = cand / (fdiff - sdiff * dg_lo)
    nan = not np.isfinite(cand)
    end_dist = min(abs(cand - step_lo), abs(cand - step_hi))
    near_end = end_dist < 0.01 * abs(sdiff)
    bisect = (nan or cand <= min(step_lo, step_hi)
              or cand >= max(step_lo, step_hi) or near_end)
    return smid if bisect else cand


def ls_nocedalwright(fg, param, xp, drt, step_max, step, fx, grad, dg):
    if step <= 0:
        raise RuntimeError("step must be positive")
    expansion = 2.0
    fx_init = fx
    dg_init = dg
    if dg_init > 0:
        raise RuntimeError("not a descent direction")
    test_decr = param["ftol"] * dg_init
    test_curv = -param["wolfe"] * dg_init
    step_hi = fx_hi = None
    step_lo, fx_lo, dg_lo = 0.0, fx_init, dg_init
    x_lo, grad_lo = xp.copy(), grad.copy()
    nfev = 0
    it = 0
    # Bracketing phase
    while True:
        x = xp + step * drt
        fx, grad = fg(x)
        dg = float(np.dot(grad, drt))
        nfev += 1
        if fx - fx_init > step * test_decr or (0 < step_lo and fx >= fx_lo):
            step_hi, fx_hi = step, fx
            break
        if abs(dg) <= test_curv:
            return step, fx, grad, dg, x, nfev
        step_hi, fx_hi = step_lo, fx_lo
        step_lo, fx_lo, dg_lo = step, fx, dg
        x_lo, grad_lo = x.copy(), grad.copy()
        if dg >= 0:
            break
        it += 1
        if it >= param["max_linesearch"]:
            return step, fx, grad, dg, x, nfev
        step *= expansion
    # Zoom phase
    while True:
        step = _nw_quad_interp(step_lo, step_hi, fx_lo, fx_hi, dg_lo)
        x = xp + step * drt
        fx, grad = fg(x)
        dg = float(np.dot(grad, drt))
        nfev += 1
        if fx - fx_init > step * test_decr or fx >= fx_lo:
            if step == step_hi:
                raise RuntimeError("insufficient precision (hi)")
            step_hi, fx_hi = step, fx
        else:
            if abs(dg) <= test_curv:
                return step, fx, grad, dg, x, nfev
            if dg * (step_hi - step_lo) >= 0:
                step_hi, fx_hi = step_lo, fx_lo
            if step == step_lo:
                raise RuntimeError("insufficient precision (lo)")
            step_lo, fx_lo, dg_lo = step, fx, dg
            x_lo, grad_lo = x.copy(), grad.copy()
        it += 1
        if it >= param["max_linesearch"]:
            if step_lo <= 0:
                raise RuntimeError("unable to decrease")
            return step_lo, fx_lo, grad_lo, dg_lo, x_lo, nfev


def _mt_cubic_minimizer(a, b, fa, fb, ga, gb):
    eps = np.finfo(float).eps
    apb = a + b
    ba = b - a
    ba2 = ba * ba
    fba = fb - fa
    gba = gb - ga
    z3 = (ga + gb) * ba - 2 * fba
    z2 = 0.5 * (gba * ba2 - 3 * apb * z3)
    z1 = fba * ba2 - apb * z2 - (a * apb + b * b) * z3
    if abs(z3) < eps * abs(z2) or abs(z3) < eps * abs(z1):
        exists = z2 * ba > 0
        return (-0.5 * z1 / z2 if exists else b), exists
    u = z2 / (3 * z3)
    v = z1 / z2
    vu = v / u
    exists = vu <= 1
    if not exists:
        return b, exists
    if abs(u) >= abs(v):
        w = 1 + np.sqrt(1 - vu)
        r1, r2 = -u * w, -v / w
    else:
        sqrtd = np.sqrt(abs(u)) * np.sqrt(abs(v)) * np.sqrt(1 - u / v)
        r1, r2 = -u - sqrtd, -u + sqrtd
    return (max(r1, r2) if z3 * ba > 0 else min(r1, r2)), exists


def _mt_step_selection(al, au, at, fl, fu, ft, gl, gu, gt):
    if al == au:
        return al
    if not np.isfinite(ft) or not np.isfinite(gt):
        return (al + at) / 2
    ac, ac_exists = _mt_cubic_minimizer(al, at, fl, ft, gl, gt)
    ba = at - al
    aq = al + 0.5 * ba * gl / (fl - ft + ba * gl) * ba
    if ft > fl:
        if not ac_exists:
            return aq
        return ac if abs(ac - al) < abs(aq - al) else (aq + ac) / 2
    a_s = al + gl / (gl - gt) * (at - al)
    if gt * gl < 0:
        return ac if abs(ac - at) >= abs(a_s - at) else a_s
    deltal, deltau = 1.1, 0.66
    if abs(gt) < abs(gl):
        res = ac if (ac_exists and (ac - at) * (at - al) > 0
                     and abs(ac - at) < abs(a_s - at)) else a_s
        if at > al:
            return min(at + deltau * (au - at), res)
        return max(at + deltau * (au - at), res)
    if not np.isfinite(au) or not np.isfinite(fu) or not np.isfinite(gu):
        return at + deltal * (at - al)
    ae, _ = _mt_cubic_minimizer(at, au, ft, fu, gt, gu)
    if at > al:
        return min(at + deltau * (au - at), ae)
    return max(at + deltau * (au - at), ae)


def ls_morethuente(fg, param, xp, drt, step_max, step, fx, grad, dg):
    step_min = param["min_step"]
    if step <= 0:
        raise RuntimeError("step must be positive")
    if step < step_min:
        raise RuntimeError("step < min_step")
    if step > step_max:
        raise RuntimeError("step > step_max")
    fx_init, dg_init = fx, dg
    if dg_init >= 0:
        raise RuntimeError("not a descent direction")
    test_decr = param["ftol"] * dg_init
    test_curv = -param["wolfe"] * dg_init
    I_lo, I_hi = 0.0, np.inf
    fI_lo, fI_hi = 0.0, np.inf
    gI_lo, gI_hi = (1 - param["ftol"]) * dg_init, np.inf
    psiI_lo = fI_lo
    x_lo, grad_lo = xp.copy(), grad.copy()
    fx_lo, dg_lo = fx_init, dg_init
    bracketed = False
    use_sg = step_min > 0
    I_width = I_width_prev = np.inf
    shrink_fail = 0
    delta_max, delta_min, shrink = 1.1, 7.0 / 12.0, 0.66
    nfev = 0
    for _ in range(param["max_linesearch"]):
        x = xp + step * drt
        fx, grad = fg(x)
        dg = float(np.dot(grad, drt))
        nfev += 1
        psit = fx - fx_init - step * test_decr
        dpsit = dg - test_decr
        if psit <= 0 and abs(dg) <= test_curv:
            return step, fx, grad, dg, x, nfev
        if step <= step_min and (psit > 0 or dpsit >= 0):
            return step, fx, grad, dg, x, nfev
        if step >= step_max and (psit <= 0 and dpsit < 0):
            return step, fx, grad, dg, x, nfev
        ft, gt = psit, dpsit
        if use_sg and (psit <= 0 and dpsit < 0):
            use_sg = False
        in_case_2 = (psit <= psiI_lo) and (dpsit * (I_lo - step) > 0)
        if in_case_2:
            new_step = min(step_max, step + delta_max * (step - I_lo))
        else:
            new_step = _mt_step_selection(I_lo, I_hi, step, fI_lo, fI_hi, ft,
                                          gI_lo, gI_hi, gt)
            new_step = min(max(new_step, step_min), step_max)
            if use_sg:
                new_step = min(max(new_step, step_min),
                               max(step_min, delta_min * step))
        if psit > psiI_lo:
            I_hi, fI_hi, gI_hi = step, ft, gt
        elif in_case_2:
            I_lo, fI_lo, gI_lo, psiI_lo = step, ft, gt, psit
            x_lo, grad_lo = x.copy(), grad.copy()
            fx_lo, dg_lo = fx, dg
        else:
            I_hi, fI_hi, gI_hi = I_lo, fI_lo, gI_lo
            I_lo, fI_lo, gI_lo, psiI_lo = step, ft, gt, psit
            x_lo, grad_lo = x.copy(), grad.copy()
            fx_lo, dg_lo = fx, dg
        if (not bracketed) and (not in_case_2):
            bracketed = (min(I_lo, I_hi) >= step_min and
                         max(I_lo, I_hi) <= step_max)
        if bracketed:
            I_width_prev = I_width
            I_width = abs(I_hi - I_lo)
            if I_width_prev < np.inf and I_width > shrink * I_width_prev:
                shrink_fail += 1
            else:
                shrink_fail = 0
            if shrink_fail >= 2:
                new_step = (I_lo + I_hi) / 2
                shrink_fail = 0
        step = new_step
    return I_lo, fx_lo, grad_lo, dg_lo, x_lo, nfev


LINE_SEARCHES = {
    "backtracking": ls_backtracking,
    "bracketing": ls_bracketing,
    "nocedalwright": ls_nocedalwright,
    "morethuente": ls_morethuente,
}


def default_params(**over):
    p = dict(m=6, epsilon=1e-5, epsilon_rel=1e-5, past=0, delta=0.0,
             max_iterations=0, linesearch=3, max_linesearch=20,
             min_step=1e-20, max_step=1e20, ftol=1e-4, wolfe=0.9)
    p.update(over)
    return p


def lbfgs_minimize(fg, x0, param, line_search="nocedalwright",
                   trace=None):
    """Oracle for LBFGSSolver::minimize (LBFGS.h:79-173)."""
    ls = LINE_SEARCHES[line_search]
    x = np.array(x0, dtype=float)
    n = x.size
    hist = OracleHistory(n, param["m"])
    fpast = param["past"]
    fx_ring = np.zeros(max(fpast, 1))
    fx, grad = fg(x)
    nfev = 1
    gnorm = float(np.linalg.norm(grad))
    if fpast > 0:
        fx_ring[0] = fx
    if gnorm <= param["epsilon"] or \
            gnorm <= param["epsilon_rel"] * np.linalg.norm(x):
        return dict(x=x, fx=fx, grad=grad, gnorm=gnorm, niter=1, nfev=nfev)
    drt = -grad
    step = 1.0 / np.linalg.norm(drt)
    eps = np.finfo(float).eps
    k = 1
    while True:
        xp, gradp = x.copy(), grad.copy()
        dg = float(np.dot(grad, drt))
        step, fx, grad, dg, x, ls_nfev = ls(
            fg, param, xp, drt, param["max_step"], step, fx, grad, dg)
        nfev += ls_nfev
        gnorm = float(np.linalg.norm(grad))
        if trace is not None:
            trace.append(dict(k=k, fx=fx, gnorm=gnorm, step=step,
                              nfev=ls_nfev))
        if gnorm <= param["epsilon"] or \
                gnorm <= param["epsilon_rel"] * np.linalg.norm(x):
            return dict(x=x, fx=fx, grad=grad, gnorm=gnorm, niter=k,
                        nfev=nfev)
        if fpast > 0:
            fxd = fx_ring[k % fpast]
            if k >= fpast and abs(fxd - fx) <= param["delta"] * max(
                    abs(fx), abs(fxd), 1.0):
                return dict(x=x, fx=fx, grad=grad, gnorm=gnorm, niter=k,
                            nfev=nfev)
            fx_ring[k % fpast] = fx
        if param["max_iterations"] != 0 and k >= param["max_iterations"]:
            return dict(x=x, fx=fx, grad=grad, gnorm=gnorm, niter=k,
                        nfev=nfev)
        s = x - xp
        y = grad - gradp
        if np.dot(s, y) > eps * np.dot(y, y):
            hist.add_correction(s, y)
        drt = hist.apply_hv(grad, -1.0)
        step = 1.0
        k += 1
