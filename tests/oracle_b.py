"""NumPy scalar oracle for the L-BFGS-B stack.

A plain-Python/NumPy re-statement of the reference's box-constrained
algorithms (/root/reference/include/LBFGSB.h, LBFGSpp/BFGSMat.h B-mode,
LBFGSpp/Cauchy.h, LBFGSpp/SubspaceMin.h), written from the algorithm
description with the same branch order and update rules, using dynamic index
sets exactly like the reference.  It serves as a trajectory oracle for the
fixed-shape masked JAX implementation: both run in float64 and are compared
step-by-step and end-to-end.

This is test-support code, not part of the library.
"""

from __future__ import annotations

import numpy as np

from oracle import OracleHistory, ls_morethuente


class OracleBHistory(OracleHistory):
    """B-mode history with the 2m x 2m middle matrix (BFGSMat.h:99-146)
    and the W/M operator family (BFGSMat.h:304-615)."""

    def __init__(self, n, m):
        super().__init__(n, m)
        self.minv = np.eye(2 * m)        # identity-padded, S'S unscaled

    def reset(self):
        self.__init__(self.s.shape[1], self.m)

    def _scaled_minv(self):
        m = self.m
        sc = self.minv.copy()
        sc[m:, m:] *= self.theta
        return sc

    def add_correction(self, s, y):
        loc = self.ptr % self.m
        super().add_correction(s, y)
        m, ncorr = self.m, self.ncorr
        ys = self.ys[loc]
        self.minv[loc, loc] = -ys
        # S'S row/col (slot-ordered, valid slots only)
        ss = self.s[:ncorr] @ self.s[loc]
        self.minv[m + loc, m:m + ncorr] = ss
        self.minv[m:m + ncorr, m + loc] = ss
        # Zero the stale column of the overwritten y, then the new L row
        if ncorr >= m:
            self.minv[m:, loc] = 0.0
            self.minv[loc, m:] = 0.0
        yloc = (loc + m - 1) % m
        for _ in range(ncorr - 1):
            v = float(self.s[loc] @ self.y[yloc])
            self.minv[m + loc, yloc] = v
            self.minv[yloc, m + loc] = v
            yloc = (yloc + m - 1) % m

    # ---- W/M operators, compact [2*ncorr] layout like the reference ----

    def apply_wtv(self, v):
        c = self.ncorr
        return np.concatenate([self.y[:c] @ v, self.theta * (self.s[:c] @ v)])

    def apply_mv(self, v):
        c, m = self.ncorr, self.m
        if c < 1:
            return np.zeros(0)
        pad = np.zeros(2 * m)
        pad[:c] = v[:c]
        pad[m:m + c] = v[c:]
        sol = np.linalg.solve(self._scaled_minv(), pad)
        return np.concatenate([sol[:c], sol[m:m + c]])

    def wb(self, b):
        c = self.ncorr
        return np.concatenate([self.y[:c, b], self.theta * self.s[:c, b]])

    def wrows(self, idx):
        """Rows of W at coordinate indices (theta NOT applied to S part,
        matching Wb(IndexSet), BFGSMat.h:338-358... note the reference's
        matrix Wb DOES apply... see below)."""
        c = self.ncorr
        return np.concatenate([self.y[:c][:, idx].T,
                               self.s[:c][:, idx].T], axis=1)

    def apply_wtpv(self, p_set, v):
        c = self.ncorr
        res = np.zeros(2 * c)
        if c < 1 or len(p_set) < 1:
            return res
        for j in range(c):
            res[j] = self.y[j][p_set] @ v
            res[c + j] = self.s[j][p_set] @ v
        res[c:] *= self.theta
        return res

    def apply_ptwmv(self, p_set, v, scale):
        c = self.ncorr
        res = np.zeros(len(p_set))
        if c < 1 or len(p_set) < 1:
            return res
        mv = self.apply_mv(v)
        mv[c:] *= self.theta
        for j in range(c):
            res += mv[j] * self.y[j][p_set] + mv[c + j] * self.s[j][p_set]
        return scale * res

    def compute_ftbab(self, fv_set, newact_set, wd, drt):
        c = self.ncorr
        nfree = len(fv_set)
        if c < 1 or len(newact_set) < 1 or nfree < 1:
            return np.zeros(nfree)
        rhs = self.apply_wtpv(newact_set, drt[newact_set])
        return self.apply_ptwmv(fv_set, rhs, -1.0)

    def solve_ptbp(self, p_set, v):
        """inv(P'BP) v (BFGSMat::solve_PtBP, BFGSMat.h:529-565)."""
        c, m, th = self.ncorr, self.m, self.theta
        if c < 1 or len(p_set) < 1:
            return v / th
        wp_y = self.y[:c][:, p_set].T      # [nP, c] raw rows
        wp_s = self.s[:c][:, p_set].T
        mid = np.zeros((2 * c, 2 * c))
        mid[:c, :c] = self.minv[:c, :c] - wp_y.T @ wp_y / th
        mid[c:, :c] = self.minv[m:m + c, :c] - wp_s.T @ wp_y
        mid[:c, c:] = mid[c:, :c].T
        mid[c:, c:] = th * (self.minv[m:m + c, m:m + c] - wp_s.T @ wp_s)
        wpv = np.concatenate([wp_y.T @ v, th * (wp_s.T @ v)])
        z = np.linalg.solve(mid, wpv)
        z[c:] *= th
        return v / th + (wp_y @ z[:c] + wp_s @ z[c:]) / (th * th)

    def apply_ptbqv(self, p_set, q_set, v):
        c = self.ncorr
        if c < 1 or len(p_set) < 1 or len(q_set) < 1:
            return np.zeros(len(p_set))
        rhs = self.apply_wtpv(q_set, v)
        mv = self.apply_mv(rhs)
        mv[c:] *= self.theta
        res = np.zeros(len(p_set))
        for j in range(c):
            res += mv[j] * self.y[j][p_set] + mv[c + j] * self.s[j][p_set]
        return -res


def cauchy_point(bfgs: OracleBHistory, x0, g, lb, ub):
    """GCP walk (Cauchy::get_cauchy_point, Cauchy.h:86-284)."""
    n = len(x0)
    xcp = x0.copy()
    c = bfgs.ncorr
    vecc = np.zeros(2 * c)
    newact_set, fv_set = [], []

    brk = np.zeros(n)
    vecd = np.zeros(n)
    ord_ = []
    for i in range(n):
        if lb[i] == ub[i]:
            brk[i] = 0.0
        elif g[i] < 0:
            brk[i] = (x0[i] - ub[i]) / g[i]
        elif g[i] > 0:
            brk[i] = (x0[i] - lb[i]) / g[i]
        else:
            brk[i] = np.inf
        iszero = brk[i] == 0.0
        vecd[i] = 0.0 if iszero else -g[i]
        if brk[i] == np.inf:
            fv_set.append(i)
        elif not iszero:
            ord_.append(i)
    ord_.sort(key=lambda i: brk[i])

    nord = len(ord_)
    nfree = len(fv_set)
    if nfree < 1 and nord < 1:
        return xcp, vecc, newact_set, fv_set

    vecp = bfgs.apply_wtv(vecd)
    fp = -float(vecd @ vecd)
    cache = bfgs.apply_mv(vecp)
    fpp = -bfgs.theta * fp - float(vecp @ cache) if c >= 1 \
        else -bfgs.theta * fp
    deltatmin = -fp / fpp
    il = 0.0
    b = 0
    iu = np.inf if nord < 1 else brk[ord_[b]]
    deltat = iu - il

    crossed_all = False
    while deltatmin >= deltat:
        vecc = vecc + deltat * vecp
        act_begin = b
        i = b
        while i < nord and brk[ord_[i]] <= iu:
            i += 1
        act_end = i - 1
        if nfree == 0 and act_end == nord - 1:
            for i in range(act_begin, act_end + 1):
                act = ord_[i]
                xcp[act] = ub[act] if vecd[act] > 0 else lb[act]
                newact_set.append(act)
            crossed_all = True
            break
        fp += deltat * fpp
        for i in range(act_begin, act_end + 1):
            act = ord_[i]
            xcp[act] = ub[act] if vecd[act] > 0 else lb[act]
            zact = xcp[act] - x0[act]
            gact = g[act]
            ggact = gact * gact
            wact = bfgs.wb(act)
            cache = bfgs.apply_mv(wact)
            fp += ggact + bfgs.theta * gact * zact - gact * float(cache @ vecc)
            fpp -= (bfgs.theta * ggact + 2 * gact * float(cache @ vecp) +
                    ggact * float(cache @ wact))
            vecp = vecp + gact * wact
            vecd[act] = 0.0
            newact_set.append(act)
        deltatmin = -fp / fpp
        il = iu
        b = act_end + 1
        if b >= nord:
            break
        iu = brk[ord_[b]]
        deltat = iu - il

    eps = np.finfo(np.float64).eps
    if fpp < eps:
        deltatmin = -fp / eps
    if not crossed_all:
        deltatmin = max(deltatmin, 0.0)
        vecc = vecc + deltatmin * vecp
        tfinal = il + deltatmin
        for coord in fv_set:
            xcp[coord] = x0[coord] + tfinal * vecd[coord]
        for i in range(b, nord):
            coord = ord_[i]
            xcp[coord] = x0[coord] + tfinal * vecd[coord]
            fv_set.append(coord)
    return xcp, vecc, newact_set, fv_set


def subspace_minimize(bfgs: OracleBHistory, x0, xcp, g, lb, ub, wd,
                      newact_set, fv_set, maxit):
    """BOXCQP subspace phase (SubspaceMin.h:122-302)."""
    eps = np.finfo(np.float64).eps
    drt = xcp - x0
    nfree = len(fv_set)
    if nfree < 1:
        return drt
    fv = np.asarray(fv_set, dtype=int)
    vecc = bfgs.compute_ftbab(fv, np.asarray(newact_set, int), wd, drt)
    vecl = lb[fv] - x0[fv]
    vecu = ub[fv] - x0[fv]
    vecc = vecc + g[fv]
    vecy = bfgs.solve_ptbp(fv, -vecc)
    if np.all((vecy >= vecl) & (vecy <= vecu)):
        drt[fv] = vecy
        return drt

    yfallback = vecy.copy()
    lam = np.zeros(nfree)
    mu = np.zeros(nfree)
    k = 0
    while k < maxit:
        yl, yu, yp = [], [], []
        for i in range(nfree):
            li, ui = vecl[i], vecu[i]
            if vecy[i] < li or (vecy[i] == li and lam[i] >= 0):
                yl.append(i)
                vecy[i] = li
                mu[i] = 0.0
            elif vecy[i] > ui or (vecy[i] == ui and mu[i] >= 0):
                yu.append(i)
                vecy[i] = ui
                lam[i] = 0.0
            else:
                yp.append(i)
                lam[i] = 0.0
                mu[i] = 0.0
        l_set = fv[yl]
        u_set = fv[yu]
        p_set = fv[yp]
        if len(yp) > 0:
            rhs = vecc[yp].copy()
            rhs = rhs + bfgs.apply_ptbqv(p_set, l_set, vecl[yl])
            rhs = rhs + bfgs.apply_ptbqv(p_set, u_set, vecu[yu])
            vecy[yp] = bfgs.solve_ptbp(p_set, -rhs)
        if len(yl) > 0 or len(yu) > 0:
            fy = bfgs.apply_wtpv(fv, vecy)
        if len(yl) > 0:
            res = bfgs.apply_ptwmv(l_set, fy, -1.0)
            lam[yl] = res + vecc[yl] + bfgs.theta * vecy[yl]
        if len(yu) > 0:
            res = bfgs.apply_ptwmv(u_set, fy, -1.0)
            mu[yu] = -(res + vecc[yu] + bfgs.theta * vecy[yu])
        k += 1
        if np.all(lam[yl] >= 0) and np.all(mu[yu] >= 0) and \
                np.all((vecy[yp] >= vecl[yp]) & (vecy[yp] <= vecu[yp])):
            break
    else:
        # maxit exhausted without convergence: 3-level fallback
        vy = np.clip(vecy, vecl, vecu)
        drt[fv] = vy
        if float(drt @ g) <= -eps:
            return drt
        vy = np.clip(yfallback, vecl, vecu)
        drt[fv] = vy
        if float(drt @ g) <= -eps:
            return drt
        drt[fv] = yfallback
        return drt
    drt[fv] = vecy
    return drt


def force_bounds(x, lb, ub):
    return np.minimum(np.maximum(x, lb), ub)


def proj_grad_norm(x, g, lb, ub):
    return float(np.max(np.abs(force_bounds(x - g, lb, ub) - x)))


def max_step_size(x, drt, lb, ub):
    step = np.inf
    for i in range(len(x)):
        if drt[i] > 0:
            step = min(step, (ub[i] - x[i]) / drt[i])
        elif drt[i] < 0:
            step = min(step, (lb[i] - x[i]) / drt[i])
    return step


def lbfgsb_minimize(fg, x0, param, lb, ub, trace=None):
    """Reference L-BFGS-B driver (LBFGSB.h:117-262).

    ``param`` is a dict with the LBFGSBParam fields.  ``trace``, if given,
    is a list collecting per-iteration (x, fx, grad, drt) tuples.
    """
    eps = np.finfo(np.float64).eps
    n = len(x0)
    m = param["m"]
    fpast = param["past"]
    x = force_bounds(np.asarray(x0, float).copy(), lb, ub)
    bfgs = OracleBHistory(n, m)
    fx_hist = np.zeros(max(fpast, 1))

    fx, grad = fg(x)
    projgnorm = proj_grad_norm(x, grad, lb, ub)
    if fpast > 0:
        fx_hist[0] = fx
    if projgnorm <= param["epsilon"] or \
            projgnorm <= param["epsilon_rel"] * np.linalg.norm(x):
        return x, fx, grad, projgnorm, 1

    xcp, vecc, newact, fv = cauchy_point(bfgs, x, grad, lb, ub)
    drt = xcp - x
    nrm = np.linalg.norm(drt)
    if nrm > 0:
        drt = drt / nrm
    k = 1
    while True:
        xp = x.copy()
        gradp = grad.copy()
        dg = float(grad @ drt)
        step_max = max_step_size(x, drt, lb, ub)
        if dg >= 0 or step_max <= param["min_step"]:
            drt = xcp - x
            bfgs.reset()
            dg = float(grad @ drt)
            step_max = max_step_size(x, drt, lb, ub)
        step_max = min(param["max_step"], step_max)
        step = min(1.0, step_max)
        step, fx, grad, dg, x, _ = ls_morethuente(
            fg, param, xp, drt, step_max, step, fx, grad, dg)
        projgnorm = proj_grad_norm(x, grad, lb, ub)
        if trace is not None:
            trace.append((x.copy(), fx, grad.copy(), drt.copy()))
        if projgnorm <= param["epsilon"] or \
                projgnorm <= param["epsilon_rel"] * np.linalg.norm(x):
            return x, fx, grad, projgnorm, k
        if fpast > 0:
            fxd = fx_hist[k % fpast]
            if k >= fpast and abs(fxd - fx) <= \
                    param["delta"] * max(max(abs(fx), abs(fxd)), 1.0):
                return x, fx, grad, projgnorm, k
            fx_hist[k % fpast] = fx
        if param["max_iterations"] != 0 and k >= param["max_iterations"]:
            return x, fx, grad, projgnorm, k
        vecs = x - xp
        vecy = grad - gradp
        if float(vecs @ vecy) > eps * float(vecy @ vecy):
            bfgs.add_correction(vecs, vecy)
        x = force_bounds(x, lb, ub)
        xcp, vecc, newact, fv = cauchy_point(bfgs, x, grad, lb, ub)
        drt = subspace_minimize(bfgs, x, xcp, grad, lb, ub, vecc,
                                newact, fv, param["max_submin"])
        k += 1


def default_b_params(**over):
    p = dict(m=6, epsilon=1e-5, epsilon_rel=1e-5, past=1, delta=1e-10,
             max_iterations=0, max_submin=10, max_linesearch=20,
             min_step=1e-20, max_step=1e20, ftol=1e-4, wolfe=0.9)
    p.update(over)
    return p
