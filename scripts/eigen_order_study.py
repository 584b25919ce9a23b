"""Settle the 22-vs-23 Rosenbrock iteration-count question (README anchor).

The reference README (/root/reference/README.md:88-94) reports 23 iterations
for Rosenbrock n=10 with eps=1e-6; our implementation and the NumPy oracle
both produce 22.  Eigen is not installed on this machine, so the reference
binary cannot be executed — instead this study *reproduces Eigen's exact
floating-point summation order* for `dot()`/`norm()` and re-runs the oracle
with it.

Eigen evaluates `a.dot(b)` (and `squaredNorm`) through its redux kernel
(Eigen/src/Core/Redux.h, LinearVectorizedTraversal/NoUnrolling): with SSE2
doubles (g++ -O2 x86-64 default) the products are accumulated in TWO 2-lane
packet accumulators peeled over 4-element blocks, the accumulators are added,
a trailing packet and scalar tail are folded in, and the two lanes are summed
last:

    res = (((p0+p4)+(p2+p6))+p8) + (((p1+p5)+(p3+p7))+p9)     (n = 10)

which differs from NumPy's pairwise order by reassociation only.  Running
the oracle with this dot (`--mode eigen`) vs NumPy's (`--mode numpy`) shows
whether the published 23 is reproduced and which iteration's epsilon
crossing flips.

Result (also pinned in tests/test_readme_anchor.py and PERF.md): the
iteration count is NOT an artifact of dot() ordering alone — the flip is in
the gradient-norm epsilon crossing at the final iterate, where ||g|| sits
within one ulp of 1e-6 (see the printed per-iteration tail).
"""

import argparse
import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


PACKET = 2   # SSE2 doubles


def eigen_redux_sum(p):
    """Sum the element array ``p`` in Eigen's LinearVectorizedTraversal
    order (Redux.h, NoUnrolling, alignedStart = 0, packet size 2)."""
    p = np.asarray(p, np.float64)
    n = p.shape[0]
    ps = PACKET
    aligned_size = (n // ps) * ps
    aligned_size2 = (n // (2 * ps)) * (2 * ps)
    if aligned_size:
        pr0 = p[0:ps].copy()
        if aligned_size > ps:
            pr1 = p[ps:2 * ps].copy()
            idx = 2 * ps
            while idx < aligned_size2:
                pr0 = pr0 + p[idx:idx + ps]
                pr1 = pr1 + p[idx + ps:idx + 2 * ps]
                idx += 2 * ps
            pr0 = pr0 + pr1
            if aligned_size > aligned_size2:
                pr0 = pr0 + p[aligned_size2:aligned_size2 + ps]
        res = pr0[0] + pr0[1]          # predux: lane0 + lane1
        for i in range(aligned_size, n):
            res = res + p[i]
    else:
        res = p[0]
        for i in range(1, n):
            res = res + p[i]
    return float(res)


def eigen_dot(a, b):
    return eigen_redux_sum(np.asarray(a, np.float64) *
                           np.asarray(b, np.float64))


def eigen_norm(a):
    return float(np.sqrt(eigen_dot(a, a)))


class _EigenLinalg:
    @staticmethod
    def norm(a):
        return eigen_norm(a)


def run(mode: str, n: int = 10, eps: float = 1e-6, verbose: bool = True):
    import oracle

    saved = (oracle.np.dot, oracle.np.linalg)
    if mode == "eigen":
        class NP:
            pass
        shim = NP()
        for name in dir(np):
            if not name.startswith("_"):
                try:
                    setattr(shim, name, getattr(np, name))
                except Exception:
                    pass
        shim.dot = eigen_dot
        shim.linalg = _EigenLinalg()
        oracle.np = shim
    try:
        def fg(x):
            fx = 0.0
            grad = np.zeros_like(x)
            for i in range(0, n, 2):
                t1 = 1.0 - x[i]
                t2 = 10.0 * (x[i + 1] - x[i] * x[i])
                grad[i + 1] = 20.0 * t2
                grad[i] = -2.0 * (x[i] * grad[i + 1] + t1)
                fx += t1 * t1 + t2 * t2
            return fx, grad

        params = oracle.default_params(epsilon=eps, max_iterations=100)
        trace = []
        res = oracle.lbfgs_minimize(fg, np.zeros(n), params,
                                    "nocedalwright", trace=trace)
        if verbose:
            print(f"mode={mode}: niter={res['niter']} fx={res['fx']:.6e} "
                  f"gnorm={res['gnorm']:.17e}")
            for t in trace[-4:]:
                print(f"  k={t['k']:3d} fx={t['fx']:.17e} "
                      f"gnorm={t['gnorm']:.17e} step={t['step']:.6e}")
        return res, trace
    finally:
        oracle.np = np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["numpy", "eigen", "both"],
                    default="both")
    args = ap.parse_args()
    if args.mode in ("numpy", "both"):
        run("numpy")
    if args.mode in ("eigen", "both"):
        run("eigen")


if __name__ == "__main__":
    main()
