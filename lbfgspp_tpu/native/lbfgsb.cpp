// Native CPU L-BFGS-B solver (box constraints).
//
// Companion to core.cpp: the box-constrained algorithm stack — B-mode
// middle matrix, generalized Cauchy point, BOXCQP subspace minimization,
// and the driver loop — re-implemented from the algorithm spec shared
// with lbfgspp_tpu/{ops/bmat.py,ops/cauchy.py,ops/subspace.py,lbfgsb.py}
// and tests/oracle_b.py (reference semantics:
// /root/reference/include/LBFGSB.h, LBFGSpp/{BFGSMat,Cauchy,SubspaceMin}.h).
//
// Compiled together with core.cpp into libnative.so (see native/__init__.py).

#include <algorithm>
#include <cmath>
#include <cstring>
#include <limits>
#include <numeric>
#include <vector>

namespace {

using Obj = double (*)(const double* x, double* grad, int n, void* user);

struct ParamsB {
  int m;
  double epsilon;
  double epsilon_rel;
  int past;
  double delta;
  int max_iterations;
  int max_submin;
  int max_linesearch;
  double min_step;
  double max_step;
  double ftol;
  double wolfe;
};

enum StatusB {
  kRunningB = 0,
  kConvergedGradB = 1,
  kConvergedDeltaB = 2,
  kMaxIterationsB = 3,
  kLsInvalidStepB = 10,
  kLsNotDescentB = 11,
};

inline double vdot(const double* a, const double* b, int n) {
  double s = 0.0;
  for (int i = 0; i < n; ++i) s += a[i] * b[i];
  return s;
}

inline double vnrm2(const double* a, int n) {
  return std::sqrt(vdot(a, a, n));
}

// Dense LU solve with partial pivoting for the small middle systems
// (2m x 2m); mirrors the JAX path's direct solve of the same systems.
bool lu_solve(std::vector<double> a, std::vector<double>& b, int n) {
  std::vector<int> piv(n);
  for (int k = 0; k < n; ++k) {
    int p = k;
    for (int i = k + 1; i < n; ++i)
      if (std::abs(a[i * n + k]) > std::abs(a[p * n + k])) p = i;
    if (a[p * n + k] == 0.0) return false;
    if (p != k) {
      for (int j = 0; j < n; ++j) std::swap(a[k * n + j], a[p * n + j]);
      std::swap(b[k], b[p]);
    }
    for (int i = k + 1; i < n; ++i) {
      const double f = a[i * n + k] / a[k * n + k];
      a[i * n + k] = f;
      for (int j = k + 1; j < n; ++j) a[i * n + j] -= f * a[k * n + j];
      b[i] -= f * b[k];
    }
  }
  for (int i = n - 1; i >= 0; --i) {
    for (int j = i + 1; j < n; ++j) b[i] -= a[i * n + j] * b[j];
    b[i] /= a[i * n + i];
  }
  return true;
}

// B-mode history: ring buffer + 2m x 2m middle matrix (BFGSMat.h:99-146),
// slot-indexed with identity padding exactly like the JAX design.
struct BHist {
  int n, m, ncorr, ptr;
  double theta;
  std::vector<double> s, y, ys;     // [m, n], [m, n], [m]
  std::vector<double> minv;         // [2m, 2m], S'S block unscaled
  std::vector<double> mdense;       // [2m, 2m] inverse of scaled minv

  BHist(int n_, int m_) { reset(n_, m_); }

  void reset(int n_, int m_) {
    n = n_;
    m = m_;
    ncorr = 0;
    ptr = m_;
    theta = 1.0;
    s.assign(static_cast<size_t>(n) * m, 0.0);
    y.assign(static_cast<size_t>(n) * m, 0.0);
    ys.assign(m, 0.0);
    minv.assign(static_cast<size_t>(2 * m) * 2 * m, 0.0);
    for (int i = 0; i < 2 * m; ++i) minv[i * 2 * m + i] = 1.0;
    refactor();
  }

  double* srow(int j) { return s.data() + static_cast<size_t>(j) * n; }
  double* yrow(int j) { return y.data() + static_cast<size_t>(j) * n; }
  const double* srow(int j) const {
    return s.data() + static_cast<size_t>(j) * n;
  }
  const double* yrow(int j) const {
    return y.data() + static_cast<size_t>(j) * n;
  }

  void refactor() {
    // mdense = inv(minv with SS block scaled by theta), column by column.
    const int d = 2 * m;
    std::vector<double> scaled(minv);
    for (int i = m; i < d; ++i)
      for (int j = m; j < d; ++j) scaled[i * d + j] *= theta;
    mdense.assign(static_cast<size_t>(d) * d, 0.0);
    for (int c = 0; c < d; ++c) {
      std::vector<double> e(d, 0.0);
      e[c] = 1.0;
      lu_solve(scaled, e, d);
      for (int r = 0; r < d; ++r) mdense[r * d + c] = e[r];
    }
  }

  void add(const double* sv, const double* yv) {
    const int loc = ptr % m;
    std::memcpy(srow(loc), sv, sizeof(double) * n);
    std::memcpy(yrow(loc), yv, sizeof(double) * n);
    const double d = vdot(sv, yv, n);
    ys[loc] = d;
    theta = vdot(yv, yv, n) / d;
    if (ncorr < m) ++ncorr;
    ptr = loc + 1;

    const int dd = 2 * m;
    minv[loc * dd + loc] = -d;
    // S'S row/col (valid slots)
    for (int j = 0; j < ncorr; ++j) {
      const double v = vdot(srow(j), sv, n);
      minv[(m + loc) * dd + (m + j)] = v;
      minv[(m + j) * dd + (m + loc)] = v;
    }
    // Stale y column when the buffer is full
    if (ncorr >= m) {
      for (int i = 0; i < m; ++i) {
        minv[(m + i) * dd + loc] = 0.0;
        minv[loc * dd + (m + i)] = 0.0;
      }
    }
    // L row for the new s: ring distance 1..ncorr-1
    int yloc = (loc + m - 1) % m;
    for (int i = 0; i < ncorr - 1; ++i) {
      const double v = vdot(sv, yrow(yloc), n);
      minv[(m + loc) * dd + yloc] = v;
      minv[yloc * dd + (m + loc)] = v;
      yloc = (yloc + m - 1) % m;
    }
    refactor();
  }

  // W'v with W = [Y, theta*S]; compact [2*ncorr] (slot order; slots fill
  // sequentially so compact == slot prefix).
  void apply_wtv(const double* v, std::vector<double>& res) const {
    res.assign(2 * ncorr, 0.0);
    for (int j = 0; j < ncorr; ++j) {
      res[j] = vdot(yrow(j), v, n);
      res[ncorr + j] = theta * vdot(srow(j), v, n);
    }
  }

  // M v on a compact [2*ncorr] vector via the padded dense inverse.
  void apply_mv(const std::vector<double>& v, std::vector<double>& res)
      const {
    const int d = 2 * m;
    std::vector<double> pad(d, 0.0);
    for (int j = 0; j < ncorr; ++j) {
      pad[j] = v[j];
      pad[m + j] = v[ncorr + j];
    }
    std::vector<double> out(d, 0.0);
    for (int r = 0; r < d; ++r)
      out[r] = std::inner_product(pad.begin(), pad.end(),
                                  mdense.begin() + static_cast<size_t>(r) * d,
                                  0.0);
    res.assign(2 * ncorr, 0.0);
    for (int j = 0; j < ncorr; ++j) {
      res[j] = out[j];
      res[ncorr + j] = out[m + j];
    }
  }

  // Row b of W (compact)
  void wb(int b, std::vector<double>& res) const {
    res.assign(2 * ncorr, 0.0);
    for (int j = 0; j < ncorr; ++j) {
      res[j] = yrow(j)[b];
      res[ncorr + j] = theta * srow(j)[b];
    }
  }

  void apply_wtpv(const std::vector<int>& pset, const double* v,
                  std::vector<double>& res) const {
    res.assign(2 * ncorr, 0.0);
    for (int j = 0; j < ncorr; ++j) {
      double ry = 0.0, rs = 0.0;
      const double* yp = yrow(j);
      const double* sp = srow(j);
      for (size_t i = 0; i < pset.size(); ++i) {
        ry += yp[pset[i]] * v[i];
        rs += sp[pset[i]] * v[i];
      }
      res[j] = ry;
      res[ncorr + j] = theta * rs;
    }
  }

  void apply_ptwmv(const std::vector<int>& pset,
                   const std::vector<double>& v, double scale,
                   std::vector<double>& res) const {
    res.assign(pset.size(), 0.0);
    if (ncorr < 1 || pset.empty()) return;
    std::vector<double> mv;
    apply_mv(v, mv);
    for (int j = 0; j < ncorr; ++j) mv[ncorr + j] *= theta;
    for (int j = 0; j < ncorr; ++j) {
      const double* yp = yrow(j);
      const double* sp = srow(j);
      for (size_t i = 0; i < pset.size(); ++i)
        res[i] += mv[j] * yp[pset[i]] + mv[ncorr + j] * sp[pset[i]];
    }
    for (auto& r : res) r *= scale;
  }

  void compute_ftbab(const std::vector<int>& fv,
                     const std::vector<int>& act, const double* drt,
                     std::vector<double>& res) const {
    res.assign(fv.size(), 0.0);
    if (ncorr < 1 || act.empty() || fv.empty()) return;
    std::vector<double> ad(act.size());
    for (size_t i = 0; i < act.size(); ++i) ad[i] = drt[act[i]];
    std::vector<double> rhs;
    apply_wtpv(act, ad.data(), rhs);
    apply_ptwmv(fv, rhs, -1.0, res);
  }

  // inv(P'BP) v (BFGSMat::solve_PtBP semantics)
  void solve_ptbp(const std::vector<int>& pset,
                  const std::vector<double>& v,
                  std::vector<double>& res) const {
    const size_t np = pset.size();
    res.assign(np, 0.0);
    if (np == 0) return;
    if (ncorr < 1) {
      for (size_t i = 0; i < np; ++i) res[i] = v[i] / theta;
      return;
    }
    const int c = ncorr, dd = 2 * c, mm = m;
    // WP rows: wy[j][i] = y_j[p_i], ws[j][i] = s_j[p_i] (raw, no theta)
    std::vector<double> mid(static_cast<size_t>(dd) * dd, 0.0);
    auto gram = [&](bool ay, int j, bool by, int k) {
      const double* a = ay ? yrow(j) : srow(j);
      const double* b = by ? yrow(k) : srow(k);
      double s2 = 0.0;
      for (size_t i = 0; i < np; ++i) s2 += a[pset[i]] * b[pset[i]];
      return s2;
    };
    for (int j = 0; j < c; ++j)
      for (int k = 0; k < c; ++k) {
        mid[j * dd + k] = minv[j * 2 * mm + k] - gram(true, j, true, k) /
            theta;
        mid[(c + j) * dd + k] =
            minv[(mm + j) * 2 * mm + k] - gram(false, j, true, k);
        mid[j * dd + (c + k)] = mid[(c + k) * dd + j];
        mid[(c + j) * dd + (c + k)] = theta *
            (minv[(mm + j) * 2 * mm + (mm + k)] - gram(false, j, false, k));
      }
    // Fix the upper-left/lower-left symmetry: recompute upper-right from
    // lower-left transpose after both are filled.
    for (int j = 0; j < c; ++j)
      for (int k = 0; k < c; ++k)
        mid[j * dd + (c + k)] = mid[(c + k) * dd + j];

    std::vector<double> wpv(dd, 0.0);
    for (int j = 0; j < c; ++j) {
      double ry = 0.0, rs = 0.0;
      const double* yp = yrow(j);
      const double* sp = srow(j);
      for (size_t i = 0; i < np; ++i) {
        ry += yp[pset[i]] * v[i];
        rs += sp[pset[i]] * v[i];
      }
      wpv[j] = ry;
      wpv[c + j] = theta * rs;
    }
    lu_solve(mid, wpv, dd);
    for (int j = 0; j < c; ++j) wpv[c + j] *= theta;
    for (size_t i = 0; i < np; ++i) {
      double acc = v[i] / theta;
      for (int j = 0; j < c; ++j)
        acc += (yrow(j)[pset[i]] * wpv[j] + srow(j)[pset[i]] * wpv[c + j]) /
            (theta * theta);
      res[i] = acc;
    }
  }

  void apply_ptbqv(const std::vector<int>& pset,
                   const std::vector<int>& qset,
                   const std::vector<double>& v,
                   std::vector<double>& res) const {
    res.assign(pset.size(), 0.0);
    if (ncorr < 1 || pset.empty() || qset.empty()) return;
    std::vector<double> rhs;
    apply_wtpv(qset, v.data(), rhs);
    std::vector<double> mv;
    apply_mv(rhs, mv);
    for (int j = 0; j < ncorr; ++j) mv[ncorr + j] *= theta;
    for (int j = 0; j < ncorr; ++j) {
      const double* yp = yrow(j);
      const double* sp = srow(j);
      for (size_t i = 0; i < pset.size(); ++i)
        res[i] -= mv[j] * yp[pset[i]] + mv[ncorr + j] * sp[pset[i]];
    }
  }
};

// Generalized Cauchy point (Cauchy.h:86-284 semantics).
void cauchy_point(const BHist& bfgs, const double* x0, const double* g,
                  const double* lb, const double* ub, double* xcp,
                  std::vector<double>& vecc, std::vector<int>& newact,
                  std::vector<int>& fv) {
  const int n = bfgs.n;
  const double inf = std::numeric_limits<double>::infinity();
  std::memcpy(xcp, x0, sizeof(double) * n);
  vecc.assign(2 * bfgs.ncorr, 0.0);
  newact.clear();
  fv.clear();

  std::vector<double> brk(n), vecd(n);
  std::vector<int> ord;
  for (int i = 0; i < n; ++i) {
    if (lb[i] == ub[i])
      brk[i] = 0.0;
    else if (g[i] < 0.0)
      brk[i] = (x0[i] - ub[i]) / g[i];
    else if (g[i] > 0.0)
      brk[i] = (x0[i] - lb[i]) / g[i];
    else
      brk[i] = inf;
    const bool iszero = brk[i] == 0.0;
    vecd[i] = iszero ? 0.0 : -g[i];
    if (brk[i] == inf)
      fv.push_back(i);
    else if (!iszero)
      ord.push_back(i);
  }
  std::stable_sort(ord.begin(), ord.end(),
                   [&](int a, int b) { return brk[a] < brk[b]; });

  const int nord = static_cast<int>(ord.size());
  const int nfree = static_cast<int>(fv.size());
  if (nfree < 1 && nord < 1) return;

  std::vector<double> vecp, cache;
  bfgs.apply_wtv(vecd.data(), vecp);
  double fp = -vdot(vecd.data(), vecd.data(), n);
  double fpp;
  if (bfgs.ncorr >= 1) {
    bfgs.apply_mv(vecp, cache);
    fpp = -bfgs.theta * fp -
        std::inner_product(vecp.begin(), vecp.end(), cache.begin(), 0.0);
  } else {
    fpp = -bfgs.theta * fp;
  }
  double deltatmin = -fp / fpp;
  double il = 0.0;
  int b = 0;
  double iu = (nord < 1) ? inf : brk[ord[b]];
  double deltat = iu - il;

  bool crossed_all = false;
  std::vector<double> wact;
  while (deltatmin >= deltat) {
    for (size_t j = 0; j < vecc.size(); ++j) vecc[j] += deltat * vecp[j];
    const int act_begin = b;
    int i = b;
    while (i < nord && brk[ord[i]] <= iu) ++i;
    const int act_end = i - 1;
    if (nfree == 0 && act_end == nord - 1) {
      for (int k = act_begin; k <= act_end; ++k) {
        const int act = ord[k];
        xcp[act] = (vecd[act] > 0.0) ? ub[act] : lb[act];
        newact.push_back(act);
      }
      crossed_all = true;
      break;
    }
    fp += deltat * fpp;
    for (int k = act_begin; k <= act_end; ++k) {
      const int act = ord[k];
      xcp[act] = (vecd[act] > 0.0) ? ub[act] : lb[act];
      const double zact = xcp[act] - x0[act];
      const double gact = g[act];
      const double ggact = gact * gact;
      bfgs.wb(act, wact);
      bfgs.apply_mv(wact, cache);
      const double cd_c =
          std::inner_product(cache.begin(), cache.end(), vecc.begin(), 0.0);
      const double cd_p =
          std::inner_product(cache.begin(), cache.end(), vecp.begin(), 0.0);
      const double cd_w =
          std::inner_product(cache.begin(), cache.end(), wact.begin(), 0.0);
      fp += ggact + bfgs.theta * gact * zact - gact * cd_c;
      fpp -= bfgs.theta * ggact + 2.0 * gact * cd_p + ggact * cd_w;
      for (size_t j = 0; j < vecp.size(); ++j) vecp[j] += gact * wact[j];
      vecd[act] = 0.0;
      newact.push_back(act);
    }
    deltatmin = -fp / fpp;
    il = iu;
    b = act_end + 1;
    if (b >= nord) break;
    iu = brk[ord[b]];
    deltat = iu - il;
  }

  const double eps = std::numeric_limits<double>::epsilon();
  if (fpp < eps) deltatmin = -fp / eps;
  if (!crossed_all) {
    deltatmin = std::max(deltatmin, 0.0);
    for (size_t j = 0; j < vecc.size(); ++j) vecc[j] += deltatmin * vecp[j];
    const double tfinal = il + deltatmin;
    for (int i = 0; i < nfree; ++i) {
      const int coord = fv[i];
      xcp[coord] = x0[coord] + tfinal * vecd[coord];
    }
    for (int i = b; i < nord; ++i) {
      const int coord = ord[i];
      xcp[coord] = x0[coord] + tfinal * vecd[coord];
      fv.push_back(coord);
    }
  }
}

// BOXCQP subspace minimization (SubspaceMin.h:122-302 semantics).
void subspace_minimize(const BHist& bfgs, const double* x0,
                       const double* xcp, const double* g, const double* lb,
                       const double* ub, const std::vector<double>& wd,
                       const std::vector<int>& newact,
                       const std::vector<int>& fv, int maxit, double* drt) {
  const int n = bfgs.n;
  const double eps = std::numeric_limits<double>::epsilon();
  for (int i = 0; i < n; ++i) drt[i] = xcp[i] - x0[i];
  const int nfree = static_cast<int>(fv.size());
  if (nfree < 1) return;

  std::vector<double> vecc;
  bfgs.compute_ftbab(fv, newact, drt, vecc);
  std::vector<double> vecl(nfree), vecu(nfree);
  for (int i = 0; i < nfree; ++i) {
    const int coord = fv[i];
    vecl[i] = lb[coord] - x0[coord];
    vecu[i] = ub[coord] - x0[coord];
    vecc[i] += g[coord];
  }
  std::vector<double> negc(nfree);
  for (int i = 0; i < nfree; ++i) negc[i] = -vecc[i];
  std::vector<double> vecy;
  bfgs.solve_ptbp(fv, negc, vecy);

  bool feasible = true;
  for (int i = 0; i < nfree; ++i)
    if (vecy[i] < vecl[i] || vecy[i] > vecu[i]) {
      feasible = false;
      break;
    }
  if (feasible) {
    for (int i = 0; i < nfree; ++i) drt[fv[i]] = vecy[i];
    return;
  }

  std::vector<double> yfb(vecy);
  std::vector<double> lam(nfree, 0.0), mu(nfree, 0.0);
  int k = 0;
  for (k = 0; k < maxit; ++k) {
    std::vector<int> lset, uset, pset, yl, yu, yp;
    for (int i = 0; i < nfree; ++i) {
      const int coord = fv[i];
      const double li = vecl[i], ui = vecu[i];
      if (vecy[i] < li || (vecy[i] == li && lam[i] >= 0.0)) {
        lset.push_back(coord);
        yl.push_back(i);
        vecy[i] = li;
        mu[i] = 0.0;
      } else if (vecy[i] > ui || (vecy[i] == ui && mu[i] >= 0.0)) {
        uset.push_back(coord);
        yu.push_back(i);
        vecy[i] = ui;
        lam[i] = 0.0;
      } else {
        pset.push_back(coord);
        yp.push_back(i);
        lam[i] = 0.0;
        mu[i] = 0.0;
      }
    }
    if (!yp.empty()) {
      std::vector<double> rhs(yp.size());
      for (size_t i = 0; i < yp.size(); ++i) rhs[i] = vecc[yp[i]];
      std::vector<double> ll(yl.size()), uu(yu.size()), tmp;
      for (size_t i = 0; i < yl.size(); ++i) ll[i] = vecl[yl[i]];
      for (size_t i = 0; i < yu.size(); ++i) uu[i] = vecu[yu[i]];
      bfgs.apply_ptbqv(pset, lset, ll, tmp);
      for (size_t i = 0; i < yp.size(); ++i) rhs[i] += tmp[i];
      bfgs.apply_ptbqv(pset, uset, uu, tmp);
      for (size_t i = 0; i < yp.size(); ++i) rhs[i] += tmp[i];
      for (auto& r : rhs) r = -r;
      bfgs.solve_ptbp(pset, rhs, tmp);
      for (size_t i = 0; i < yp.size(); ++i) vecy[yp[i]] = tmp[i];
    }
    std::vector<double> fy;
    if (!yl.empty() || !yu.empty()) bfgs.apply_wtpv(fv, vecy.data(), fy);
    if (!yl.empty()) {
      std::vector<double> res;
      bfgs.apply_ptwmv(lset, fy, -1.0, res);
      for (size_t i = 0; i < yl.size(); ++i)
        lam[yl[i]] = res[i] + vecc[yl[i]] + bfgs.theta * vecy[yl[i]];
    }
    if (!yu.empty()) {
      std::vector<double> res;
      bfgs.apply_ptwmv(uset, fy, -1.0, res);
      for (size_t i = 0; i < yu.size(); ++i)
        mu[yu[i]] = -(res[i] + vecc[yu[i]] + bfgs.theta * vecy[yu[i]]);
    }
    bool conv = true;
    for (size_t i = 0; i < yl.size() && conv; ++i)
      if (lam[yl[i]] < 0.0) conv = false;
    for (size_t i = 0; i < yu.size() && conv; ++i)
      if (mu[yu[i]] < 0.0) conv = false;
    for (size_t i = 0; i < yp.size() && conv; ++i)
      if (vecy[yp[i]] < vecl[yp[i]] || vecy[yp[i]] > vecu[yp[i]])
        conv = false;
    if (conv) break;
  }
  if (k >= maxit) {
    // 3-level fallback
    for (int i = 0; i < nfree; ++i)
      drt[fv[i]] = std::min(std::max(vecy[i], vecl[i]), vecu[i]);
    if (vdot(drt, g, n) <= -eps) return;
    for (int i = 0; i < nfree; ++i)
      drt[fv[i]] = std::min(std::max(yfb[i], vecl[i]), vecu[i]);
    if (vdot(drt, g, n) <= -eps) return;
    for (int i = 0; i < nfree; ++i) drt[fv[i]] = yfb[i];
    return;
  }
  for (int i = 0; i < nfree; ++i) drt[fv[i]] = vecy[i];
}

void force_bounds(double* x, const double* lb, const double* ub, int n) {
  for (int i = 0; i < n; ++i) x[i] = std::min(std::max(x[i], lb[i]), ub[i]);
}

double proj_grad_norm(const double* x, const double* g, const double* lb,
                      const double* ub, int n) {
  double r = 0.0;
  for (int i = 0; i < n; ++i) {
    const double p = std::min(std::max(x[i] - g[i], lb[i]), ub[i]) - x[i];
    r = std::max(r, std::abs(p));
  }
  return r;
}

double max_step_size_b(const double* x, const double* d, const double* lb,
                       const double* ub, int n) {
  double step = std::numeric_limits<double>::infinity();
  for (int i = 0; i < n; ++i) {
    if (d[i] > 0.0)
      step = std::min(step, (ub[i] - x[i]) / d[i]);
    else if (d[i] < 0.0)
      step = std::min(step, (lb[i] - x[i]) / d[i]);
  }
  return step;
}

}  // namespace

// core.cpp exports (C linkage; both files build into one .so).
extern "C" int lbfgspp_native_morethuente_c(
    Obj f, void* user, int max_linesearch, double min_step, double ftol,
    double wolfe, const double* xp, const double* drt, double step_max,
    double step_in, double fx_in, double* x, double* grad, double dg_in,
    int n, double* out_step, double* out_fx, double* out_dg, int* out_nfev);
extern "C" double lbfgspp_builtin_objective(int id, const double* x,
                                            double* grad, int n);

extern "C" {

// Full L-BFGS-B solve (LBFGSB.h:117-262 semantics).
int lbfgspp_native_minimize_b(Obj f, void* user, int builtin_id, int n,
                              double* x, const double* lb, const double* ub,
                              const ParamsB* pp, double* out_fx,
                              double* out_pgnorm, int* out_niter,
                              int* out_nfev) {
  const ParamsB& p = *pp;

  struct Shim {
    Obj f;
    void* user;
    int builtin;
  } shim{f, user, builtin_id};
  Obj call = [](const double* xx, double* gg, int nn, void* us) -> double {
    auto* sh = static_cast<Shim*>(us);
    if (sh->builtin >= 0)
      return lbfgspp_builtin_objective(sh->builtin, xx, gg, nn);
    return sh->f(xx, gg, nn, sh->user);
  };

  force_bounds(x, lb, ub, n);
  BHist bfgs(n, p.m);
  std::vector<double> grad(n), xp(n), gradp(n), drt(n), xcp(n);
  std::vector<double> vecc;
  std::vector<int> newact, fvset;
  std::vector<double> fx_ring(std::max(p.past, 1), 0.0);
  const double eps_machine = std::numeric_limits<double>::epsilon();

  double fx = call(x, grad.data(), n, &shim);
  int nfev = 1;
  double pg = proj_grad_norm(x, grad.data(), lb, ub, n);
  if (p.past > 0) fx_ring[0] = fx;

  int k = 1;
  int status = kRunningB;
  if (pg <= p.epsilon || pg <= p.epsilon_rel * vnrm2(x, n)) {
    status = kConvergedGradB;
  } else {
    cauchy_point(bfgs, x, grad.data(), lb, ub, xcp.data(), vecc, newact,
                 fvset);
    for (int i = 0; i < n; ++i) drt[i] = xcp[i] - x[i];
    const double dn = vnrm2(drt.data(), n);
    if (dn > 0.0)
      for (int i = 0; i < n; ++i) drt[i] /= dn;

    for (;;) {
      std::memcpy(xp.data(), x, sizeof(double) * n);
      std::memcpy(gradp.data(), grad.data(), sizeof(double) * n);
      double dg = vdot(grad.data(), drt.data(), n);
      double step_max = max_step_size_b(x, drt.data(), lb, ub, n);
      if (dg >= 0.0 || step_max <= p.min_step) {
        for (int i = 0; i < n; ++i) drt[i] = xcp[i] - x[i];
        bfgs.reset(n, p.m);
        dg = vdot(grad.data(), drt.data(), n);
        step_max = max_step_size_b(x, drt.data(), lb, ub, n);
      }
      step_max = std::min(p.max_step, step_max);
      double step = std::min(1.0, step_max);

      double ls_step, ls_fx, ls_dg;
      int ls_nfev;
      const int ls_status = lbfgspp_native_morethuente_c(
          call, &shim, p.max_linesearch, p.min_step, p.ftol, p.wolfe,
          xp.data(), drt.data(), step_max, step, fx, x, grad.data(), dg, n,
          &ls_step, &ls_fx, &ls_dg, &ls_nfev);
      nfev += ls_nfev;
      fx = ls_fx;
      if (ls_status != kRunningB) {
        status = ls_status;
        break;
      }
      pg = proj_grad_norm(x, grad.data(), lb, ub, n);
      if (pg <= p.epsilon || pg <= p.epsilon_rel * vnrm2(x, n)) {
        status = kConvergedGradB;
        break;
      }
      if (p.past > 0) {
        const double fxd = fx_ring[k % p.past];
        if (k >= p.past &&
            std::abs(fxd - fx) <=
                p.delta *
                    std::max(std::max(std::abs(fx), std::abs(fxd)), 1.0)) {
          status = kConvergedDeltaB;
          break;
        }
        fx_ring[k % p.past] = fx;
      }
      if (p.max_iterations != 0 && k >= p.max_iterations) {
        status = kMaxIterationsB;
        break;
      }
      std::vector<double> vs(n), vy(n);
      for (int i = 0; i < n; ++i) {
        vs[i] = x[i] - xp[i];
        vy[i] = grad[i] - gradp[i];
      }
      if (vdot(vs.data(), vy.data(), n) >
          eps_machine * vdot(vy.data(), vy.data(), n))
        bfgs.add(vs.data(), vy.data());

      force_bounds(x, lb, ub, n);
      cauchy_point(bfgs, x, grad.data(), lb, ub, xcp.data(), vecc, newact,
                   fvset);
      subspace_minimize(bfgs, x, xcp.data(), grad.data(), lb, ub, vecc,
                        newact, fvset, p.max_submin, drt.data());
      ++k;
    }
  }

  *out_fx = fx;
  *out_pgnorm = pg;
  *out_niter = k;
  *out_nfev = nfev;
  return status;
}

}  // extern "C"
