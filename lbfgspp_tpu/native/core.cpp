// Native CPU L-BFGS solver core.
//
// The TPU framework's latency-path complement: JAX/XLA dispatch costs
// ~100us-1ms per launch, which dwarfs a small solve; this plain-C++ core
// (C ABI, loaded via ctypes) runs the same algorithm at microsecond scale
// for single small problems -- the reference library's home turf
// (/root/reference/include/LBFGS.h semantics; re-implemented from the
// algorithm spec shared with lbfgspp_tpu/lbfgs.py and tests/oracle.py,
// not transcribed).
//
// Exported API (see native.py for the ctypes bindings):
//   lbfgspp_native_minimize(...)  -- full L-BFGS solve, objective supplied
//                                    as a C callback or a builtin id.
//
// Build: g++ -O3 -march=native -shared -fPIC core.cpp -o libnative.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

using Obj = double (*)(const double* x, double* grad, int n, void* user);

struct Params {
  int m;
  double epsilon;
  double epsilon_rel;
  int past;
  double delta;
  int max_iterations;
  int linesearch;  // 1 = Armijo, 2 = Wolfe, 3 = strong Wolfe
  int max_linesearch;
  double min_step;
  double max_step;
  double ftol;
  double wolfe;
};

// Status codes mirror lbfgspp_tpu.types.Status.
enum Status {
  kRunning = 0,
  kConvergedGrad = 1,
  kConvergedDelta = 2,
  kMaxIterations = 3,
  kLsInvalidStep = 10,
  kLsNotDescent = 11,
  kLsMaxLinesearch = 12,
  kLsStepTooSmall = 13,
  kLsStepTooLarge = 14,
  kLsBracketInverted = 15,
  kLsNumerical = 16,
};

inline double dot(const double* a, const double* b, int n) {
  double s = 0.0;
  for (int i = 0; i < n; ++i) s += a[i] * b[i];
  return s;
}

inline double nrm2(const double* a, int n) { return std::sqrt(dot(a, a, n)); }

inline void axpy(double* y, double alpha, const double* x, int n) {
  for (int i = 0; i < n; ++i) y[i] += alpha * x[i];
}

// Ring-buffer correction history with the two-loop recursion
// (BFGSMat.h:35-302 semantics).
struct History {
  int n, m, ncorr, ptr;
  double theta;
  std::vector<double> s, y, ys, alpha;

  History(int n_, int m_) : n(n_), m(m_), ncorr(0), ptr(m_), theta(1.0),
      s(static_cast<size_t>(n_) * m_), y(static_cast<size_t>(n_) * m_),
      ys(m_), alpha(m_) {}

  double* srow(int j) { return s.data() + static_cast<size_t>(j) * n; }
  double* yrow(int j) { return y.data() + static_cast<size_t>(j) * n; }

  void add(const double* sv, const double* yv) {
    int loc = ptr % m;
    std::memcpy(srow(loc), sv, sizeof(double) * n);
    std::memcpy(yrow(loc), yv, sizeof(double) * n);
    double d = dot(sv, yv, n);
    ys[loc] = d;
    theta = dot(yv, yv, n) / d;
    if (ncorr < m) ++ncorr;
    ptr = loc + 1;
  }

  // res = a * H * v (two-loop recursion, newest -> oldest -> newest).
  void apply_hv(const double* v, double a, double* res) {
    for (int i = 0; i < n; ++i) res[i] = a * v[i];
    int j = ptr % m;
    std::vector<int> order;
    order.reserve(ncorr);
    for (int i = 0; i < ncorr; ++i) {
      j = (j + m - 1) % m;
      alpha[j] = dot(srow(j), res, n) / ys[j];
      axpy(res, -alpha[j], yrow(j), n);
      order.push_back(j);
    }
    for (int i = 0; i < n; ++i) res[i] /= theta;
    for (int i = ncorr - 1; i >= 0; --i) {
      int jj = order[i];
      double beta = dot(yrow(jj), res, n) / ys[jj];
      axpy(res, alpha[jj] - beta, srow(jj), n);
    }
  }
};

struct LsResult {
  double step, fx, dg;
  int status;
  int nfev;
};

// ---------------------------------------------------------------------------
// Line searches.  All update x/grad in place and return the accepted state.
// ---------------------------------------------------------------------------

LsResult ls_backtracking(Obj f, void* user, const Params& p, const double* xp,
                         const double* drt, double step_max, double step,
                         double fx, double* x, double* grad, double dg,
                         int n) {
  const double dec = 0.5, inc = 2.1;
  (void)step_max;
  if (step <= 0.0) return {step, fx, dg, kLsInvalidStep, 0};
  const double fx_init = fx, dg_init = dg;
  if (dg_init > 0.0) return {step, fx, dg, kLsNotDescent, 0};
  const double test_decr = p.ftol * dg_init;
  double width = 0.0;
  int nfev = 0;
  for (int it = 0; it < p.max_linesearch; ++it) {
    for (int i = 0; i < n; ++i) x[i] = xp[i] + step * drt[i];
    fx = f(x, grad, n, user);
    ++nfev;
    if (std::isnan(fx) || fx > fx_init + step * test_decr) {
      width = dec;
    } else {
      dg = dot(grad, drt, n);
      if (p.linesearch == 1) return {step, fx, dg, kRunning, nfev};
      if (dg < p.wolfe * dg_init) {
        width = inc;
      } else {
        if (p.linesearch == 2) return {step, fx, dg, kRunning, nfev};
        if (dg > -p.wolfe * dg_init) {
          width = dec;
        } else {
          return {step, fx, dg, kRunning, nfev};
        }
      }
    }
    if (step < p.min_step) return {step, fx, dg, kLsStepTooSmall, nfev};
    if (step > p.max_step) return {step, fx, dg, kLsStepTooLarge, nfev};
    step *= width;
  }
  return {step, fx, dg, kLsMaxLinesearch, nfev};
}

LsResult ls_bracketing(Obj f, void* user, const Params& p, const double* xp,
                       const double* drt, double step_max, double step,
                       double fx, double* x, double* grad, double dg,
                       int n) {
  (void)step_max;
  if (step <= 0.0) return {step, fx, dg, kLsInvalidStep, 0};
  const double fx_init = fx, dg_init = dg;
  if (dg_init > 0.0) return {step, fx, dg, kLsNotDescent, 0};
  const double test_decr = p.ftol * dg_init;
  double step_lo = 0.0;
  double step_hi = std::numeric_limits<double>::infinity();
  int nfev = 0;
  for (int it = 0; it < p.max_linesearch; ++it) {
    for (int i = 0; i < n; ++i) x[i] = xp[i] + step * drt[i];
    fx = f(x, grad, n, user);
    ++nfev;
    if (!std::isfinite(fx) || fx > fx_init + step * test_decr) {
      step_hi = step;
    } else {
      dg = dot(grad, drt, n);
      if (p.linesearch == 1) return {step, fx, dg, kRunning, nfev};
      if (dg < p.wolfe * dg_init) {
        step_lo = step;
      } else {
        if (p.linesearch == 2) return {step, fx, dg, kRunning, nfev};
        if (dg > -p.wolfe * dg_init) {
          step_hi = step;
        } else {
          return {step, fx, dg, kRunning, nfev};
        }
      }
    }
    if (step_lo > step_hi) return {step, fx, dg, kLsBracketInverted, nfev};
    if (step < p.min_step) return {step, fx, dg, kLsStepTooSmall, nfev};
    if (step > p.max_step) return {step, fx, dg, kLsStepTooLarge, nfev};
    step = std::isinf(step_hi) ? 2.0 * step
                               : step_lo / 2.0 + step_hi / 2.0;
  }
  return {step, fx, dg, kLsMaxLinesearch, nfev};
}

// Safeguarded quadratic interpolation for the Nocedal-Wright zoom
// (LineSearchNocedalWright.h:30-60 semantics; falls back to bisection near
// the ends / on NaN / outside the bracket).
double nw_quad_interp(double step_lo, double step_hi, double fx_lo,
                      double fx_hi, double dg_lo) {
  using std::abs;
  const double fdiff = fx_hi - fx_lo;
  const double sdiff = step_hi - step_lo;
  const double smid = (step_hi + step_lo) / 2.0;
  double cand = fdiff * step_lo - smid * sdiff * dg_lo;
  cand = cand / (fdiff - sdiff * dg_lo);
  const bool nan = !std::isfinite(cand);
  const double end_dist =
      std::min(abs(cand - step_lo), abs(cand - step_hi));
  const bool near_end = end_dist < 0.01 * abs(sdiff);
  const bool bisect = nan || cand <= std::min(step_lo, step_hi) ||
                      cand >= std::max(step_lo, step_hi) || near_end;
  return bisect ? smid : cand;
}

LsResult ls_nocedalwright(Obj f, void* user, const Params& p,
                          const double* xp, const double* drt,
                          double step_max, double step, double fx,
                          double* x, double* grad, double dg, int n) {
  (void)step_max;
  if (step <= 0.0) return {step, fx, dg, kLsInvalidStep, 0};
  const double expansion = 2.0;
  const double fx_init = fx, dg_init = dg;
  if (dg_init > 0.0) return {step, fx, dg, kLsNotDescent, 0};
  const double test_decr = p.ftol * dg_init;
  const double test_curv = -p.wolfe * dg_init;

  double step_hi = 0.0, fx_hi = 0.0;
  double step_lo = 0.0, fx_lo = fx_init, dg_lo = dg_init;
  std::vector<double> x_lo(xp, xp + n), grad_lo(grad, grad + n);
  int nfev = 0;
  int it = 0;

  // Bracketing phase.
  for (;;) {
    for (int i = 0; i < n; ++i) x[i] = xp[i] + step * drt[i];
    fx = f(x, grad, n, user);
    dg = dot(grad, drt, n);
    ++nfev;
    if (fx - fx_init > step * test_decr ||
        (0.0 < step_lo && fx >= fx_lo)) {
      step_hi = step;
      fx_hi = fx;
      break;
    }
    if (std::abs(dg) <= test_curv) return {step, fx, dg, kRunning, nfev};
    step_hi = step_lo;
    fx_hi = fx_lo;
    step_lo = step;
    fx_lo = fx;
    dg_lo = dg;
    std::memcpy(x_lo.data(), x, sizeof(double) * n);
    std::memcpy(grad_lo.data(), grad, sizeof(double) * n);
    if (dg >= 0.0) break;
    ++it;
    if (it >= p.max_linesearch) return {step, fx, dg, kRunning, nfev};
    step *= expansion;
  }

  // Zoom phase.
  for (;;) {
    step = nw_quad_interp(step_lo, step_hi, fx_lo, fx_hi, dg_lo);
    for (int i = 0; i < n; ++i) x[i] = xp[i] + step * drt[i];
    fx = f(x, grad, n, user);
    dg = dot(grad, drt, n);
    ++nfev;
    if (fx - fx_init > step * test_decr || fx >= fx_lo) {
      if (step == step_hi) return {step, fx, dg, kLsNumerical, nfev};
      step_hi = step;
      fx_hi = fx;
    } else {
      if (std::abs(dg) <= test_curv) return {step, fx, dg, kRunning, nfev};
      if (dg * (step_hi - step_lo) >= 0.0) {
        step_hi = step_lo;
        fx_hi = fx_lo;
      }
      if (step == step_lo) return {step, fx, dg, kLsNumerical, nfev};
      step_lo = step;
      fx_lo = fx;
      dg_lo = dg;
      std::memcpy(x_lo.data(), x, sizeof(double) * n);
      std::memcpy(grad_lo.data(), grad, sizeof(double) * n);
    }
    ++it;
    if (it >= p.max_linesearch) {
      // Exhausted: restore the best-so-far (lo) state.
      if (step_lo <= 0.0) return {step, fx, dg, kLsNumerical, nfev};
      std::memcpy(x, x_lo.data(), sizeof(double) * n);
      std::memcpy(grad, grad_lo.data(), sizeof(double) * n);
      return {step_lo, fx_lo, dg_lo, kRunning, nfev};
    }
  }
}

// More-Thuente step selection helpers (LineSearchMoreThuente.h:34-189
// semantics; single-stage psi formulation).
double mt_quad_fga(double a, double b, double fa, double ga, double fb) {
  const double ba = b - a;
  const double w = 0.5 * ba * ga / (fa - fb + ba * ga);
  return a + w * ba;
}

double mt_quad_gg(double a, double b, double ga, double gb) {
  return a + ga / (ga - gb) * (b - a);
}

bool mt_cubic(double a, double b, double fa, double fb, double ga, double gb,
              double* out) {
  using std::abs;
  *out = b;  // default when no minimizer exists (oracle returns b)
  const double eps = std::numeric_limits<double>::epsilon();
  const double apb = a + b, ba = b - a, ba2 = ba * ba;
  const double fba = fb - fa, gba = gb - ga;
  const double z3 = (ga + gb) * ba - 2.0 * fba;
  const double z2 = 0.5 * (gba * ba2 - 3.0 * apb * z3);
  const double z1 = fba * ba2 - apb * z2 - (a * apb + b * b) * z3;
  if (abs(z3) < eps * abs(z2) || abs(z3) < eps * abs(z1)) {
    if (z2 * ba > 0.0) {
      *out = -0.5 * z1 / z2;
      return true;
    }
    return false;
  }
  const double u = z2 / (3.0 * z3), v = z1 / z2;
  const double vu = v / u;
  if (vu > 1.0 || std::isnan(vu)) return false;
  double r1, r2;
  if (abs(u) >= abs(v)) {
    const double w = 1.0 + std::sqrt(1.0 - vu);
    r1 = -u * w;
    r2 = -v / w;
  } else {
    const double sqrtd =
        std::sqrt(abs(u)) * std::sqrt(abs(v)) * std::sqrt(1.0 - u / v);
    r1 = -u - sqrtd;
    r2 = -u + sqrtd;
  }
  *out = (z3 * ba > 0.0) ? std::max(r1, r2) : std::min(r1, r2);
  return true;
}

double mt_step_selection(double al, double au, double at, double fl,
                         double fu, double ft, double gl, double gu,
                         double gt) {
  using std::abs;
  if (al == au) return al;
  if (std::isinf(ft) || std::isinf(gt)) return (al + at) / 2.0;
  const double deltal = 1.1, deltau = 0.66;
  double ac;
  const bool ac_exists = mt_cubic(al, at, fl, ft, gl, gt, &ac);
  if (ft > fl) {
    const double aq = mt_quad_fga(al, at, fl, gl, ft);
    if (!ac_exists) return aq;
    return (abs(ac - al) < abs(aq - al)) ? ac : (aq + ac) / 2.0;
  }
  const double as = mt_quad_gg(al, at, gl, gt);
  if (gt * gl < 0.0) return (abs(ac - at) >= abs(as - at)) ? ac : as;
  if (abs(gt) < abs(gl)) {
    double res = (ac_exists && (ac - at) * (at - al) > 0.0 &&
                  abs(ac - at) < abs(as - at))
                     ? ac
                     : as;
    return (at > al) ? std::min(at + deltau * (au - at), res)
                     : std::max(at + deltau * (au - at), res);
  }
  if (std::isinf(au) || std::isinf(fu) || std::isinf(gu))
    return at + deltal * (at - al);
  double ae;
  mt_cubic(at, au, ft, fu, gt, gu, &ae);
  return (at > al) ? std::min(at + deltau * (au - at), ae)
                   : std::max(at + deltau * (au - at), ae);
}

LsResult ls_morethuente(Obj f, void* user, const Params& p, const double* xp,
                        const double* drt, double step_max, double step,
                        double fx, double* x, double* grad, double dg,
                        int n) {
  if (step <= 0.0 || step < p.min_step || step > step_max)
    return {step, fx, dg, kLsInvalidStep, 0};
  const double fx_init = fx, dg_init = dg;
  if (dg_init >= 0.0) return {step, fx, dg, kLsNotDescent, 0};
  const double test_decr = p.ftol * dg_init;
  const double test_curv = -p.wolfe * dg_init;

  double I_lo = 0.0, I_hi = std::numeric_limits<double>::infinity();
  double fI_lo = 0.0, fI_hi = std::numeric_limits<double>::infinity();
  double gI_lo = (1.0 - p.ftol) * dg_init;
  double gI_hi = std::numeric_limits<double>::infinity();
  double psiI_lo = 0.0;
  std::vector<double> x_lo(xp, xp + n), grad_lo(grad, grad + n);
  double fx_lo = fx_init, dg_lo = dg_init;
  bool bracketed = false;
  bool use_sg = p.min_step > 0.0;
  double I_width = std::numeric_limits<double>::infinity();
  double I_width_prev = I_width;
  int shrink_fail = 0;
  const double delta_max = 1.1, delta_min = 7.0 / 12.0, shrink = 0.66;
  int nfev = 0;

  for (int it = 0; it < p.max_linesearch; ++it) {
    for (int i = 0; i < n; ++i) x[i] = xp[i] + step * drt[i];
    fx = f(x, grad, n, user);
    ++nfev;
    dg = dot(grad, drt, n);
    const double psit = fx - fx_init - step * test_decr;
    const double dpsit = dg - test_decr;
    if (psit <= 0.0 && std::abs(dg) <= test_curv)
      return {step, fx, dg, kRunning, nfev};
    if (step <= p.min_step && (psit > 0.0 || dpsit >= 0.0))
      return {step, fx, dg, kRunning, nfev};
    if (step >= step_max && psit <= 0.0 && dpsit < 0.0)
      return {step, fx, dg, kRunning, nfev};

    const double ft = psit, gt = dpsit;
    if (use_sg && psit <= 0.0 && dpsit < 0.0) use_sg = false;

    double new_step;
    const bool in_case_2 = (psit <= psiI_lo) && (dpsit * (I_lo - step) > 0.0);
    if (in_case_2) {
      new_step = std::min(step_max, step + delta_max * (step - I_lo));
    } else {
      double sel = mt_step_selection(I_lo, I_hi, step, fI_lo, fI_hi, ft,
                                     gI_lo, gI_hi, gt);
      if (sel < p.min_step) sel = p.min_step;
      if (sel > step_max) sel = step_max;
      if (use_sg) {
        const double sg_upper = std::max(p.min_step, delta_min * step);
        sel = std::min(std::max(sel, p.min_step), sg_upper);
      }
      new_step = sel;
    }

    const bool case1 = psit > psiI_lo;
    const bool case3 = !case1 && !in_case_2;
    if (case1) {
      I_hi = step;
      fI_hi = ft;
      gI_hi = gt;
    } else if (case3) {
      I_hi = I_lo;
      fI_hi = fI_lo;
      gI_hi = gI_lo;
    }
    if (!case1) {
      I_lo = step;
      fI_lo = ft;
      gI_lo = gt;
      psiI_lo = psit;
      std::memcpy(x_lo.data(), x, sizeof(double) * n);
      std::memcpy(grad_lo.data(), grad, sizeof(double) * n);
      fx_lo = fx;
      dg_lo = dg;
    }

    const double i_left = std::min(I_lo, I_hi);
    const double i_right = std::max(I_lo, I_hi);
    if (!bracketed && !in_case_2 && i_left >= p.min_step &&
        i_right <= step_max)
      bracketed = true;
    if (bracketed) {
      I_width_prev = I_width;
      I_width = std::abs(I_hi - I_lo);
      if (std::isfinite(I_width_prev) && I_width > shrink * I_width_prev)
        ++shrink_fail;
      else
        shrink_fail = 0;
      if (shrink_fail >= 2) {
        new_step = (I_lo + I_hi) / 2.0;
        shrink_fail = 0;
      }
    }
    step = new_step;
  }
  // Exhausted: restore the best-so-far (lo) state.
  std::memcpy(x, x_lo.data(), sizeof(double) * n);
  std::memcpy(grad, grad_lo.data(), sizeof(double) * n);
  return {I_lo, fx_lo, dg_lo, kRunning, nfev};
}

LsResult run_linesearch(int which, Obj f, void* user, const Params& p,
                        const double* xp, const double* drt, double step_max,
                        double step, double fx, double* x, double* grad,
                        double dg, int n) {
  switch (which) {
    case 0: return ls_backtracking(f, user, p, xp, drt, step_max, step, fx,
                                   x, grad, dg, n);
    case 1: return ls_bracketing(f, user, p, xp, drt, step_max, step, fx, x,
                                 grad, dg, n);
    case 3: return ls_morethuente(f, user, p, xp, drt, step_max, step, fx, x,
                                  grad, dg, n);
    case 2:
    default: return ls_nocedalwright(f, user, p, xp, drt, step_max, step, fx,
                                     x, grad, dg, n);
  }
}

// ---------------------------------------------------------------------------
// Built-in objectives (callback-free benchmarking; ids match native.py).
// ---------------------------------------------------------------------------

double obj_rosenbrock(const double* x, double* grad, int n, void*) {
  double fx = 0.0;
  for (int i = 0; i < n; i += 2) {
    const double t1 = 1.0 - x[i];
    const double t2 = 10.0 * (x[i + 1] - x[i] * x[i]);
    grad[i + 1] = 20.0 * t2;
    grad[i] = -2.0 * (x[i] * grad[i + 1] + t1);
    fx += t1 * t1 + t2 * t2;
  }
  return fx;
}

double obj_quadratic(const double* x, double* grad, int n, void*) {
  double fx = 0.0;
  for (int i = 0; i < n; ++i) {
    const double r = x[i] - i;
    grad[i] = 2.0 * r;
    fx += r * r;
  }
  return fx;
}

}  // namespace

extern "C" {

// Builtin objectives exposed to the companion translation units.
double lbfgspp_builtin_objective(int id, const double* x, double* grad,
                                 int n) {
  if (id == 0) return obj_rosenbrock(x, grad, n, nullptr);
  return obj_quadratic(x, grad, n, nullptr);
}

// The More-Thuente search exposed with C linkage for lbfgsb.cpp.
// Returns the status; step/fx/dg/nfev through out-params; x/grad updated
// in place.
int lbfgspp_native_morethuente_c(Obj f, void* user, int max_linesearch,
                                 double min_step, double ftol, double wolfe,
                                 const double* xp, const double* drt,
                                 double step_max, double step_in,
                                 double fx_in, double* x, double* grad,
                                 double dg_in, int n, double* out_step,
                                 double* out_fx, double* out_dg,
                                 int* out_nfev) {
  Params p{};
  p.max_linesearch = max_linesearch;
  p.min_step = min_step;
  p.max_step = 1e20;
  p.ftol = ftol;
  p.wolfe = wolfe;
  LsResult r = ls_morethuente(f, user, p, xp, drt, step_max, step_in, fx_in,
                              x, grad, dg_in, n);
  *out_step = r.step;
  *out_fx = r.fx;
  *out_dg = r.dg;
  *out_nfev = r.nfev;
  return r.status;
}

// Full L-BFGS solve (LBFGS.h:79-173 semantics).
//   f/user: objective callback (ignored if builtin_id >= 0)
//   builtin_id: -1 = use callback, 0 = rosenbrock, 1 = quadratic
//   ls_kind: 0 backtracking, 1 bracketing, 2 nocedalwright, 3 morethuente
//   x: in/out iterate [n]; out_fx/out_gnorm/out_niter/out_nfev: outputs
// Returns a Status code.
int lbfgspp_native_minimize(Obj f, void* user, int builtin_id, int n,
                            double* x, const Params* pp, int ls_kind,
                            double* out_fx, double* out_gnorm,
                            int* out_niter, int* out_nfev) {
  const Params& p = *pp;
  if (builtin_id == 0) f = obj_rosenbrock;
  if (builtin_id == 1) f = obj_quadratic;

  History hist(n, p.m);
  std::vector<double> grad(n), xp(n), gradp(n), drt(n), vs(n), vy(n);
  std::vector<double> fx_ring(std::max(p.past, 1), 0.0);
  const double eps_machine = std::numeric_limits<double>::epsilon();

  double fx = f(x, grad.data(), n, user);
  int nfev = 1;
  double gnorm = nrm2(grad.data(), n);
  if (p.past > 0) fx_ring[0] = fx;

  int k = 1;
  int status = kRunning;
  if (gnorm <= p.epsilon || gnorm <= p.epsilon_rel * nrm2(x, n)) {
    status = kConvergedGrad;
  } else {
    for (int i = 0; i < n; ++i) drt[i] = -grad[i];
    double step = 1.0 / nrm2(drt.data(), n);

    for (;;) {
      std::memcpy(xp.data(), x, sizeof(double) * n);
      std::memcpy(gradp.data(), grad.data(), sizeof(double) * n);
      double dg = dot(grad.data(), drt.data(), n);

      LsResult ls = run_linesearch(ls_kind, f, user, p, xp.data(),
                                   drt.data(), p.max_step, step, fx, x,
                                   grad.data(), dg, n);
      nfev += ls.nfev;
      fx = ls.fx;
      gnorm = nrm2(grad.data(), n);
      if (ls.status != kRunning) {
        status = ls.status;
        break;
      }
      if (gnorm <= p.epsilon || gnorm <= p.epsilon_rel * nrm2(x, n)) {
        status = kConvergedGrad;
        break;
      }
      if (p.past > 0) {
        const double fxd = fx_ring[k % p.past];
        if (k >= p.past &&
            std::abs(fxd - fx) <=
                p.delta * std::max(std::max(std::abs(fx), std::abs(fxd)),
                                   1.0)) {
          status = kConvergedDelta;
          break;
        }
        fx_ring[k % p.past] = fx;
      }
      if (p.max_iterations != 0 && k >= p.max_iterations) {
        status = kMaxIterations;
        break;
      }

      for (int i = 0; i < n; ++i) {
        vs[i] = x[i] - xp[i];
        vy[i] = grad[i] - gradp[i];
      }
      if (dot(vs.data(), vy.data(), n) >
          eps_machine * dot(vy.data(), vy.data(), n))
        hist.add(vs.data(), vy.data());

      hist.apply_hv(grad.data(), -1.0, drt.data());
      step = 1.0;
      ++k;
    }
  }

  *out_fx = fx;
  *out_gnorm = gnorm;
  *out_niter = k;
  *out_nfev = nfev;
  return status;
}

}  // extern "C"
