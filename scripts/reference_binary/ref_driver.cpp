// Driver that compiles the ACTUAL reference library
// (/root/reference/include, yixuan/LBFGSpp) against the Eigen bundled
// with this image's tensorflow wheel, and dumps its ground-truth
// behavior as JSON for tests/test_reference_binary.py to diff against
// the JAX solvers.  This is verification harness code only: it calls
// the reference as a black box (the reference sources stay on their
// read-only mount and are never vendored into this repo).
//
// Build/run: scripts/reference_binary/run.sh
#include <Eigen/Core>
#include <LBFGS.h>
#include <LBFGSB.h>
#include <cstdio>
#include <stdexcept>
#include <string>

using Eigen::VectorXd;

// README.md:74-87 pairwise Rosenbrock (even/odd pairs)
static double rosen(const VectorXd& x, VectorXd& grad)
{
    const long n = x.size();
    double fx = 0.0;
    for (long i = 0; i < n; i += 2) {
        const double t1 = 1.0 - x[i];
        const double t2 = 10 * (x[i + 1] - x[i] * x[i]);
        grad[i + 1] = 20 * t2;
        grad[i]     = -2.0 * (x[i] * grad[i + 1] + t1);
        fx += t1 * t1 + t2 * t2;
    }
    return fx;
}

// examples/example-rosenbrock-box.cpp:12-34 roptim-style chained
// Rosenbrock: f = (x0-1)^2 + sum_i 4 (x_i - x_{i-1}^2)^2
static double rosen_chained(const VectorXd& x, VectorXd& grad)
{
    const long n = x.size();
    double fx = (x[0] - 1.0) * (x[0] - 1.0);
    grad[0] = 2 * (x[0] - 1) + 16 * (x[0] * x[0] - x[1]) * x[0];
    for (long i = 1; i < n; i++) {
        fx += 4 * std::pow(x[i] - x[i - 1] * x[i - 1], 2);
        if (i == n - 1)
            grad[i] = 8 * (x[i] - x[i - 1] * x[i - 1]);
        else
            grad[i] = 8 * (x[i] - x[i - 1] * x[i - 1]) +
                      16 * (x[i] * x[i] - x[i + 1]) * x[i];
    }
    return fx;
}

template <template <class> class LS>
static long run_lbfgs(int n, double eps, double eps_rel, int max_iter,
                      int cap, double* fx_out, double* gnorm_out,
                      VectorXd* x_out)
{
    LBFGSpp::LBFGSParam<double> param;
    param.epsilon = eps;
    param.epsilon_rel = eps_rel;
    param.max_iterations = cap > 0 ? cap : max_iter;
    LBFGSpp::LBFGSSolver<double, LS> solver(param);
    VectorXd x = VectorXd::Zero(n);
    double fx;
    long nit = solver.minimize(rosen, x, fx);
    *fx_out = fx;
    *gnorm_out = solver.final_grad().norm();
    if (x_out) *x_out = x;
    return nit;
}

int main()
{
    std::printf("{\n");

    // --- README.md:88-94 anchor: n=10, eps=1e-6, max_iter=100 ---
    double fx, gn;
    long nit = run_lbfgs<LBFGSpp::LineSearchNocedalWright>(
        10, 1e-6, 1e-5, 100, 0, &fx, &gn, nullptr);
    std::printf("  \"anchor_default_epsrel\": {\"niter\": %ld, \"fx\": %.17e, \"gnorm\": %.17e},\n",
                nit, fx, gn);

    nit = run_lbfgs<LBFGSpp::LineSearchNocedalWright>(
        10, 1e-6, 0.0, 100, 0, &fx, &gn, nullptr);
    std::printf("  \"anchor_epsrel0\": {\"niter\": %ld, \"fx\": %.17e, \"gnorm\": %.17e},\n",
                nit, fx, gn);

    // --- per-iteration trajectory via the iteration cap (k=1..24):
    // minimize with max_iterations=k returns the k-th iterate ---
    std::printf("  \"anchor_trajectory\": [");
    for (int k = 1; k <= 24; k++) {
        VectorXd xk;
        long nk = run_lbfgs<LBFGSpp::LineSearchNocedalWright>(
            10, 1e-6, 1e-5, 100, k, &fx, &gn, &xk);
        std::printf("%s{\"k\": %d, \"niter\": %ld, \"fx\": %.17e, \"gnorm\": %.17e}",
                    k == 1 ? "" : ", ", k, nk, fx, gn);
        if (nk < k) break;   // converged before the cap: trail complete
    }
    std::printf("],\n");

    // --- all four line searches on the anchor config ---
    std::printf("  \"anchor_per_linesearch\": {");
    nit = run_lbfgs<LBFGSpp::LineSearchNocedalWright>(10, 1e-6, 1e-5, 100, 0, &fx, &gn, nullptr);
    std::printf("\"nocedalwright\": {\"niter\": %ld, \"fx\": %.17e}", nit, fx);
    nit = run_lbfgs<LBFGSpp::LineSearchMoreThuente>(10, 1e-6, 1e-5, 100, 0, &fx, &gn, nullptr);
    std::printf(", \"morethuente\": {\"niter\": %ld, \"fx\": %.17e}", nit, fx);
    nit = run_lbfgs<LBFGSpp::LineSearchBacktracking>(10, 1e-6, 1e-5, 100, 0, &fx, &gn, nullptr);
    std::printf(", \"backtracking\": {\"niter\": %ld, \"fx\": %.17e}", nit, fx);
    nit = run_lbfgs<LBFGSpp::LineSearchBracketing>(10, 1e-6, 1e-5, 100, 0, &fx, &gn, nullptr);
    std::printf(", \"bracketing\": {\"niter\": %ld, \"fx\": %.17e}", nit, fx);
    std::printf("},\n");

    // --- examples/example-rosenbrock-box.cpp: n=25, lb=2, ub=4,
    //     x[2] unbounded, mixed boundary starts ---
    {
        const int n = 25;
        LBFGSpp::LBFGSBParam<double> param;   // all defaults, as the example
        LBFGSpp::LBFGSBSolver<double> solver(param);
        VectorXd lb = VectorXd::Constant(n, 2.0);
        VectorXd ub = VectorXd::Constant(n, 4.0);
        lb[2] = -std::numeric_limits<double>::infinity();
        ub[2] = std::numeric_limits<double>::infinity();
        VectorXd x = VectorXd::Constant(n, 3.0);
        x[0] = x[1] = 2.0;
        x[5] = x[7] = 4.0;
        double bfx;
        long bnit = solver.minimize(rosen_chained, x, bfx, lb, ub);
        std::printf("  \"box_example\": {\"niter\": %ld, \"fx\": %.17e, \"proj_gnorm\": %.17e, \"x2\": %.17e},\n",
                    bnit, bfx, solver.final_grad_norm(), x[2]);
    }

    // --- multistart sweep, exactly example-rosenbrock-bracketing.cpp
    // :36-57: ALL-DEFAULT LBFGSParam (epsilon=1e-5, epsilon_rel=1e-5,
    // max_iterations=0 i.e. unlimited), VectorXd::Random (U[-1,1],
    // std::rand with its default seed 1), 1024 starts, n=2..16 step 2;
    // the example throws if any run misses max|x-1| <= 1e-4 ---
    {
        std::printf("  \"multistart\": [");
        bool first = true;
        std::srand(1);
        for (int n = 2; n <= 16; n += 2) {
            LBFGSpp::LBFGSParam<double> param;
            LBFGSpp::LBFGSSolver<double, LBFGSpp::LineSearchBracketing>
                solver(param);
            long total_iter = 0;
            double worst = 0.0;
            for (int rep = 0; rep < 1024; rep++) {
                VectorXd x = VectorXd::Random(n);
                double mfx;
                total_iter += solver.minimize(rosen, x, mfx);
                worst = std::max(worst, (x.array() - 1.0).abs().maxCoeff());
            }
            std::printf("%s{\"n\": %d, \"avg_iter\": %.4f, \"worst_err\": %.3e}",
                        first ? "" : ", ", n, total_iter / 1024.0, worst);
            first = false;
        }
        std::printf("]\n");
    }

    std::printf("}\n");
    return 0;
}
