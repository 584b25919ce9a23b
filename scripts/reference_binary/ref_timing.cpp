// Timing capture from the ACTUAL reference binary (build arrangement in
// ref_driver.cpp): measures the reference library's own wall-clock on
// the benchmark-shaped workloads so PERF.md can state a measured — not
// inferred — baseline ratio for this framework's numbers.
//
//   1. single-solve latency: Rosenbrock n=10, eps=1e-6 (the README
//      anchor config), averaged over many repeats — the comparison
//      point for the native CPU core's ~35 us and the JAX dispatch
//      floor;
//   2. multistart throughput: 4096 random starts of Rosenbrock n=100,
//      eps=1e-5 f64 defaults, run SEQUENTIALLY as the reference's own
//      examples do (example-rosenbrock-bracketing.cpp:44) — the
//      comparison point for the batched TPU headline.
//
// Build/run: scripts/reference_binary/run.sh
#include <Eigen/Core>
#include <LBFGS.h>
#include <chrono>
#include <cstdio>

using Eigen::VectorXd;

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

int main()
{
    using clock = std::chrono::steady_clock;

    // --- 1. single-solve latency, README anchor config ---
    {
        LBFGSpp::LBFGSParam<double> param;
        param.epsilon = 1e-6;
        param.max_iterations = 100;
        LBFGSpp::LBFGSSolver<double> solver(param);
        const int reps = 20000;
        double sink = 0.0;
        long nit = 0;
        auto t0 = clock::now();
        for (int r = 0; r < reps; r++) {
            VectorXd x = VectorXd::Zero(10);
            double fx;
            nit += solver.minimize(rosen, x, fx);
            sink += fx;
        }
        auto dt = std::chrono::duration<double>(clock::now() - t0).count();
        std::printf("{\n  \"single_n10_us\": %.3f, \"single_n10_niter\": %.2f,\n",
                    1e6 * dt / reps, (double)nit / reps);
        if (sink > 1e300) std::printf("  \"_\": 0,\n");
    }

    // --- 2. sequential multistart throughput, the batched-config shape ---
    {
        LBFGSpp::LBFGSParam<double> param;   // defaults: eps=1e-5
        LBFGSpp::LBFGSSolver<double> solver(param);
        const int n = 100, starts = 4096;
        std::srand(1);
        double sink = 0.0;
        long nit = 0;
        auto t0 = clock::now();
        for (int r = 0; r < starts; r++) {
            VectorXd x = VectorXd::Random(n) * 2.0;   // U[-2, 2]
            double fx;
            nit += solver.minimize(rosen, x, fx);
            sink += fx;
        }
        auto dt = std::chrono::duration<double>(clock::now() - t0).count();
        std::printf("  \"multistart_n100_solves_per_s\": %.2f, "
                    "\"multistart_n100_avg_niter\": %.2f,\n"
                    "  \"multistart_n100_wall_s\": %.3f\n}\n",
                    starts / dt, (double)nit / starts, dt);
        if (sink > 1e300) std::printf("\n");
    }
    return 0;
}
