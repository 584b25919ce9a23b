// CPython C-extension fast path for the native core.
//
// The ctypes FFI costs ~12-20 us per call (argument marshalling +
// per-call pointer conversions) — more than a whole small solve in the
// C++ core (~11 us for the README Rosenbrock n=10 anchor, which the
// reference's own Eigen binary solves in ~10 us; see PERF.md "Latency
// path").  This module binds the same two C entry points through the
// CPython C API instead, for ~1 us of call overhead.  Builtin
// objectives only: Python-callback objectives stay on the ctypes path,
// where the callback cost dominates anyway.
//
// Compiled together with core.cpp/lbfgsb.cpp by native.__init__._build
// (self-building, like libnative.so).  The params argument is the
// *address* of the already-cached ctypes Params struct — layout is
// defined once in __init__.py and never re-parsed here.
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <cstdint>

typedef double (*Obj)(const double*, double*, int, void*);
extern "C" int lbfgspp_native_minimize(
    Obj, void*, int, int, double*, const void*, int,
    double*, double*, int*, int*);
extern "C" int lbfgspp_native_minimize_b(
    Obj, void*, int, int, double*, const double*, const double*,
    const void*, double*, double*, int*, int*);

static PyObject* fast_minimize(PyObject*, PyObject* args)
{
    int builtin_id, ls;
    Py_buffer xb;
    unsigned long long paddr;
    if (!PyArg_ParseTuple(args, "iw*Ki", &builtin_id, &xb, &paddr, &ls))
        return NULL;
    int n = (int)(xb.len / (Py_ssize_t)sizeof(double));
    double fx = 0.0, gn = 0.0;
    int nit = 0, nfev = 0, status;
    Py_BEGIN_ALLOW_THREADS
    status = lbfgspp_native_minimize(
        NULL, NULL, builtin_id, n, (double*)xb.buf,
        (const void*)(uintptr_t)paddr, ls, &fx, &gn, &nit, &nfev);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&xb);
    return Py_BuildValue("iddii", status, fx, gn, nit, nfev);
}

static PyObject* fast_minimize_b(PyObject*, PyObject* args)
{
    int builtin_id;
    Py_buffer xb, lbb, ubb;
    unsigned long long paddr;
    if (!PyArg_ParseTuple(args, "iw*y*y*K", &builtin_id, &xb, &lbb, &ubb,
                          &paddr))
        return NULL;
    int n = (int)(xb.len / (Py_ssize_t)sizeof(double));
    double fx = 0.0, pg = 0.0;
    int nit = 0, nfev = 0, status;
    Py_BEGIN_ALLOW_THREADS
    status = lbfgspp_native_minimize_b(
        NULL, NULL, builtin_id, n, (double*)xb.buf,
        (const double*)lbb.buf, (const double*)ubb.buf,
        (const void*)(uintptr_t)paddr, &fx, &pg, &nit, &nfev);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&xb);
    PyBuffer_Release(&lbb);
    PyBuffer_Release(&ubb);
    return Py_BuildValue("iddii", status, fx, pg, nit, nfev);
}

// Threaded multistart batch: the reference's examples loop 1024 starts
// sequentially (example-rosenbrock-bracketing.cpp:44); the C core is
// reentrant for builtin objectives (all state is local), so the batch
// fans out over std::thread with an atomic work index.  Outputs are
// caller-allocated writable buffers (no numpy C-API dependency).
#include <atomic>
#include <thread>
#include <vector>

static PyObject* fast_minimize_batch(PyObject*, PyObject* args)
{
    int builtin_id, ls, nthreads;
    Py_buffer xb, fxb, nitb, nfb, stb;
    unsigned long long paddr, batch;
    if (!PyArg_ParseTuple(args, "iw*KKiw*w*w*w*i", &builtin_id, &xb,
                          &batch, &paddr, &ls, &fxb, &nitb, &nfb, &stb,
                          &nthreads))
        return NULL;
    const Py_ssize_t B = (Py_ssize_t)batch;
    if (B <= 0 || xb.len % (B * (Py_ssize_t)sizeof(double)) != 0 ||
        fxb.len < B * (Py_ssize_t)sizeof(double) ||
        nitb.len < B * (Py_ssize_t)sizeof(int) ||
        nfb.len < B * (Py_ssize_t)sizeof(int) ||
        stb.len < B * (Py_ssize_t)sizeof(int)) {
        PyBuffer_Release(&xb); PyBuffer_Release(&fxb);
        PyBuffer_Release(&nitb); PyBuffer_Release(&nfb);
        PyBuffer_Release(&stb);
        PyErr_SetString(PyExc_ValueError, "inconsistent buffer sizes");
        return NULL;
    }
    const int n = (int)(xb.len / (B * (Py_ssize_t)sizeof(double)));
    double* xs = (double*)xb.buf;
    double* fxs = (double*)fxb.buf;
    int* nits = (int*)nitb.buf;
    int* nfs = (int*)nfb.buf;
    int* sts = (int*)stb.buf;
    const void* pa = (const void*)(uintptr_t)paddr;

    Py_BEGIN_ALLOW_THREADS
    std::atomic<Py_ssize_t> idx(0);
    auto work = [&]() {
        double gn;
        for (;;) {
            Py_ssize_t i = idx.fetch_add(1);
            if (i >= B) break;
            sts[i] = lbfgspp_native_minimize(
                NULL, NULL, builtin_id, n, xs + i * n, pa, ls,
                &fxs[i], &gn, &nits[i], &nfs[i]);
        }
    };
    int T = nthreads > 0 ? nthreads
                         : (int)std::thread::hardware_concurrency();
    if (T < 1) T = 1;
    if ((Py_ssize_t)T > B) T = (int)B;
    std::vector<std::thread> pool;
    for (int t = 0; t < T - 1; t++) pool.emplace_back(work);
    work();
    for (auto& th : pool) th.join();
    Py_END_ALLOW_THREADS

    PyBuffer_Release(&xb);
    PyBuffer_Release(&fxb);
    PyBuffer_Release(&nitb);
    PyBuffer_Release(&nfb);
    PyBuffer_Release(&stb);
    Py_RETURN_NONE;
}

static PyMethodDef Methods[] = {
    {"minimize", fast_minimize, METH_VARARGS,
     "minimize(builtin_id, x, params_addr, ls) -> "
     "(status, fx, gnorm, niter, nfev); x solved in place"},
    {"minimize_b", fast_minimize_b, METH_VARARGS,
     "minimize_b(builtin_id, x, lb, ub, params_addr) -> "
     "(status, fx, pgnorm, niter, nfev); x solved in place"},
    {"minimize_batch", fast_minimize_batch, METH_VARARGS,
     "minimize_batch(builtin_id, xs, batch, params_addr, ls, fx_out, "
     "niter_out, nfev_out, status_out, nthreads) -> None; "
     "xs [B*n] solved in place, threaded"},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef Module = {
    PyModuleDef_HEAD_INIT, "_lbfgspp_fastcall",
    "C-API fast path for lbfgspp_tpu.native", -1, Methods};

PyMODINIT_FUNC PyInit__lbfgspp_fastcall(void)
{
    return PyModule_Create(&Module);
}
