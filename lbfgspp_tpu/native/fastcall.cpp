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

static PyMethodDef Methods[] = {
    {"minimize", fast_minimize, METH_VARARGS,
     "minimize(builtin_id, x, params_addr, ls) -> "
     "(status, fx, gnorm, niter, nfev); x solved in place"},
    {"minimize_b", fast_minimize_b, METH_VARARGS,
     "minimize_b(builtin_id, x, lb, ub, params_addr) -> "
     "(status, fx, pgnorm, niter, nfev); x solved in place"},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef Module = {
    PyModuleDef_HEAD_INIT, "_lbfgspp_fastcall",
    "C-API fast path for lbfgspp_tpu.native", -1, Methods};

PyMODINIT_FUNC PyInit__lbfgspp_fastcall(void)
{
    return PyModule_Create(&Module);
}
