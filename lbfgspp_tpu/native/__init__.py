"""Native CPU solver bindings (ctypes).

The latency-path complement to the JAX solvers: for single small problems
the XLA dispatch overhead (~0.1-1 ms per launch) dwarfs the solve, so this
module compiles ``core.cpp`` once (g++, cached next to the source) and
drives it through ctypes at microsecond scale — the reference library's
own deployment profile.

* Objectives can be Python callables (bridged through a ctypes callback,
  ~1 us/call) or one of the zero-overhead builtins (``"rosenbrock"``,
  ``"quadratic"``).
* Parameters, status codes, and result fields mirror the JAX API
  (:class:`lbfgspp_tpu.LBFGSParams`, :class:`lbfgspp_tpu.Status`).
* Everything degrades gracefully: :func:`available` is False when no C++
  toolchain exists, and callers should fall back to the JAX path.
"""

from __future__ import annotations

import contextlib
import ctypes
import functools
import os
import subprocess
import sysconfig
import threading
from typing import Callable, NamedTuple, Optional, Union

import numpy as np

from ..params import LBFGSParams

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "core.cpp")
_SRC_B = os.path.join(_HERE, "lbfgsb.cpp")
_SRC_FAST = os.path.join(_HERE, "fastcall.cpp")
_LIB = os.path.join(_HERE, "libnative.so")
# The extension filename carries the interpreter's ABI tag
# (e.g. ``.cpython-312-x86_64-linux-gnu.so``) so a cached build from one
# Python never gets loaded into another (ImportError/segfault territory).
_LIB_FAST = os.path.join(
    _HERE, "_lbfgspp_fastcall"
    + (sysconfig.get_config_var("EXT_SUFFIX") or ".so"))

_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None
_fast = None
_fast_tried = False
_fast_error: Optional[str] = None

BUILTIN_OBJECTIVES = {"rosenbrock": 0, "quadratic": 1}

_OBJ_CB = ctypes.CFUNCTYPE(
    ctypes.c_double, ctypes.POINTER(ctypes.c_double),
    ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_void_p)

LS_KINDS = {"backtracking": 0, "bracketing": 1, "nocedalwright": 2,
            "morethuente": 3}


class _CParams(ctypes.Structure):
    _fields_ = [
        ("m", ctypes.c_int),
        ("epsilon", ctypes.c_double),
        ("epsilon_rel", ctypes.c_double),
        ("past", ctypes.c_int),
        ("delta", ctypes.c_double),
        ("max_iterations", ctypes.c_int),
        ("linesearch", ctypes.c_int),
        ("max_linesearch", ctypes.c_int),
        ("min_step", ctypes.c_double),
        ("max_step", ctypes.c_double),
        ("ftol", ctypes.c_double),
        ("wolfe", ctypes.c_double),
    ]


class NativeResult(NamedTuple):
    x: np.ndarray
    fx: float
    gnorm: float
    niter: int
    nfev: int
    status: int


def _build() -> Optional[str]:
    """Compile the native sources -> libnative.so; error string or None."""
    # PID-unique scratch name: concurrent builders (pytest-xdist workers
    # all seeing a stale .so) must not share a tmp file, or one process's
    # atomic rename deletes the file another is about to rename.
    tmp = _LIB + f".tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, _SRC_B, "-o", tmp]
    try:
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=120)
        except (OSError, subprocess.TimeoutExpired) as e:  # no g++ / hang
            return f"native build failed to run: {e}"
        if proc.returncode != 0:
            return f"native build failed:\n{proc.stderr[-2000:]}"
        os.replace(tmp, _LIB)
        return None
    finally:
        # Failure paths must not strand the PID-unique scratch file —
        # they accumulate across pytest-xdist workers otherwise.
        with contextlib.suppress(FileNotFoundError):
            os.unlink(tmp)


class _CParamsB(ctypes.Structure):
    _fields_ = [
        ("m", ctypes.c_int),
        ("epsilon", ctypes.c_double),
        ("epsilon_rel", ctypes.c_double),
        ("past", ctypes.c_int),
        ("delta", ctypes.c_double),
        ("max_iterations", ctypes.c_int),
        ("max_submin", ctypes.c_int),
        ("max_linesearch", ctypes.c_int),
        ("min_step", ctypes.c_double),
        ("max_step", ctypes.c_double),
        ("ftol", ctypes.c_double),
        ("wolfe", ctypes.c_double),
    ]


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        newest_src = max(os.path.getmtime(_SRC), os.path.getmtime(_SRC_B))
        if not os.path.exists(_LIB) or \
                os.path.getmtime(_LIB) < newest_src:
            _build_error = _build()
            if _build_error is not None:
                return None
        lib = ctypes.CDLL(_LIB)
        fn = lib.lbfgspp_native_minimize
        fn.restype = ctypes.c_int
        # Pointer args are declared c_void_p and passed as integer
        # addresses: per-call POINTER()/data_as conversions cost ~10 us,
        # half the latency budget of a small solve.
        fn.argtypes = [
            _OBJ_CB, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        fnb = lib.lbfgspp_native_minimize_b
        fnb.restype = ctypes.c_int
        fnb.argtypes = [
            _OBJ_CB, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def _load_fast():
    """Build/import the CPython C-extension fast path (fastcall.cpp);
    returns the module or None (ctypes remains the fallback).  The
    outcome — success OR failure — is memoized, so a host without the
    toolchain/headers pays the build attempt exactly once; the failure
    diagnostic is kept in :func:`fast_error`."""
    global _fast, _fast_tried, _fast_error
    if _fast_tried:            # lock-free fast path (set-once flag)
        return _fast
    with _lock:
        if _fast_tried:
            return _fast
        try:
            import importlib.util
            newest = max(os.path.getmtime(s)
                         for s in (_SRC, _SRC_B, _SRC_FAST))
            if (not os.path.exists(_LIB_FAST) or
                    os.path.getmtime(_LIB_FAST) < newest):
                inc = sysconfig.get_paths()["include"]
                tmp = _LIB_FAST + f".tmp.{os.getpid()}"  # see _build()
                cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                       "-std=c++17", f"-I{inc}", _SRC_FAST, _SRC, _SRC_B,
                       "-o", tmp]
                try:
                    proc = subprocess.run(cmd, capture_output=True,
                                          text=True, timeout=120)
                    if proc.returncode != 0:
                        _fast_error = ("fastcall build failed:\n"
                                       + proc.stderr[-2000:])
                        _fast = None
                    else:
                        os.replace(tmp, _LIB_FAST)
                finally:
                    # see _build(): never strand the scratch file
                    with contextlib.suppress(FileNotFoundError):
                        os.unlink(tmp)
            if _fast_error is None:
                spec = importlib.util.spec_from_file_location(
                    "_lbfgspp_fastcall", _LIB_FAST)
                mod = importlib.util.module_from_spec(spec)
                spec.loader.exec_module(mod)
                _fast = mod
        except Exception as e:  # any toolchain/ABI issue: ctypes fallback
            _fast = None
            _fast_error = f"fastcall build/import failed: {e!r}"
        _fast_tried = True     # set AFTER _fast, for lock-free readers
        return _fast


def fast_error() -> Optional[str]:
    """Diagnostic from a failed C-extension build/import (None if the
    fast path loaded, or was never attempted)."""
    return _fast_error


def available() -> bool:
    """True when the native core is built (or buildable) on this host."""
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


_NULL_CB = _OBJ_CB()


@functools.lru_cache(maxsize=64)
def _cparams_b_cached(params) -> "_CParamsB":
    return _CParamsB(m=params.m, epsilon=params.epsilon,
                     epsilon_rel=params.epsilon_rel, past=params.past,
                     delta=params.delta,
                     max_iterations=params.max_iterations,
                     max_submin=params.max_submin,
                     max_linesearch=params.max_linesearch,
                     min_step=params.min_step, max_step=params.max_step,
                     ftol=params.ftol, wolfe=params.wolfe)


@functools.lru_cache(maxsize=64)
def _cparams_cached(params: LBFGSParams) -> "_CParams":
    """ctypes struct construction costs ~10 us — cache it per (frozen,
    hashable) params object so repeated small solves pay it once."""
    return _CParams(m=params.m, epsilon=params.epsilon,
                    epsilon_rel=params.epsilon_rel, past=params.past,
                    delta=params.delta,
                    max_iterations=params.max_iterations,
                    linesearch=params.linesearch,
                    max_linesearch=params.max_linesearch,
                    min_step=params.min_step, max_step=params.max_step,
                    ftol=params.ftol, wolfe=params.wolfe)


def minimize(fun: Union[str, Callable],
             x0,
             params: LBFGSParams = LBFGSParams(),
             line_search: str = "nocedalwright") -> NativeResult:
    """Native L-BFGS solve.

    ``fun`` is either a builtin name (:data:`BUILTIN_OBJECTIVES`) or a
    callable ``f(x: np.ndarray) -> (fx, grad)``.  Semantics mirror
    :func:`lbfgspp_tpu.minimize` (same defaults, status codes and
    iteration counts — trajectory-tested against the NumPy oracle).
    """
    # Always copy: the C core updates x in place and must not mutate the
    # caller's array.
    x = np.array(x0, dtype=np.float64, copy=True, order="C")
    n = x.shape[0]

    cp = _cparams_cached(params)

    if isinstance(fun, str):
        builtin_id = BUILTIN_OBJECTIVES[fun]
        fast = _load_fast()
        if fast is not None:
            status, fx, gnorm, niter, nfev = fast.minimize(
                builtin_id, x, ctypes.addressof(cp),
                LS_KINDS[line_search])
            return NativeResult(x=x, fx=fx, gnorm=gnorm, niter=niter,
                                nfev=nfev, status=status)

    lib = _load()
    if lib is None:
        raise RuntimeError(f"native core unavailable: {_build_error}")

    if isinstance(fun, str):
        cb = _NULL_CB
    else:
        builtin_id = -1

        def _bridge(xp, gp, nn, _user):
            xa = np.ctypeslib.as_array(xp, shape=(nn,))
            fx, grad = fun(xa.copy())
            ga = np.ctypeslib.as_array(gp, shape=(nn,))
            ga[:] = np.asarray(grad, dtype=np.float64)
            return float(fx)

        cb = _OBJ_CB(_bridge)

    outd = (ctypes.c_double * 2)()          # fx, gnorm
    outi = (ctypes.c_int * 2)()             # niter, nfev
    oda = ctypes.addressof(outd)
    oia = ctypes.addressof(outi)
    status = lib.lbfgspp_native_minimize(
        cb, None, builtin_id, n,
        x.ctypes.data, ctypes.addressof(cp), LS_KINDS[line_search],
        oda, oda + 8, oia, oia + 4)

    return NativeResult(x=x, fx=outd[0], gnorm=outd[1],
                        niter=outi[0], nfev=outi[1],
                        status=status)


def minimize_b(fun: Union[str, Callable],
               x0,
               lb,
               ub,
               params=None) -> NativeResult:
    """Native L-BFGS-B solve over the box ``[lb, ub]``.

    Semantics mirror :func:`lbfgspp_tpu.minimize_b` (Moré-Thuente search,
    same defaults/status codes); ``gnorm`` in the result is the projected-
    gradient infinity norm.  ``lb``/``ub`` entries may be ``+/-inf``;
    ``lb[i] == ub[i]`` pins a variable.
    """
    from ..params import LBFGSBParams

    if params is None:
        params = LBFGSBParams()

    x = np.array(x0, dtype=np.float64, copy=True, order="C")
    n = x.shape[0]
    lb = np.ascontiguousarray(np.broadcast_to(
        np.asarray(lb, np.float64), x.shape))
    ub = np.ascontiguousarray(np.broadcast_to(
        np.asarray(ub, np.float64), x.shape))

    cp = _cparams_b_cached(params)

    # Try the C-extension fast path first (like minimize): builtins never
    # need the ctypes lib, so don't force its build/load to succeed.
    if isinstance(fun, str):
        builtin_id = BUILTIN_OBJECTIVES[fun]
        fast = _load_fast()
        if fast is not None:
            status, fx, pg, niter, nfev = fast.minimize_b(
                builtin_id, x, lb, ub, ctypes.addressof(cp))
            return NativeResult(x=x, fx=fx, gnorm=pg, niter=niter,
                                nfev=nfev, status=status)

    lib = _load()
    if lib is None:
        raise RuntimeError(f"native core unavailable: {_build_error}")

    if isinstance(fun, str):
        cb = _NULL_CB
    else:
        builtin_id = -1

        def _bridge(xp, gp, nn, _user):
            xa = np.ctypeslib.as_array(xp, shape=(nn,))
            fx, grad = fun(xa.copy())
            ga = np.ctypeslib.as_array(gp, shape=(nn,))
            ga[:] = np.asarray(grad, dtype=np.float64)
            return float(fx)

        cb = _OBJ_CB(_bridge)

    outd = (ctypes.c_double * 2)()          # fx, projected gnorm
    outi = (ctypes.c_int * 2)()             # niter, nfev
    oda = ctypes.addressof(outd)
    oia = ctypes.addressof(outi)
    status = lib.lbfgspp_native_minimize_b(
        cb, None, builtin_id, n,
        x.ctypes.data, lb.ctypes.data, ub.ctypes.data,
        ctypes.addressof(cp),
        oda, oda + 8, oia, oia + 4)

    return NativeResult(x=x, fx=outd[0], gnorm=outd[1],
                        niter=outi[0], nfev=outi[1],
                        status=status)


class NativeBatchResult(NamedTuple):
    x: np.ndarray        # [B, n] solutions
    fx: np.ndarray       # [B]
    niter: np.ndarray    # [B]
    nfev: np.ndarray     # [B]
    status: np.ndarray   # [B]


def minimize_batch(fun: str,
                   x0s,
                   params: LBFGSParams = LBFGSParams(),
                   line_search: str = "nocedalwright",
                   threads: Optional[int] = None) -> NativeBatchResult:
    """Threaded CPU multistart batch over builtin objectives.

    The reference's multistart examples loop their 1024 starts
    sequentially on one core (example-rosenbrock-bracketing.cpp:44);
    the C core is reentrant, so this fans the independent solves out
    over ``threads`` OS threads (default: all cores) with the GIL
    released.  The TPU path (`lbfgspp_tpu.minimize_batched`) is the
    production batch engine; this is the CPU fallback/latency
    complement for builtin objectives (Python callbacks would
    serialize on the GIL).
    """
    if not isinstance(fun, str):
        raise TypeError("minimize_batch supports builtin objectives "
                        "only (Python callbacks serialize on the GIL); "
                        "use lbfgspp_tpu.minimize_batched instead")
    fast = _load_fast()
    if fast is None:
        raise RuntimeError(
            f"native C extension unavailable: {_fast_error}")
    builtin_id = BUILTIN_OBJECTIVES[fun]
    xs = np.array(x0s, dtype=np.float64, copy=True, order="C")
    if xs.ndim != 2:
        raise ValueError("x0s must be [batch, n]")
    b = xs.shape[0]
    cp = _cparams_cached(params)
    fx = np.empty(b, np.float64)
    niter = np.empty(b, np.int32)
    nfev = np.empty(b, np.int32)
    status = np.empty(b, np.int32)
    fast.minimize_batch(builtin_id, xs, b, ctypes.addressof(cp),
                        LS_KINDS[line_search], fx, niter, nfev, status,
                        -1 if threads is None else int(threads))
    return NativeBatchResult(x=xs, fx=fx, niter=niter, nfev=nfev,
                             status=status)
