"""Native (C++) runtime loader.

Compiles ``src/nnest_runtime.cpp`` on demand into a shared library and binds
it via ctypes. All entry points have pure-numpy fallbacks (utils/evaluation,
numpy savetxt), so the framework works without a compiler; with one, the
host-side hot paths (chain file writing, chain diagnostics) run natively.

Public surface:
  available() -> bool
  write_chain(path, weights, logl, samples, derived=None, min_weight=1e-30,
              header='') -> bool (False means: use the fallback)
  ess(x, mu, var) -> np.ndarray | None
  acceptance_rate(x) -> float | None
  mean_jump(x) -> float | None
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), 'src', 'nnest_runtime.cpp')
_SO = os.path.join(os.path.dirname(__file__), 'libnnest_runtime.so')
_STAMP = _SO + '.sha256'


def _src_hash():
    with open(_SRC, 'rb') as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build(src_hash):
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-o', _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    with open(_STAMP, 'w') as f:
        f.write(src_hash)


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        try:
            # Content-hash staleness check: the binary is only trusted if it
            # was built from the current source *on this machine* (the stamp
            # file is written post-build and never checked in, so a binary
            # from a different machine/ABI is always rebuilt).
            src_hash = _src_hash()
            stamp = ''
            if os.path.exists(_STAMP):
                with open(_STAMP) as f:
                    stamp = f.read().strip()
            if not os.path.exists(_SO) or stamp != src_hash:
                _build(src_hash)
            lib = ctypes.CDLL(_SO)
        except Exception:
            _LIB = None
            return None

        dptr = ctypes.POINTER(ctypes.c_double)
        lib.write_chain.restype = ctypes.c_int
        lib.write_chain.argtypes = [
            ctypes.c_char_p, dptr, dptr, dptr, dptr,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_char_p]
        lib.ess_autocorr.restype = None
        lib.ess_autocorr.argtypes = [
            dptr, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            dptr, dptr, dptr]
        lib.acceptance_rate.restype = ctypes.c_double
        lib.acceptance_rate.argtypes = [
            dptr, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        lib.mean_jump.restype = ctypes.c_double
        lib.mean_jump.argtypes = [
            dptr, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        _LIB = lib
        return _LIB


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _c(a):
    return np.ascontiguousarray(np.asarray(a, dtype=np.float64))


def available() -> bool:
    return _load() is not None


def write_chain(path, weights, logl, samples, derived=None,
                min_weight=1e-30, header='') -> bool:
    lib = _load()
    if lib is None:
        return False
    weights, logl, samples = _c(weights), _c(logl), _c(samples)
    n, d = samples.shape
    if derived is not None and np.size(derived) > 0:
        derived = _c(derived)
        nd = derived.shape[1]
        dp = _ptr(derived)
    else:
        nd, dp = 0, None
    rc = lib.write_chain(path.encode(), _ptr(weights), _ptr(logl),
                         _ptr(samples), dp, n, d, nd, float(min_weight),
                         header.encode())
    return rc == 0


def ess(x, mu, var):
    lib = _load()
    if lib is None:
        return None
    x, mu, var = _c(x), _c(mu), _c(var)
    b, t, d = x.shape
    out = np.empty(d, dtype=np.float64)
    lib.ess_autocorr(_ptr(x), b, t, d, _ptr(mu), _ptr(var), _ptr(out))
    return out


def acceptance_rate(x):
    lib = _load()
    if lib is None:
        return None
    x = _c(x)
    b, t, d = x.shape
    return float(lib.acceptance_rate(_ptr(x), b, t, d))


def mean_jump(x):
    lib = _load()
    if lib is None:
        return None
    x = _c(x)
    b, t, d = x.shape
    return float(lib.mean_jump(_ptr(x), b, t, d))
