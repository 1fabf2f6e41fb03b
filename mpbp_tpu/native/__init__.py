"""ctypes loader for the native C++ sparse-setup library (csparse.cpp).

Compiled on demand with g++ (cached next to the source); every entry point has
a pure-numpy fallback so the framework degrades gracefully where no compiler
exists. The native library covers the same roles the reference outsourced to
ilupp/C++ (reference solve.py:250-254): incomplete factorization, triangular
solve scheduling, and SpGEMM — all host-side setup work whose outputs feed the
TPU kernels.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "csparse.cpp")
_SO = os.path.join(_HERE, "_csparse.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", _SRC, "-o", _SO + ".tmp"],
                    check=True, capture_output=True)
                os.replace(_SO + ".tmp", _SO)
            lib = ctypes.CDLL(_SO)
            _configure(lib)
            _lib = lib
        except Exception:
            _lib_failed = True
    return _lib


def _configure(lib):
    i64 = ctypes.c_int64
    pi64 = np.ctypeslib.ndpointer(np.int64, flags="C")
    pi32 = np.ctypeslib.ndpointer(np.int32, flags="C")
    pf64 = np.ctypeslib.ndpointer(np.float64, flags="C")
    lib.level_schedule.restype = i64
    lib.level_schedule.argtypes = [i64, pi64, pi32, ctypes.c_int, pi32]
    lib.ilut.restype = i64
    lib.ilut.argtypes = [i64, pi64, pi32, pf64, i64, ctypes.c_double,
                         pi64, pi32, pf64, pi64, pi32, pf64]
    lib.ilu0.restype = i64
    lib.ilu0.argtypes = [i64, pi64, pi32, pf64,
                         pi64, pi32, pf64, pi64, pi32, pf64]
    lib.spgemm.restype = i64
    lib.spgemm.argtypes = [i64, i64, i64, pi64, pi32, pf64, pi64, pi32, pf64,
                           ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.lower_solve_unit.restype = None
    lib.lower_solve_unit.argtypes = [i64, pi64, pi32, pf64, pf64, pf64]
    lib.upper_solve.restype = None
    lib.upper_solve.argtypes = [i64, pi64, pi32, pf64, pf64, pf64]


def have_native() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# level scheduling
# ---------------------------------------------------------------------------
def level_schedule(indptr, indices, is_upper: bool):
    """Per-row wavefront level for a triangular CSR matrix. Returns
    (levels: (n,) int32, n_levels)."""
    n = len(indptr) - 1
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    lib = _load()
    levels = np.zeros(n, np.int32)
    if lib is not None:
        nlev = lib.level_schedule(n, indptr, indices, int(is_upper), levels)
        return levels, int(nlev)
    # numpy/python fallback
    if not is_upper:
        for r in range(n):
            cs = indices[indptr[r]:indptr[r + 1]]
            cs = cs[cs < r]
            levels[r] = (levels[cs].max() + 1) if len(cs) else 0
    else:
        for r in range(n - 1, -1, -1):
            cs = indices[indptr[r]:indptr[r + 1]]
            cs = cs[cs > r]
            levels[r] = (levels[cs].max() + 1) if len(cs) else 0
    return levels, int(levels.max()) + 1 if n else 0


# ---------------------------------------------------------------------------
# ILUT / ILU(0)
# ---------------------------------------------------------------------------
def ilut(indptr, indices, vals, fill: int = 100, tau: float = 1e-3):
    """ILUT(p, tau) factorization. Returns ((Lp, Li, Lv), (Up, Ui, Uv)) with
    unit-lower L (diag implicit) and upper U (diag stored first per row)."""
    n = len(indptr) - 1
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    vals = np.ascontiguousarray(vals, np.float64)
    lib = _load()
    if lib is not None:
        cap = n * (fill + 1) + len(vals)
        Lp = np.zeros(n + 1, np.int64)
        Li = np.zeros(cap, np.int32)
        Lv = np.zeros(cap, np.float64)
        Up = np.zeros(n + 1, np.int64)
        Ui = np.zeros(cap, np.int32)
        Uv = np.zeros(cap, np.float64)
        lib.ilut(n, indptr, indices, vals, fill, tau, Lp, Li, Lv, Up, Ui, Uv)
        lnnz, unnz = Lp[-1], Up[-1]
        return (Lp, Li[:lnnz].copy(), Lv[:lnnz].copy()), \
               (Up, Ui[:unnz].copy(), Uv[:unnz].copy())
    return _ilut_py(n, indptr, indices, vals, fill, tau)


def _ilut_py(n, indptr, indices, vals, fill, tau):
    """Pure-python ILUT fallback (small problems / no compiler)."""
    Lp = np.zeros(n + 1, np.int64)
    Up = np.zeros(n + 1, np.int64)
    Li_all, Lv_all, Ui_all, Uv_all = [], [], [], []
    urows: list[tuple[np.ndarray, np.ndarray]] = []
    for i in range(n):
        w: dict[int, float] = {}
        s, e = indptr[i], indptr[i + 1]
        row_cols = indices[s:e]
        row_vals = vals[s:e]
        for cc, vv in zip(row_cols, row_vals):
            w[int(cc)] = w.get(int(cc), 0.0) + float(vv)
        # SuperLU-style dual thresholds (see csparse.cpp ilut comment).
        drop_u = tau * np.linalg.norm(row_vals)
        drop_l = tau
        ks = sorted(k for k in w if k < i)
        qi = 0
        while qi < len(ks):
            k = ks[qi]
            ucols, uvals = urows[k]
            wk = w[k] / uvals[0]
            if abs(wk) < drop_l:
                del w[k]
                qi += 1
                continue
            w[k] = wk
            for cc, vv in zip(ucols[1:], uvals[1:]):
                cc = int(cc)
                before = cc in w
                w[cc] = w.get(cc, 0.0) - wk * vv
                if not before and cc < i and cc > k:
                    import bisect
                    bisect.insort(ks, cc)
            qi += 1
        lpart = [(c, v) for c, v in w.items() if c < i and abs(v) >= drop_l]
        upart = [(c, v) for c, v in w.items() if c > i and abs(v) >= drop_u]
        lpart.sort(key=lambda t: -abs(t[1]))
        upart.sort(key=lambda t: -abs(t[1]))
        lpart = sorted(lpart[:fill])
        upart = sorted(upart[:fill])
        diag = w.get(i, 0.0)
        if diag == 0.0:
            diag = max(drop_u, 1e-12)
        for c, v in lpart:
            Li_all.append(c)
            Lv_all.append(v)
        Lp[i + 1] = len(Li_all)
        ucols = np.array([i] + [c for c, _ in upart], np.int32)
        uvals = np.array([diag] + [v for _, v in upart], np.float64)
        urows.append((ucols, uvals))
        Ui_all.extend(ucols.tolist())
        Uv_all.extend(uvals.tolist())
        Up[i + 1] = len(Ui_all)
    return (Lp, np.array(Li_all, np.int32), np.array(Lv_all, np.float64)), \
           (Up, np.array(Ui_all, np.int32), np.array(Uv_all, np.float64))


def ilu0(indptr, indices, vals):
    """ILU(0) factorization (zero fill)."""
    n = len(indptr) - 1
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    vals = np.ascontiguousarray(vals, np.float64)
    lib = _load()
    if lib is not None:
        cap = len(vals) + n
        Lp = np.zeros(n + 1, np.int64)
        Li = np.zeros(cap, np.int32)
        Lv = np.zeros(cap, np.float64)
        Up = np.zeros(n + 1, np.int64)
        Ui = np.zeros(cap, np.int32)
        Uv = np.zeros(cap, np.float64)
        lib.ilu0(n, indptr, indices, vals, Lp, Li, Lv, Up, Ui, Uv)
        lnnz, unnz = Lp[-1], Up[-1]
        return (Lp, Li[:lnnz].copy(), Lv[:lnnz].copy()), \
               (Up, Ui[:unnz].copy(), Uv[:unnz].copy())
    # fallback: ILUT with tau=0 and unlimited fill restricted to pattern is
    # not identical; use ILUT with huge fill and tau=0 as approximation-free
    # fallback only for tests.
    return _ilut_py(n, indptr, indices, vals, len(vals), 0.0)


def spgemm(m, a_indptr, a_indices, a_vals, b_indptr, b_indices, b_vals):
    """C = A @ B. Returns COO triplets (rows, cols, vals)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native spgemm unavailable")
    a_indptr = np.ascontiguousarray(a_indptr, np.int64)
    a_indices = np.ascontiguousarray(a_indices, np.int32)
    a_vals = np.ascontiguousarray(a_vals, np.float64)
    b_indptr = np.ascontiguousarray(b_indptr, np.int64)
    b_indices = np.ascontiguousarray(b_indices, np.int32)
    b_vals = np.ascontiguousarray(b_vals, np.float64)
    k_dim = len(b_indptr) - 1
    n_cols = int(b_indices.max()) + 1 if len(b_indices) else 0
    nnz = lib.spgemm(m, k_dim, n_cols, a_indptr, a_indices, a_vals,
                     b_indptr, b_indices, b_vals, None, None, None)
    Cp = np.zeros(m + 1, np.int64)
    Ci = np.zeros(nnz, np.int32)
    Cv = np.zeros(nnz, np.float64)
    lib.spgemm(m, k_dim, n_cols, a_indptr, a_indices, a_vals,
               b_indptr, b_indices, b_vals,
               Cp.ctypes.data, Ci.ctypes.data, Cv.ctypes.data)
    rows = np.repeat(np.arange(m), np.diff(Cp))
    return rows, Ci, Cv


def lower_solve_unit_host(indptr, indices, vals, b):
    """Host sequential unit-lower solve (reference/debug)."""
    n = len(indptr) - 1
    lib = _load()
    x = np.zeros(n, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    if lib is not None:
        lib.lower_solve_unit(n, np.ascontiguousarray(indptr, np.int64),
                             np.ascontiguousarray(indices, np.int32),
                             np.ascontiguousarray(vals, np.float64), b, x)
        return x
    for r in range(n):
        s, e = indptr[r], indptr[r + 1]
        x[r] = b[r] - vals[s:e] @ x[indices[s:e]]
    return x


def upper_solve_host(indptr, indices, vals, b):
    n = len(indptr) - 1
    lib = _load()
    x = np.zeros(n, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    if lib is not None:
        lib.upper_solve(n, np.ascontiguousarray(indptr, np.int64),
                        np.ascontiguousarray(indices, np.int32),
                        np.ascontiguousarray(vals, np.float64), b, x)
        return x
    for r in range(n - 1, -1, -1):
        s, e = indptr[r], indptr[r + 1]
        cs = indices[s:e]
        vs = vals[s:e]
        mask = cs != r
        x[r] = (b[r] - vs[mask] @ x[cs[mask]]) / vs[~mask][0]
    return x
