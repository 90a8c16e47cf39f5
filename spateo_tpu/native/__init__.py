"""Native (C++) runtime components, loaded via ctypes.

The reference ships compiled extensions for its host-side combinatorial
kernels (`libfastpd` for mesh-correction MRF optimization,
reference morpho_mesh_correction.py:32, and the OpenMP `fbgbp` BP solver).
Here the TPU handles the dense compute (BP runs as an XLA program,
ops/bp.py); the genuinely host-side combinatorial solver is native C++,
compiled on first use with the system toolchain and cached.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB: Optional[ctypes.CDLL] = None
_LIB_ERR: Optional[str] = None


def _build_library() -> str:
    """Compile fastpd.cpp into a shared library (cached next to the source,
    falling back to a temp dir for read-only installs)."""
    src = os.path.join(_SRC_DIR, "fastpd.cpp")
    for out_dir in (os.path.join(_SRC_DIR, "_build"), tempfile.mkdtemp(prefix="spateo_native_")):
        try:
            os.makedirs(out_dir, exist_ok=True)
            lib_path = os.path.join(out_dir, "libfastpd.so")
            if os.path.exists(lib_path) and os.path.getmtime(lib_path) >= os.path.getmtime(src):
                return lib_path
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", lib_path]
            subprocess.run(cmd, check=True, capture_output=True)
            return lib_path
        except (OSError, subprocess.CalledProcessError):
            continue
    raise RuntimeError("could not compile the native fastpd library")


def _get_lib() -> ctypes.CDLL:
    global _LIB, _LIB_ERR
    if _LIB is not None:
        return _LIB
    if _LIB_ERR is not None:
        raise RuntimeError(_LIB_ERR)
    try:
        lib = ctypes.CDLL(_build_library())
    except Exception as exc:  # remember the failure; callers fall back
        _LIB_ERR = f"native fastpd unavailable: {exc}"
        raise RuntimeError(_LIB_ERR)
    lib.fastpd_solve.restype = ctypes.c_double
    lib.fastpd_solve.argtypes = [
        ctypes.c_int,
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        ctypes.c_uint64,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    _LIB = lib
    return lib


def fastpd(unaries: np.ndarray, binaries, pairs: np.ndarray, n_iter: int = 100, seed: int = 0) -> np.ndarray:
    """Solve a pairwise MRF: argmin_x sum_v u[x_v, v] + sum_p b_p[x_i, x_j].

    Signature-compatible with the reference's `libfastpd.fastpd`
    (morpho_mesh_correction.py:319): `unaries` is [L, N], `binaries` a list
    of [L, L] tables (one per pair), `pairs` an [P, 2] int array. Returns the
    [N] label assignment. Exact for small problems, ICM-with-restarts beyond.
    """
    u = np.ascontiguousarray(np.asarray(unaries, np.float32))
    L, N = u.shape
    p = np.ascontiguousarray(np.asarray(pairs, np.int32))
    b = np.ascontiguousarray(np.stack([np.asarray(t, np.float32) for t in binaries]))
    if b.shape != (len(p), L, L):
        raise ValueError(f"binaries must be [n_pairs, L, L]; got {b.shape}")
    out = np.zeros(N, np.int32)
    try:
        _get_lib().fastpd_solve(N, L, u, len(p), p.reshape(-1), b.reshape(-1), int(n_iter), int(seed), out)
    except RuntimeError:
        return _fastpd_python(u, b, p, int(n_iter), int(seed))
    return out


def _fastpd_python(u: np.ndarray, b: np.ndarray, pairs: np.ndarray, n_iter: int, seed: int) -> np.ndarray:
    """Pure-numpy ICM fallback when no C++ toolchain is available."""
    L, N = u.shape
    rng = np.random.default_rng(seed)
    best = np.zeros(N, np.int64)

    def energy(x):
        e = u[x, np.arange(N)].sum()
        e += sum(b[k, x[i], x[j]] for k, (i, j) in enumerate(pairs))
        return e

    best_e = energy(best)
    for _ in range(max(n_iter // 10, 3)):
        x = rng.integers(0, L, N)
        for _ in range(20):
            changed = False
            for v in range(N):
                costs = u[:, v].astype(np.float64).copy()
                for k, (i, j) in enumerate(pairs):
                    if i == v:
                        costs += b[k, :, x[j]]
                    elif j == v:
                        costs += b[k, x[i], :]
                l = int(np.argmin(costs))
                if l != x[v]:
                    x[v] = l
                    changed = True
            if not changed:
                break
        e = energy(x)
        if e < best_e:
            best_e, best = e, x.copy()
    return best.astype(np.int32)
