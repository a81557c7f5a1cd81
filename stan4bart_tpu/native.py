"""Host-side native kernels (C++ extension) with numpy fallbacks.

The C++ layer (native/hostops.cpp — the runtime counterpart of the
reference's own C/C++ host utilities) is built in-place via
``make -C native`` and loaded lazily; every entry point has a pure-numpy
fallback so the package works without the build step.
"""

from __future__ import annotations

import numpy as np

try:
    from stan4bart_tpu import _hostops  # type: ignore

    HAVE_NATIVE = True
except ImportError:
    _hostops = None
    HAVE_NATIVE = False


def rank_matrix(X: np.ndarray, cuts: np.ndarray) -> np.ndarray:
    """rank[n, v] = searchsorted(cuts[v], X[n, v], 'left') — the integer
    ranks consumed by every BART tree walk."""
    X = np.ascontiguousarray(X, dtype=np.float64)
    cuts = np.ascontiguousarray(cuts, dtype=np.float64)
    N, P = X.shape
    out = np.empty((N, P), dtype=np.int32)
    if HAVE_NATIVE:
        _hostops.rank_matrix(X, cuts, out)
        return out
    for j in range(P):
        out[:, j] = np.searchsorted(cuts[j], X[:, j], side="left")
    return out


def dense_z(Z: np.ndarray, group_idx: np.ndarray, lhs: np.ndarray,
            offset: int, p: int) -> None:
    """Scatter one random-effect term into the dense Z block, in place."""
    if HAVE_NATIVE and Z.flags.c_contiguous:
        _hostops.dense_z(Z, np.ascontiguousarray(group_idx, np.int32),
                         np.ascontiguousarray(lhs, np.float64),
                         int(offset), int(p))
        return
    ok = group_idx >= 0
    rows = np.flatnonzero(ok)
    base = offset + group_idx[rows].astype(np.int64) * p
    for c in range(p):
        Z[rows, base + c] = lhs[rows, c]
