"""ctypes binding to the REFERENCE's compiled colDeltaCor kernels.

Test/bench oracle only -- see build.py.  Wrapper semantics mirror the
reference python wrappers (speedboosted.pyx:542-610 and
velocyto/estimation.py:11-170): e/d are C-contiguous (genes, cells)
float64, rm is the preallocated (cells, cells) output, ixs is
(cells, nrndm) intp.
"""
import ctypes
import multiprocessing
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(HERE, "libspeedboosted_ref.so")

_lib = None


def available() -> bool:
    return _load() is not None


def _load():
    global _lib
    if _lib is None:
        if not os.path.exists(_SO):
            try:
                from . import build
                build.build(verbose=False)
            except Exception:
                return None
        _lib = ctypes.CDLL(_SO)
        D = ctypes.POINTER(ctypes.c_double)
        S = ctypes.POINTER(ctypes.c_ssize_t)
        I, F = ctypes.c_int, ctypes.c_double
        _lib.ref_colDeltaCor.argtypes = [D, D, D, I, I, I]
        _lib.ref_colDeltaCorSqrt.argtypes = [D, D, D, I, I, I, F]
        _lib.ref_colDeltaCorLog10.argtypes = [D, D, D, I, I, I, F]
        _lib.ref_colDeltaCorpartial.argtypes = [D, D, D, S, I, I, I, I]
        _lib.ref_colDeltaCorSqrtpartial.argtypes = [D, D, D, S, I, I, I, I, F]
        _lib.ref_colDeltaCorLog10partial.argtypes = [D, D, D, S, I, I, I, I, F]
    return _lib


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _threads(threads):
    if threads is None:
        # reference default: ncpu/2 (velocyto/estimation.py:27-30)
        return max(1, multiprocessing.cpu_count() // 2)
    return int(threads)


def col_delta_cor(emat, dmat, transform="linear", psc=0.0, threads=None):
    """Dense reference kernel. emat/dmat: (genes, cells). -> (cells, cells)."""
    lib = _load()
    e = np.ascontiguousarray(emat, dtype=np.float64)
    d = np.ascontiguousarray(dmat, dtype=np.float64)
    rows, cols = e.shape
    rm = np.zeros((cols, cols), dtype=np.float64)
    nt = _threads(threads)
    if transform == "linear":
        lib.ref_colDeltaCor(_dp(e), _dp(d), _dp(rm), rows, cols, nt)
    elif transform == "sqrt":
        lib.ref_colDeltaCorSqrt(_dp(e), _dp(d), _dp(rm), rows, cols, nt, psc)
    elif transform == "log10":
        lib.ref_colDeltaCorLog10(_dp(e), _dp(d), _dp(rm), rows, cols, nt, psc)
    else:
        raise ValueError(transform)
    return rm


def col_delta_cor_partial(emat, dmat, ixs, transform="linear", psc=0.0,
                          threads=None):
    """Sampled-neighborhood reference kernel; returns the dense (N, N)
    scatter exactly as the reference wrapper does."""
    lib = _load()
    e = np.ascontiguousarray(emat, dtype=np.float64)
    d = np.ascontiguousarray(dmat, dtype=np.float64)
    ix = np.ascontiguousarray(ixs, dtype=np.intp)
    rows, cols = e.shape
    nrndm = ix.shape[1]
    # the C kernel scatters rm[i * cols + ixs[i][k]] unchecked: an index
    # >= cols corrupts the heap silently (glibc aborts much later)
    if ix.shape[0] != cols or (len(ix) and int(ix.max()) >= cols) or \
            (len(ix) and int(ix.min()) < 0):
        raise ValueError(f"ixs out of range for {cols} cells")
    rm = np.zeros((cols, cols), dtype=np.float64)
    ip = ix.ctypes.data_as(ctypes.POINTER(ctypes.c_ssize_t))
    nt = _threads(threads)
    if transform == "linear":
        lib.ref_colDeltaCorpartial(_dp(e), _dp(d), _dp(rm), ip,
                                   rows, cols, nrndm, nt)
    elif transform == "sqrt":
        lib.ref_colDeltaCorSqrtpartial(_dp(e), _dp(d), _dp(rm), ip,
                                       rows, cols, nrndm, nt, psc)
    elif transform == "log10":
        lib.ref_colDeltaCorLog10partial(_dp(e), _dp(d), _dp(rm), ip,
                                        rows, cols, nrndm, nt, psc)
    else:
        raise ValueError(transform)
    return rm
