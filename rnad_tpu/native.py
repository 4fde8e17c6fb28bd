"""Loader for the framework's native (C++) components.

The reference's only native dependency is pygambit (C++), used for exact Nash
solving during tree generation (reference environment/tree.py:205-224).  Our
replacement is a batched zero-sum LP solver in ``csrc/solver.cpp``, compiled
to a shared library and bound with ctypes (pybind11 is not available in this
environment).  The library is compiled on first use if no prebuilt
``libsolver.so`` is found next to the sources.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.realpath(__file__)), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libsolver.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    src = os.path.join(_CSRC, "solver.cpp")
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC", src,
           "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logging.warning("native solver build failed (%s); retrying without "
                        "-march=native/-fopenmp", e)
    cmd = ["g++", "-O2", "-shared", "-fPIC", src, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logging.warning("native solver build failed: %s", e)
        return False


def get_solver_lib() -> Optional[ctypes.CDLL]:
    """Returns the loaded native library, building it if necessary.

    Returns None when the toolchain is unavailable; callers fall back to the
    pure-numpy implementation of the identical algorithm.
    """
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH)
            < os.path.getmtime(os.path.join(_CSRC, "solver.cpp"))
        ):
            if not _build():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logging.warning("could not load native solver: %s", e)
            _load_failed = True
            return None
        lib.solve_zero_sum_batch.restype = ctypes.c_int
        lib.solve_zero_sum_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # payoff
            ctypes.POINTER(ctypes.c_int),  # rows
            ctypes.POINTER(ctypes.c_int),  # cols
            ctypes.c_int,  # batch
            ctypes.c_int,  # max_rows
            ctypes.c_int,  # max_cols
            ctypes.POINTER(ctypes.c_double),  # row_strat
            ctypes.POINTER(ctypes.c_double),  # col_strat
            ctypes.POINTER(ctypes.c_double),  # values
        ]
        _lib = lib
        return _lib


def solve_zero_sum_batch_native(payoff: np.ndarray, rows: np.ndarray,
                                cols: np.ndarray):
    """Calls the C++ batched solver.  Raises RuntimeError if unavailable."""
    lib = get_solver_lib()
    if lib is None:
        raise RuntimeError("native solver unavailable")
    payoff = np.ascontiguousarray(payoff, dtype=np.float64)
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    batch, max_r, max_c = payoff.shape
    row_strat = np.zeros((batch, max_r), dtype=np.float64)
    col_strat = np.zeros((batch, max_c), dtype=np.float64)
    values = np.zeros((batch,), dtype=np.float64)
    dptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    iptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    status = lib.solve_zero_sum_batch(
        dptr(payoff), iptr(rows), iptr(cols), batch, max_r, max_c,
        dptr(row_strat), dptr(col_strat), dptr(values))
    if status != 0:
        raise RuntimeError(f"native solver returned status {status}")
    return row_strat, col_strat, values
