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


_SOURCES = ("solver.cpp", "treegen.cpp")


def _build() -> bool:
    srcs = [os.path.join(_CSRC, s) for s in _SOURCES]
    # -ffp-contract=off: -march=native would otherwise contract a*b+c into
    # FMAs, breaking the bit-for-bit pivot parity between the C++ simplex
    # and the numpy fallback on degenerate games (see csrc/solver.cpp).
    cmd = ["g++", "-O3", "-march=native", "-ffp-contract=off", "-fopenmp",
           "-shared", "-fPIC", *srcs, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logging.warning("native solver build failed (%s); retrying without "
                        "-march=native/-fopenmp", e)
    cmd = ["g++", "-O2", "-shared", "-fPIC", *srcs, "-o", _LIB_PATH]
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
        src_mtime = max(os.path.getmtime(os.path.join(_CSRC, s))
                        for s in _SOURCES)
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < src_mtime):
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
        lib.treegen_generate.restype = ctypes.c_int64
        lib.treegen_generate.argtypes = [
            ctypes.c_uint64,  # seed
            ctypes.c_int, ctypes.c_int, ctypes.c_int,  # A, T, depth_bound
            ctypes.c_int, ctypes.c_int,  # root_row, root_col
            ctypes.c_double,  # threshold
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,  # terminal values
            ctypes.c_int, ctypes.c_int, ctypes.c_double,  # row rule
            ctypes.c_int, ctypes.c_int, ctypes.c_double,  # col rule
            ctypes.c_int, ctypes.c_int, ctypes.c_double,  # depth rule
            ctypes.c_int64,  # max_nodes
        ]
        lib.treegen_fetch.restype = ctypes.c_int
        lib.treegen_fetch.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.treegen_free.restype = None
        lib.treegen_free.argtypes = []
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


def generate_tree_native_arrays(seed: int, max_actions: int,
                                max_transitions: int, depth_bound: int,
                                root_row: int, root_col: int,
                                threshold: float, terminal_values,
                                rules, max_nodes: int = 1 << 24):
    """Runs the C++ level-synchronous generator; returns numpy tensors.

    ``rules`` is ((delta, stoch_delta, prob) x 3) for row/col/depth shaping.
    Raises RuntimeError if the native library is unavailable.
    """
    lib = get_solver_lib()
    if lib is None or not hasattr(lib, "treegen_generate"):
        raise RuntimeError("native treegen unavailable")
    tv = np.ascontiguousarray(terminal_values, dtype=np.float64)
    (rr, rc, rd) = rules
    size = lib.treegen_generate(
        ctypes.c_uint64(seed & (2**64 - 1)), max_actions, max_transitions,
        depth_bound, root_row, root_col, float(threshold),
        tv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), tv.size,
        int(rr[0]), int(rr[1]), float(rr[2]),
        int(rc[0]), int(rc[1]), float(rc[2]),
        int(rd[0]), int(rd[1]), float(rd[2]),
        max_nodes)
    if size < 0:
        reasons = {
            -2: f"tree exceeded max_nodes={max_nodes} (runaway shaping rule?)",
            -3: "a game matrix failed to solve (see stderr for the matrix)",
            -4: "max_transitions must be in [1, 64]",
            -5: "max_actions and len(terminal_values) must be >= 1",
        }
        raise RuntimeError(
            f"native treegen failed: {reasons.get(int(size), f'code {size}')}")
    A, T, S = max_actions, max_transitions, int(size)
    index = np.zeros((S, T, A, A), np.int32)
    value = np.zeros((S, T, A, A), np.float32)
    chance = np.zeros((S, T, A, A), np.float32)
    ev = np.zeros((S, A, A), np.float32)
    legal = np.zeros((S, A, A), np.float32)
    solution = np.zeros((S, 2 * A), np.float32)
    root_value = np.zeros((S,), np.float32)
    depth = np.zeros((S,), np.int32)
    i32 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    f32 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    rc_ = lib.treegen_fetch(i32(index), f32(value), f32(chance), f32(ev),
                            f32(legal), f32(solution), f32(root_value),
                            i32(depth))
    lib.treegen_free()
    if rc_ != 0:
        raise RuntimeError("native treegen fetch failed")
    return dict(index=index, value=value, chance=chance,
                expected_value=ev[:, None], legal=legal[:, None],
                solution=solution, root_value=root_value[:, None],
                depth=depth)
