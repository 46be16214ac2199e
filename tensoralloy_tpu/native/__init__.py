"""Native (C++) host kernels: cell-list neighbor search + triple
enumeration, loaded via ctypes. Built on demand with g++ (-O3) the
first time it's imported; falls back to the pure-numpy implementations
in `tensoralloy_tpu.neighbor` if no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "neighbor.cpp")
_LIB_PATH = os.path.join(_HERE, "libtaneigh.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    # compile to a private temp file and os.replace (atomic) into
    # place: concurrent worker processes (Dataset.build(serial=False))
    # may race this build, and a CDLL of a half-written .so segfaults
    tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
           "-std=c++17", _SRC, "-o", tmp]
    try:
        try:
            subprocess.run(cmd, check=True, capture_output=True,
                           timeout=120)
        except Exception:
            # -march=native may be unsupported in some sandboxes
            cmd.remove("-march=native")
            subprocess.run(cmd, check=True, capture_output=True,
                           timeout=120)
        os.replace(tmp, _LIB_PATH)
        return True
    except Exception:
        try:
            os.remove(tmp)
        except OSError:
            pass
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or \
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            # a stale .so from another machine/compiler can fail to
            # load — rebuild once before giving up on native
            if _build():
                try:
                    lib = ctypes.CDLL(_LIB_PATH)
                except OSError:
                    _build_failed = True
                    return None
            else:
                _build_failed = True
                return None
        lib.ta_neighbor_list.restype = ctypes.c_longlong
        lib.ta_neighbor_list.argtypes = [
            ctypes.c_longlong,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.uint8, flags="C"),
            ctypes.c_double, ctypes.c_longlong,
            np.ctypeslib.ndpointer(np.int32, flags="C,W"),
            np.ctypeslib.ndpointer(np.int32, flags="C,W"),
            np.ctypeslib.ndpointer(np.int32, flags="C,W"),
            np.ctypeslib.ndpointer(np.float64, flags="C,W"),
            np.ctypeslib.ndpointer(np.float64, flags="C,W"),
        ]
        lib.ta_triple_list.restype = ctypes.c_longlong
        lib.ta_triple_list.argtypes = [
            ctypes.c_longlong,
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            ctypes.c_longlong, ctypes.c_longlong,
            np.ctypeslib.ndpointer(np.int32, flags="C,W"),
            np.ctypeslib.ndpointer(np.int32, flags="C,W"),
        ]
        _lib = lib
        return _lib


def native_neighbor_list(positions: np.ndarray, cell: np.ndarray,
                         pbc: np.ndarray, cutoff: float
                         ) -> Optional[Tuple[np.ndarray, ...]]:
    """C++ cell-list neighbor search; None if the library is absent."""
    lib = get_lib()
    if lib is None:
        return None
    positions = np.ascontiguousarray(positions, np.float64)
    cell = np.ascontiguousarray(cell, np.float64)
    pbc_u8 = np.ascontiguousarray(np.asarray(pbc, bool), np.uint8)
    n = len(positions)
    cap = max(1024, n * 120)
    while True:
        out_i = np.empty(cap, np.int32)
        out_j = np.empty(cap, np.int32)
        out_s = np.empty((cap, 3), np.int32)
        out_d = np.empty(cap, np.float64)
        out_v = np.empty((cap, 3), np.float64)
        got = lib.ta_neighbor_list(n, positions, cell, pbc_u8,
                                   float(cutoff), cap, out_i, out_j,
                                   out_s.reshape(-1), out_d,
                                   out_v.reshape(-1))
        if got < 0:
            cap = -got
            continue
        return (out_i[:got], out_j[:got],
                out_s[:got].astype(np.float64), out_d[:got],
                out_v[:got])


def native_triple_list(ilist_sorted: np.ndarray, natoms: int
                       ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(p, q) indices into the (i-sorted) pair arrays for j<k triples."""
    lib = get_lib()
    if lib is None:
        return None
    ilist_sorted = np.ascontiguousarray(ilist_sorted, np.int32)
    npairs = len(ilist_sorted)
    cap = max(1024, npairs * 32)
    while True:
        out_p = np.empty(cap, np.int32)
        out_q = np.empty(cap, np.int32)
        got = lib.ta_triple_list(npairs, ilist_sorted, natoms, cap,
                                 out_p, out_q)
        if got < 0:
            cap = -got
            continue
        return out_p[:got], out_q[:got]
