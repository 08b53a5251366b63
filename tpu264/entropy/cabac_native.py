"""ctypes loader for the native CABAC record-replay core (cabac_core.c).

Compiled on first use with the system gcc into `__pycache__` next to the
source (no pip / setuptools involvement); falls back to None if no
compiler is available — callers then use the pure-Python engine.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

from . import cabac_tables as tbl

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cabac_core.c")
_LIB = None
_TRIED = False


def _build() -> str | None:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    cache = os.path.join(_HERE, "__pycache__")
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"cabac_core_{tag}.so")
    if not os.path.exists(so):
        tmp = so + f".tmp{os.getpid()}"
        try:
            subprocess.run(
                ["gcc", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
                check=True, capture_output=True)
            os.replace(tmp, so)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    return so


def _lib():
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        so = _build()
        if so is not None:
            lib = ctypes.CDLL(so)
            lib.cabac_encode_records.restype = ctypes.c_long
            lib.cabac_encode_records.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_long,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_long,
            ]
            _LIB = lib
    return _LIB


_RANGE_LPS = np.ascontiguousarray(tbl.RANGE_TAB_LPS, dtype=np.uint8)
_TRANS_MPS = np.ascontiguousarray(tbl.TRANS_IDX_MPS, dtype=np.uint8)
_TRANS_LPS = np.ascontiguousarray(tbl.TRANS_IDX_LPS, dtype=np.uint8)


def available() -> bool:
    return _lib() is not None


def encode_records(kinds: np.ndarray, a: np.ndarray, b: np.ndarray,
                   table: int, slice_qp: int) -> bytes:
    """Replay one slice's record stream -> CABAC payload bytes."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native cabac core unavailable")
    state, mps = tbl.init_states(table, slice_qp)
    state = np.ascontiguousarray(state, np.uint8)
    mps = np.ascontiguousarray(mps, np.uint8)
    kinds = np.ascontiguousarray(kinds, np.int8)
    a = np.ascontiguousarray(a, np.int32)
    b = np.ascontiguousarray(b, np.int32)
    cap = max(4096, int(kinds.size * 3) + 64)
    out = np.empty(cap, np.uint8)
    n = lib.cabac_encode_records(
        kinds.ctypes.data, a.ctypes.data, b.ctypes.data,
        ctypes.c_long(kinds.size),
        _RANGE_LPS.ctypes.data, _TRANS_MPS.ctypes.data,
        _TRANS_LPS.ctypes.data,
        state.ctypes.data, mps.ctypes.data,
        out.ctypes.data, ctypes.c_long(cap))
    if n < 0:
        raise RuntimeError("cabac output overflow")
    return out[:n].tobytes()
