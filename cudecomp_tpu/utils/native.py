"""ctypes loader for the native geometry core (csrc/cudecomp_core.cpp).

Builds the shared library on first use if a compiler is available (same
spirit as the reference's CMake-built C++ core); falls back to None so the
pure-Python geometry stays fully functional without a toolchain.  Parity is
enforced by tests/test_native.py (bit-identical against geometry.py).

Disable with CUDECOMP_TPU_DISABLE_NATIVE=1.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libcudecomp_core.so")

_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_CSRC, "cudecomp_core.cpp")
    if not os.path.exists(src):
        return False
    # compile to a pid-suffixed temp and atomically rename: concurrent
    # processes on shared storage would otherwise race g++ on the final
    # path and a loser could CDLL a half-written object
    tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-std=c++17", "-shared", "-o",
             tmp, src],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB_PATH)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native core; None if unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("CUDECOMP_TPU_DISABLE_NATIVE", "0") == "1":
        return None
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.cd_get_splits.argtypes = [ctypes.c_int64, ctypes.c_int32,
                                  ctypes.c_int64, i64p]
    lib.cd_get_splits.restype = None
    lib.cd_get_split_offsets.argtypes = [ctypes.c_int64, ctypes.c_int32, i64p]
    lib.cd_get_split_offsets.restype = None
    lib.cd_pencil_info.argtypes = [i64p, i64p, i32p, i32p,
                                   ctypes.c_int32, ctypes.c_int32,
                                   ctypes.c_int32, i32p, i32p,
                                   i64p, i64p, i64p, i64p]
    lib.cd_pencil_info.restype = ctypes.c_int32
    lib.cd_shifted_rank.argtypes = [i32p, ctypes.c_int32, ctypes.c_int32,
                                    ctypes.c_int32, ctypes.c_int32,
                                    ctypes.c_int32, ctypes.c_int32]
    lib.cd_shifted_rank.restype = ctypes.c_int32
    _lib = lib
    return _lib


def _arr(ctype, vals):
    return (ctype * len(vals))(*vals)


def get_splits(n: int, nchunks: int, excess: int = 0):
    lib = load()
    if lib is None:
        return None
    if excess and n <= 0:
        # mirror the Python oracle's rejection (the C ABI has no error
        # channel for this void function; the out-params would silently
        # drop the excess and diverge from geometry.get_splits)
        raise ValueError(f"excess={excess} requires n > 0, got n={n}")
    out = (ctypes.c_int64 * nchunks)()
    lib.cd_get_splits(n, nchunks, excess, out)
    return tuple(out)


def get_split_offsets(n: int, nchunks: int):
    lib = load()
    if lib is None:
        return None
    out = (ctypes.c_int64 * nchunks)()
    lib.cd_get_split_offsets(n, nchunks, out)
    return tuple(out)


def pencil_info(gdims, gdims_dist, pdims, order, axis, pr, pc, halo, pad):
    """Returns (shape, lo, hi, size) in memory order, or None if no native."""
    lib = load()
    if lib is None:
        return None
    shape = (ctypes.c_int64 * 3)()
    lo = (ctypes.c_int64 * 3)()
    hi = (ctypes.c_int64 * 3)()
    size = ctypes.c_int64()
    rc = lib.cd_pencil_info(
        _arr(ctypes.c_int64, gdims), _arr(ctypes.c_int64, gdims_dist),
        _arr(ctypes.c_int32, pdims), _arr(ctypes.c_int32, order),
        axis, pr, pc, _arr(ctypes.c_int32, halo), _arr(ctypes.c_int32, pad),
        shape, lo, hi, ctypes.byref(size))
    if rc != 0:
        raise ValueError(f"cd_pencil_info failed with code {rc}")
    return tuple(shape), tuple(lo), tuple(hi), size.value


def shifted_rank(pdims, rank_order, axis, dim, displacement, periodic, rank):
    lib = load()
    if lib is None:
        return None
    rc = lib.cd_shifted_rank(_arr(ctypes.c_int32, pdims), rank_order,
                             axis, dim, displacement, int(periodic), rank)
    if rc == -2:
        raise ValueError("invalid arguments to cd_shifted_rank")
    return rc
