"""ctypes bindings for the native host runtime (csrc/libpt_host.so).

The reference's host-side hot loops are C++ with OpenMP: film
accumulation (reference: src/AccumulatedImage.cpp:34,61), tone mapping,
the fused clear+pathLength reduction (src/LoadBalancer.cpp:198-213) and
the load-balancing re-deal (src/LoadBalancer.cpp:141-192).  This module
binds our C++ equivalents; every entry point has a NumPy fallback in its
caller, so the package works (slower) without the compiled library.

Build: `make -C csrc` (done automatically on first import if a compiler
is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ..utils.logging import logger

_lock = threading.Lock()
_lib = None
_tried = False

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_SO = os.path.join(_CSRC, "libpt_host.so")


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("IPT_DISABLE_NATIVE"):
            return None
        try:
            if os.path.isdir(_CSRC):
                # Always invoke make: it rebuilds on source timestamp, so
                # edits to pt_host.cpp aren't silently ignored, and a .so
                # copied from another machine (-march=native!) is rebuilt
                # for this CPU instead of SIGILLing mid-render.
                subprocess.run(
                    ["make", "-s", "-C", _CSRC],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_SO)
        except Exception:
            return None
        try:
            return _bind(lib)
        except AttributeError:
            # A stale .so missing a newer symbol (e.g. restored from a
            # cache with fresh timestamps, so make no-ops): fall back to
            # NumPy instead of crashing every native caller.
            logger().warning(
                "libpt_host.so is missing expected symbols; rebuild "
                "csrc (make -C csrc). Using NumPy fallbacks.")
            return None


def _bind(lib):
    """Declare every symbol's signature; raises AttributeError if the
    loaded library predates one of them (caller falls back to NumPy)."""
    global _lib
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.pt_accumulate.argtypes = [u8p, ctypes.c_int64, f32p, ctypes.c_int32, ctypes.c_int32]
    lib.pt_accumulate.restype = None
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.pt_accumulate_soa.argtypes = [
        i32p, i32p, f32p, f32p, f32p, i32p,
        ctypes.c_int64, f32p, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.pt_accumulate_soa.restype = None
    lib.pt_tonemap.argtypes = [f32p, u8p, ctypes.c_int64, ctypes.c_float, ctypes.c_float]
    lib.pt_tonemap.restype = None
    lib.pt_clear_and_sum_pathlengths.argtypes = [u8p, ctypes.c_int64]
    lib.pt_clear_and_sum_pathlengths.restype = ctypes.c_uint64
    lib.pt_load_balance.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64]
    lib.pt_load_balance.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def accumulate(records: np.ndarray, hdr: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    rec = np.ascontiguousarray(records)
    assert hdr.flags["C_CONTIGUOUS"] and hdr.dtype == np.float32
    lib.pt_accumulate(
        rec.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(rec),
        hdr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        hdr.shape[1],
        hdr.shape[0],
    )
    return True


def accumulate_soa(u, v, r, g, b, sample_count, hdr: np.ndarray) -> bool:
    """Device-film fetch accumulation with int32 counts; False if no lib."""
    lib = _load()
    if lib is None:
        return False
    i32 = lambda a: np.ascontiguousarray(a, np.int32)
    f32 = lambda a: np.ascontiguousarray(a, np.float32)
    u, v, cnt = i32(u), i32(v), i32(sample_count)
    r, g, b = f32(r), f32(g), f32(b)
    lengths = {len(a) for a in (u, v, r, g, b, cnt)}
    if len(lengths) != 1:
        # The C++ kernel trusts numRecords = len(u); a shorter sibling
        # array would be read past its end.
        raise ValueError(f"accumulate_soa: mismatched array lengths {lengths}")
    if not (hdr.flags["C_CONTIGUOUS"] and hdr.dtype == np.float32
            and hdr.ndim == 3 and hdr.shape[2] == 3):
        raise ValueError("accumulate_soa: hdr must be C-contiguous f32 (H,W,3)")
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.pt_accumulate_soa(
        u.ctypes.data_as(i32p), v.ctypes.data_as(i32p),
        r.ctypes.data_as(f32p), g.ctypes.data_as(f32p),
        b.ctypes.data_as(f32p), cnt.ctypes.data_as(i32p),
        len(u),
        hdr.ctypes.data_as(f32p),
        hdr.shape[1], hdr.shape[0],
    )
    return True


def tonemap(scaled_hdr: np.ndarray, exposure: float, gamma: float):
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(scaled_hdr, np.float32)
    out = np.empty(src.shape, np.uint8)
    lib.pt_tonemap(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        src.size,
        exposure,
        gamma,
    )
    return out


def clear_and_sum_pathlengths(records: np.ndarray):
    """Returns total path length, clearing accumulators in place; None if no lib."""
    lib = _load()
    if lib is None:
        return None
    if not records.flags["C_CONTIGUOUS"]:
        return None
    return int(
        lib.pt_clear_and_sum_pathlengths(
            records.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(records)
        )
    )


def load_balance(records: np.ndarray, num_tiles: int) -> bool:
    """Reorder records in place by the long/short pairing; False if no lib."""
    lib = _load()
    if lib is None or not records.flags["C_CONTIGUOUS"]:
        return False
    lib.pt_load_balance(
        records.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(records), num_tiles
    )
    return True
