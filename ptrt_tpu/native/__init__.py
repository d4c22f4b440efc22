"""Native (C++) runtime components, loaded via ctypes.

The compute path is JAX/XLA/Pallas; the host runtime around it — BVH
construction (and future: OBJ parsing, asset IO) — is C++ like the
reference's host code, because Python-per-node tree builds are ~1000x too
slow for million-triangle scenes.

The library is compiled on demand with g++ and cached next to the sources;
every entry point has a pure-Python fallback so the package works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "libptrtnative.so")
_SRC = os.path.join(_HERE, "bvh_builder.cpp")

_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.ptrt_bvh_build.restype = ctypes.c_int64
        lib.ptrt_bvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.ptrt_bvh_fetch.restype = None
        lib.ptrt_bvh_fetch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.ptrt_bvh8_build.restype = ctypes.c_int64
        lib.ptrt_bvh8_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ptrt_bvh8_fetch.restype = None
        lib.ptrt_bvh8_fetch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib


def native_build_bvh(tmin: np.ndarray, tmax: np.ndarray, cent: np.ndarray,
                     leaf_size: int):
    """Run the native builder. Returns (bmin, bmax, leaf_first, skip, order)
    or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = tmin.shape[0]
    tmin = np.ascontiguousarray(tmin, np.float32)
    tmax = np.ascontiguousarray(tmax, np.float32)
    cent = np.ascontiguousarray(cent, np.float32)
    order_len = ctypes.c_int64(0)
    fp = ctypes.POINTER(ctypes.c_float)
    num_nodes = lib.ptrt_bvh_build(
        tmin.ctypes.data_as(fp), tmax.ctypes.data_as(fp),
        cent.ctypes.data_as(fp), n, leaf_size, ctypes.byref(order_len))
    if num_nodes <= 0:
        return None
    bmin = np.empty((num_nodes, 3), np.float32)
    bmax = np.empty((num_nodes, 3), np.float32)
    leaf_first = np.empty(num_nodes, np.int32)
    skip = np.empty(num_nodes, np.int32)
    order = np.empty(order_len.value, np.int64)
    lib.ptrt_bvh_fetch(
        bmin.ctypes.data_as(fp), bmax.ctypes.data_as(fp),
        leaf_first.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        skip.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return bmin, bmax, leaf_first, skip, order


def native_build_bvh8(tmin: np.ndarray, tmax: np.ndarray, cent: np.ndarray,
                      leaf_size: int):
    """Run the native 8-wide builder.  Returns (slot_bmin (N,8,3),
    slot_bmax (N,8,3), child_base, leaf_base, leaf_count, int_count, order,
    max_depth) or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = tmin.shape[0]
    tmin = np.ascontiguousarray(tmin, np.float32)
    tmax = np.ascontiguousarray(tmax, np.float32)
    cent = np.ascontiguousarray(cent, np.float32)
    order_len = ctypes.c_int64(0)
    max_depth = ctypes.c_int32(0)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    nw = lib.ptrt_bvh8_build(
        tmin.ctypes.data_as(fp), tmax.ctypes.data_as(fp),
        cent.ctypes.data_as(fp), n, leaf_size, ctypes.byref(order_len),
        ctypes.byref(max_depth))
    if nw <= 0:
        return None
    slot_bmin = np.empty((nw, 8, 3), np.float32)
    slot_bmax = np.empty((nw, 8, 3), np.float32)
    child_base = np.empty(nw, np.int32)
    leaf_base = np.empty(nw, np.int32)
    leaf_count = np.empty(nw, np.int32)
    int_count = np.empty(nw, np.int32)
    order = np.empty(order_len.value, np.int64)
    lib.ptrt_bvh8_fetch(
        slot_bmin.ctypes.data_as(fp), slot_bmax.ctypes.data_as(fp),
        child_base.ctypes.data_as(ip), leaf_base.ctypes.data_as(ip),
        leaf_count.ctypes.data_as(ip), int_count.ctypes.data_as(ip),
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return (slot_bmin, slot_bmax, child_base, leaf_base, leaf_count,
            int_count, order, int(max_depth.value))
