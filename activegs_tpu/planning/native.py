"""ctypes loader for the native planning runtime (native/astar.cpp).

Compiles the shared library on first use (g++, cached beside the source)
and exposes numpy-friendly wrappers. Returns None from wrappers when the
toolchain/library is unavailable so astar.py can fall back to pure Python.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "astar.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libastar.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        src = os.path.abspath(_SRC)
        lib = os.path.abspath(_LIB)
        try:
            if not os.path.exists(lib) or os.path.getmtime(lib) < os.path.getmtime(
                src
            ):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", lib, src],
                    check=True,
                    capture_output=True,
                )
            _lib = ctypes.CDLL(lib)
            _lib.astar_multi_goal.restype = ctypes.c_int
            _lib.dijkstra_range.restype = ctypes.c_int64
        except Exception:
            _lib = None
        return _lib


def native_search_goal(start, goals, traversable, bbox_min, voxel_size):
    lib = _load()
    if lib is None:
        return None
    trav = np.ascontiguousarray(traversable.astype(np.uint8))
    dx, dy, dz = trav.shape
    start = np.ascontiguousarray(start.astype(np.int64))
    goals = np.ascontiguousarray(goals.astype(np.int64))
    vs = np.ascontiguousarray(np.asarray(voxel_size, np.float64))
    n = len(goals)
    path_cap = int(dx + dy + dz) * 3
    lengths = np.empty(n, np.float64)
    paths = np.zeros((n, path_cap, 3), np.int64)
    path_len = np.zeros(n, np.int64)
    c = lambda a: a.ctypes.data_as(ctypes.c_void_p)
    lib.astar_multi_goal(
        c(trav),
        ctypes.c_int64(dx),
        ctypes.c_int64(dy),
        ctypes.c_int64(dz),
        c(start),
        c(goals),
        ctypes.c_int64(n),
        c(vs),
        c(lengths),
        c(paths),
        ctypes.c_int64(path_cap),
        c(path_len),
    )
    out_paths = [
        [tuple(p) for p in paths[g, : path_len[g]]] if path_len[g] else []
        for g in range(n)
    ]
    return out_paths, lengths.tolist()


def native_dijkstra_range(start, max_range, traversable, voxel_size):
    lib = _load()
    if lib is None:
        return None
    trav = np.ascontiguousarray(traversable.astype(np.uint8))
    dx, dy, dz = trav.shape
    start = np.ascontiguousarray(np.asarray(start, np.int64))
    vs = np.ascontiguousarray(np.asarray(voxel_size, np.float64))
    dist = np.empty(trav.size, np.float64)
    c = lambda a: a.ctypes.data_as(ctypes.c_void_p)
    lib.dijkstra_range(
        c(trav),
        ctypes.c_int64(dx),
        ctypes.c_int64(dy),
        ctypes.c_int64(dz),
        c(start),
        ctypes.c_double(max_range),
        c(vs),
        c(dist),
    )
    return dist.reshape(trav.shape)
