"""Native (C++) runtime components, loaded via ctypes.

The library is built on demand with g++ (no pybind11 in this image) and cached
by source mtime. Components (see src/tod_native.cc):
  * exact MaxCliqueDyn maximum-clique solver + DIMACS loader — API parity
    with the reference's standalone geometric core (maximum_clique.{h,cpp});
  * brute-force Hamming k-NN — the measured CPU baseline the TPU matcher is
    compared against (BASELINE.md);
  * plasm topological scheduler core (cycle detection + deterministic order).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "tod_native.cc")
_LIB = os.path.join(_DIR, "build", "libtod_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build_if_needed() -> str:
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        subprocess.run(["make", "-s", "-C", _DIR], check=True)
    return _LIB


def load() -> ctypes.CDLL:
    """Build (if stale) and load the native library; idempotent."""
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build_if_needed())
            i32p = ctypes.POINTER(ctypes.c_int32)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.tod_find_clique.restype = ctypes.c_int
            lib.tod_find_clique.argtypes = [
                ctypes.c_int, ctypes.c_int, i32p, i32p, ctypes.c_int,
                ctypes.c_long, i32p]
            lib.tod_load_dimacs.restype = ctypes.c_int
            lib.tod_load_dimacs.argtypes = [
                ctypes.c_char_p, i32p, i32p, i32p, ctypes.c_int]
            lib.tod_hamming_knn.restype = None
            lib.tod_hamming_knn.argtypes = [
                u8p, ctypes.c_int64, u8p, ctypes.c_int64, ctypes.c_int,
                ctypes.c_int, i32p, i32p]
            lib.tod_toposort.restype = ctypes.c_int
            lib.tod_toposort.argtypes = [
                ctypes.c_int, ctypes.c_int, i32p, i32p, i32p]
            _lib = lib
    return _lib


def _as_i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class Graph:
    """Exact-clique graph, API-compatible with the reference's
    maximum_clique::Graph (AddEdge/DeleteEdge/FindClique/FindMaximumClique,
    maximum_clique.h:150+). Backed by the C++ MaxCliqueDyn solver."""

    def __init__(self, n_vertices: int):
        self.n = int(n_vertices)
        self._edges: set = set()

    @classmethod
    def from_dimacs(cls, path: str) -> "Graph":
        lib = load()
        n_v = np.zeros(1, np.int32)
        n_edges = lib.tod_load_dimacs(path.encode(), _as_i32p(n_v),
                                      _as_i32p(np.zeros(0, np.int32)),
                                      _as_i32p(np.zeros(0, np.int32)), 0)
        if n_edges < 0:
            raise FileNotFoundError(path)
        eu = np.zeros(n_edges, np.int32)
        ev = np.zeros(n_edges, np.int32)
        lib.tod_load_dimacs(path.encode(), _as_i32p(n_v), _as_i32p(eu),
                            _as_i32p(ev), n_edges)
        g = cls(int(n_v[0]))
        for u, v in zip(eu.tolist(), ev.tolist()):
            g.add_edge(u, v)
        return g

    def add_edge(self, u: int, v: int) -> None:
        if u != v:
            self._edges.add((min(u, v), max(u, v)))

    def delete_edge(self, u: int, v: int) -> None:
        self._edges.discard((min(u, v), max(u, v)))

    def _edge_arrays(self) -> Tuple[np.ndarray, np.ndarray]:
        if not self._edges:
            return np.zeros(0, np.int32), np.zeros(0, np.int32)
        arr = np.asarray(sorted(self._edges), np.int32)
        return np.ascontiguousarray(arr[:, 0]), np.ascontiguousarray(arr[:, 1])

    def find_clique(self, minimal_size: int,
                    step_cap: int = 100000) -> List[int]:
        """Find a clique of at least ``minimal_size`` vertices (early exit),
        else the best found within the step budget."""
        lib = load()
        eu, ev = self._edge_arrays()
        out = np.zeros(max(self.n, 1), np.int32)
        size = lib.tod_find_clique(self.n, len(eu), _as_i32p(eu), _as_i32p(ev),
                                   int(minimal_size), int(step_cap),
                                   _as_i32p(out))
        return out[:size].tolist()

    def find_maximum_clique(self, step_cap: int = 100000) -> List[int]:
        return self.find_clique(self.n + 1, step_cap)

    # Reference-style aliases
    AddEdge = add_edge
    DeleteEdge = delete_edge
    FindMaximumClique = find_maximum_clique


def hamming_knn_cpu(query: np.ndarray, db: np.ndarray, k: int = 5,
                    n_threads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Brute-force Hamming k-NN over (N,32) uint8 descriptors on the CPU.
    Returns (idx (Q,k) int32, dist (Q,k) int32), sorted ascending."""
    lib = load()
    query = np.ascontiguousarray(query, np.uint8)
    db = np.ascontiguousarray(db, np.uint8)
    nq, ndb = len(query), len(db)
    out_idx = np.zeros((nq, k), np.int32)
    out_dist = np.zeros((nq, k), np.int32)
    if n_threads <= 0:
        n_threads = min(32, os.cpu_count() or 1)
    lib.tod_hamming_knn(
        query.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nq,
        db.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ndb, k, n_threads,
        _as_i32p(out_idx), _as_i32p(out_dist))
    return out_idx, out_dist


def toposort(n_nodes: int, edges: Sequence[Tuple[int, int]]) -> List[int]:
    """Deterministic topological order; raises on cycles."""
    lib = load()
    eu = np.asarray([e[0] for e in edges], np.int32)
    ev = np.asarray([e[1] for e in edges], np.int32)
    out = np.zeros(max(n_nodes, 1), np.int32)
    rc = lib.tod_toposort(n_nodes, len(eu), _as_i32p(eu), _as_i32p(ev),
                          _as_i32p(out))
    if rc != 0:
        raise ValueError("plasm graph has a cycle")
    return out[:n_nodes].tolist()
