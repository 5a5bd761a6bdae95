"""ctypes loader for the native host-graph runtime.

Compiles graph_native.cpp with g++ -O3 on first use (cached next to the
source); every entry point has a numpy fallback, so the package works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "graph_native.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _so_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(_HERE, f"_graph_native_{digest}.so")


def load() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _so_path()
        if not os.path.exists(so):
            try:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", "-pthread", _SRC, "-o", so],
                    check=True, capture_output=True, timeout=120)
            except Exception as exc:  # no toolchain -> numpy fallback
                logging.info("native build unavailable (%s); using "
                             "numpy fallbacks", exc)
                return None
        lib = ctypes.CDLL(so)
        i64 = ctypes.c_int64
        p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C")
        p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C")
        p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C")
        p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C")
        lib.build_csr.argtypes = [i64, i64, p_i32, p_i32, p_i64, p_i32,
                                  p_i64]
        lib.clustering_coeff.argtypes = [i64, p_i64, p_i32, p_f64]
        lib.ego_sizes.argtypes = [i64, i64, p_i64, p_i32, i64, p_i64,
                                  p_i64]
        lib.ego_fill.argtypes = [i64, i64, p_i64, p_i32, i64, p_i32,
                                 p_i32, p_i64]
        lib.pack_csr_count.argtypes = [i64, i64, p_i32, i64, i64, i64]
        lib.pack_csr_count.restype = i64
        lib.pack_csr_fill.argtypes = [i64, i64, p_i32, p_i32, p_f32,
                                      i64, i64, i64, i64, p_i32, p_f32,
                                      p_i32, p_i32]
        lib.betweenness.argtypes = [i64, p_i64, p_i32, i64, p_f64]
        lib.multi_bfs.argtypes = [i64, p_i64, p_i32, i64, p_i64, i64,
                                  i64, p_i32]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


# ------------------------------------------------------------------ API

def build_csr(major: np.ndarray, minor: np.ndarray, n: int
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(indptr, indices, order): CSR over `major` with the stable edge
    permutation for carrying weights."""
    lib = load()
    e = len(major)
    major = np.ascontiguousarray(major, np.int32)
    minor = np.ascontiguousarray(minor, np.int32)
    if lib is None:
        order = np.argsort(major, kind="stable")
        indices = minor[order]
        indptr = np.zeros(n + 1, np.int64)
        np.add.at(indptr, major + 1, 1)
        return np.cumsum(indptr), indices, order
    indptr = np.empty(n + 1, np.int64)
    indices = np.empty(e, np.int32)
    order = np.empty(e, np.int64)
    lib.build_csr(n, e, major, minor, indptr, indices, order)
    return indptr, indices, order


def clustering_coefficient(senders: np.ndarray, receivers: np.ndarray,
                           n: int) -> np.ndarray:
    lib = load()
    if lib is None:
        from graphgym_tpu.data.hostgraph import HostGraph
        from graphgym_tpu.data import structure as st
        g = HostGraph(n, np.stack([
            np.asarray(senders, np.int32),
            np.asarray(receivers, np.int32)]))
        return st.clustering_coefficient(g)
    indptr, indices, _ = build_csr(np.asarray(senders, np.int32),
                                   np.asarray(receivers, np.int32), n)
    out = np.empty(n, np.float64)
    lib.clustering_coeff(n, indptr, indices, out)
    return out


def betweenness_centrality(senders: np.ndarray, receivers: np.ndarray,
                           n: int) -> Optional[np.ndarray]:
    """Multi-threaded Brandes betweenness (normalized, undirected);
    None when the native lib is unavailable."""
    lib = load()
    if lib is None:
        return None
    indptr, indices, _ = build_csr(np.asarray(senders, np.int32),
                                   np.asarray(receivers, np.int32), n)
    out = np.empty(n, np.float64)
    threads = min(os.cpu_count() or 1, 8)
    lib.betweenness(n, indptr, np.ascontiguousarray(indices, np.int32),
                    threads, out)
    return out


def multi_source_bfs(senders: np.ndarray, receivers: np.ndarray,
                     n: int, sources: np.ndarray,
                     max_dist: int = -1) -> Optional[np.ndarray]:
    """dist [S, N] int32 (-1 unreachable), threaded over sources;
    None when the native lib is unavailable."""
    lib = load()
    if lib is None:
        return None
    indptr, indices, _ = build_csr(np.asarray(senders, np.int32),
                                   np.asarray(receivers, np.int32), n)
    sources = np.ascontiguousarray(sources, np.int64)
    out = np.empty((len(sources), n), np.int32)
    threads = min(os.cpu_count() or 1, 8)
    lib.multi_bfs(n, indptr, np.ascontiguousarray(indices, np.int32),
                  len(sources), sources, max_dist, threads,
                  out.reshape(-1))
    return out


def ego_union(senders: np.ndarray, receivers: np.ndarray, n: int,
              radius: int):
    """(union_senders, union_receivers, orig_of, num_union_nodes) — the
    relabeled disjoint-union of all radius-r ego-nets (reference
    transform.py:11-39)."""
    lib = load()
    if lib is None:
        return None
    senders = np.ascontiguousarray(senders, np.int32)
    receivers = np.ascontiguousarray(receivers, np.int32)
    e = len(senders)
    indptr, indices, _ = build_csr(senders, receivers, n)
    node_counts = np.empty(n, np.int64)
    edge_counts = np.empty(n, np.int64)
    lib.ego_sizes(n, e, indptr, indices, radius, node_counts,
                  edge_counts)
    total_nodes = int(n + (node_counts - 1).sum())
    total_edges = int(edge_counts.sum())
    us = np.empty(total_edges, np.int32)
    ur = np.empty(total_edges, np.int32)
    orig_of = np.empty(total_nodes, np.int64)
    lib.ego_fill(n, e, indptr, indices, radius, us, ur, orig_of)
    return us, ur, orig_of, total_nodes


def pack_csr_arrays(senders: np.ndarray, receivers: np.ndarray,
                    weights: np.ndarray, num_nodes: int, R: int, C: int,
                    G: int = 1):
    """Native version of ops.pallas.spmm_kernel.pack_csr's inner loops;
    returns (senders[NC,C], weights[NC,C], local[NC,C], tiles[NC]) or
    None when the native lib is unavailable.  G > 1 row-aligns slot
    groups for the kernel's VPU pre-reduction."""
    lib = load()
    if lib is None:
        return None
    order = np.argsort(receivers, kind="stable")
    s_s = np.ascontiguousarray(senders[order], np.int32)
    r_s = np.ascontiguousarray(receivers[order], np.int32)
    w_s = np.ascontiguousarray(weights[order], np.float32)
    e = len(s_s)
    nc = int(lib.pack_csr_count(num_nodes, e, r_s, R, C, G))
    out_s = np.empty((nc, C), np.int32)
    out_w = np.empty((nc, C), np.float32)
    out_l = np.empty((nc, C), np.int32)
    out_t = np.empty(nc, np.int32)
    lib.pack_csr_fill(num_nodes, e, s_s, r_s, w_s, R, C, G, nc,
                      out_s.reshape(-1), out_w.reshape(-1),
                      out_l.reshape(-1), out_t)
    return out_s, out_w, out_l, out_t
