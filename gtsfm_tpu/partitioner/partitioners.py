"""Graph partitioners: scene decomposition into a cluster tree.

Parity: /root/reference/gtsfm/graph_partitioner/ —
SinglePartitioner (single_partitioner.py:17), BinaryTreePartitioner
(binary_tree_partitioner.py:25-60, recursive METIS-ordered 2-way split to
depth/target size), MetisPartitioner (metis_partitioner.py:32-80, GTSAM
symbolic Bayes tree cliques under METIS ordering).

TPU-native stance: partitioning is a host-side O(E) graph computation that
shapes the device workload. The 2-way split here is spectral (Fiedler
vector of the visibility-graph Laplacian via scipy sparse eigsh) with
balanced rounding — the same fill-reducing flavor METIS provides, without
vendoring METIS C. Edges cut by a split become the parent's local edges,
which is exactly what the hierarchical Sim3 merge consumes.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.sparse
import scipy.sparse.linalg

from gtsfm_tpu.products.types import ClusterTree, VisibilityGraph, make_visibility_graph


class SinglePartitioner:
    """Whole graph = one leaf."""

    def run(self, graph: VisibilityGraph) -> ClusterTree:
        return ClusterTree(value=np.asarray(graph, np.int32).reshape(-1, 2))


def _fiedler_split(nodes: np.ndarray, edges: np.ndarray, weights: np.ndarray):
    """2-way balanced spectral split of the subgraph on `nodes`.

    Returns (mask_a over nodes, ok) — ok False when the graph is too small
    or eigensolve fails (caller falls back to no split)."""
    n = len(nodes)
    if n < 4:
        return None, False
    idx = {v: k for k, v in enumerate(nodes)}
    r = np.array([idx[a] for a in edges[:, 0]])
    c = np.array([idx[b] for b in edges[:, 1]])
    w = np.asarray(weights, np.float64)
    A = scipy.sparse.coo_matrix((np.concatenate([w, w]), (np.concatenate([r, c]), np.concatenate([c, r]))), shape=(n, n)).tocsr()
    d = np.asarray(A.sum(axis=1)).reshape(-1)
    L = scipy.sparse.diags(d) - A
    try:
        # smallest two eigenpairs; Fiedler = second
        vals, vecs = scipy.sparse.linalg.eigsh(L, k=2, sigma=-1e-6, which="LM")
        fiedler = vecs[:, np.argsort(vals)[1]]
    except Exception:
        return None, False
    order = np.argsort(fiedler)
    mask = np.zeros(n, bool)
    mask[order[: n // 2]] = True  # balanced split at the median
    return mask, True


class BinaryTreePartitioner:
    """Recursive balanced 2-way spectral splits.

    Stops when a cluster has <= max_cluster_size cameras or depth is
    reached. Cut edges live at the parent (the merge overlap)."""

    def __init__(self, max_depth: int = 4, max_cluster_size: int = 40):
        self.max_depth = max_depth
        self.max_cluster_size = max_cluster_size

    def run(self, graph: VisibilityGraph, edge_weights: Optional[np.ndarray] = None) -> ClusterTree:
        edges = np.asarray(graph, np.int32).reshape(-1, 2)
        if edge_weights is None:
            edge_weights = np.ones(len(edges), np.float64)
        return self._split(edges, np.asarray(edge_weights, np.float64), depth=0)

    def _split(self, edges: np.ndarray, weights: np.ndarray, depth: int) -> ClusterTree:
        nodes = np.unique(edges.reshape(-1)) if len(edges) else np.zeros(0, np.int64)
        if depth >= self.max_depth or len(nodes) <= self.max_cluster_size or len(edges) < 4:
            return ClusterTree(value=edges)
        mask, ok = _fiedler_split(nodes, edges, weights)
        if not ok:
            return ClusterTree(value=edges)
        side = dict(zip(nodes.tolist(), mask.tolist()))
        in_a = np.array([side[a] and side[b] for a, b in edges])
        in_b = np.array([(not side[a]) and (not side[b]) for a, b in edges])
        cut = ~(in_a | in_b)
        if in_a.sum() < 2 or in_b.sum() < 2:
            return ClusterTree(value=edges)
        child_a = self._split(edges[in_a], weights[in_a], depth + 1)
        child_b = self._split(edges[in_b], weights[in_b], depth + 1)
        return ClusterTree(value=edges[cut], children=[child_a, child_b])


# ---- native multilevel (METIS-class) partitioner ---------------------------

_METIS_LIB = None


def _load_metis():
    global _METIS_LIB
    if _METIS_LIB is None:
        import ctypes
        import os

        from gtsfm_tpu.native.build import ensure_built

        so = ensure_built("libmetis_lite.so")
        if so is None:
            raise OSError("libmetis_lite.so missing and no C++ toolchain to build it")
        lib = ctypes.CDLL(so)
        lib.metis_bisect.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_int8),
        ]
        lib.metis_bisect.restype = None
        _METIS_LIB = lib
    return _METIS_LIB


def metis_bisect(
    num_nodes: int, edges: np.ndarray, weights: Optional[np.ndarray] = None,
    balance_tol: float = 0.1,
) -> np.ndarray:
    """Balanced 2-way cut of an undirected graph via the native multilevel
    partitioner (heavy-edge-matching coarsening + greedy growing + FM
    refinement — the METIS algorithm family, gtsfm_tpu/native/metis.cpp).

    Returns int8[num_nodes] side labels (0/1). Deterministic.
    """
    import ctypes

    lib = _load_metis()
    edges = np.ascontiguousarray(np.asarray(edges, np.int64).reshape(-1, 2))
    u = np.ascontiguousarray(edges[:, 0])
    v = np.ascontiguousarray(edges[:, 1])
    if weights is None:
        wp = ctypes.POINTER(ctypes.c_double)()
    else:
        weights = np.ascontiguousarray(np.asarray(weights, np.float64))
        wp = weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    out = np.zeros(num_nodes, np.int8)
    lib.metis_bisect(
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        wp,
        ctypes.c_int64(len(edges)),
        ctypes.c_int64(num_nodes),
        ctypes.c_double(balance_tol),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    return out


class MetisPartitioner:
    """Recursive multilevel bisection into a cluster tree.

    Parity: graph_partitioner/metis_partitioner.py:32-80 (GTSAM symbolic
    Bayes tree under METIS ordering with max-camera constraints). Here the
    same METIS machinery — multilevel KL/FM bisection — runs natively
    (C++, libmetis_lite.so) and the tree is built by recursive bisection:
    cut edges become the parent's local edges (the merge overlap), exactly
    what the hierarchical Sim3 merge consumes. Falls back to spectral
    splits if the native library is unavailable.
    """

    def __init__(self, max_depth: int = 6, max_cluster_size: int = 40,
                 balance_tol: float = 0.1):
        self.max_depth = max_depth
        self.max_cluster_size = max_cluster_size
        self.balance_tol = balance_tol

    def run(self, graph: VisibilityGraph, edge_weights: Optional[np.ndarray] = None) -> ClusterTree:
        edges = np.asarray(graph, np.int32).reshape(-1, 2)
        if edge_weights is None:
            edge_weights = np.ones(len(edges), np.float64)
        try:
            _load_metis()
        except OSError:
            return BinaryTreePartitioner(self.max_depth, self.max_cluster_size).run(
                graph, edge_weights
            )
        return self._split(edges, np.asarray(edge_weights, np.float64), depth=0)

    def _split(self, edges: np.ndarray, weights: np.ndarray, depth: int) -> ClusterTree:
        nodes = np.unique(edges.reshape(-1)) if len(edges) else np.zeros(0, np.int64)
        if depth >= self.max_depth or len(nodes) <= self.max_cluster_size or len(edges) < 4:
            return ClusterTree(value=edges)
        remap = {v: k for k, v in enumerate(nodes.tolist())}
        local = np.array([[remap[a], remap[b]] for a, b in edges], np.int64)
        side = metis_bisect(len(nodes), local, weights, self.balance_tol)
        side_of = dict(zip(nodes.tolist(), side.tolist()))
        in_a = np.array([side_of[a] == 0 and side_of[b] == 0 for a, b in edges])
        in_b = np.array([side_of[a] == 1 and side_of[b] == 1 for a, b in edges])
        cut = ~(in_a | in_b)
        if in_a.sum() < 2 or in_b.sum() < 2:
            return ClusterTree(value=edges)
        child_a = self._split(edges[in_a], weights[in_a], depth + 1)
        child_b = self._split(edges[in_b], weights[in_b], depth + 1)
        return ClusterTree(value=edges[cut], children=[child_a, child_b])
