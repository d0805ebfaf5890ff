"""Partitioner validation on the REAL palace-fine-arts-281 visibility
structure mounted at /root/reference/tests/data/palace/ (VERDICT r2 #8).

The reference produced this dataset with its METIS Bayes-tree partitioner
(graph_partitioner/metis_partitioner.py:32-80); its pickled ClusterTree
(13 nodes, leaves of 20-55 cameras) is the sanity anchor for cluster
count / size / overlap statistics. The native C++ multilevel partitioner
must decompose the same 281-camera / 4139-edge graph into a comparable
tree: full camera coverage, no lost edges, bounded leaves.
"""

import csv
import os
import pickle

import numpy as np
import pytest

PALACE = "/root/reference/tests/data/palace"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(PALACE), reason="reference palace data not mounted"
)


def _load_palace_graph():
    edges = []
    with open(os.path.join(PALACE, "visibility_graph.csv")) as f:
        for row in csv.DictReader(f):
            i, j = int(row["i"]), int(row["j"])
            edges.append((min(i, j), max(i, j)))
    return sorted(set(edges))


class _StubTree:
    """Minimal stand-in for the reference's ClusterTree pickle payload."""

    def __setstate__(self, state):
        self.__dict__.update(state)


class _RefUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if name == "ClusterTree":
            return _StubTree
        return super().find_class(module, name)  # pragma: no cover


def _ref_tree_stats():
    with open(os.path.join(PALACE, "cluster_tree.pkl"), "rb") as f:
        t = _RefUnpickler(f).load()
    leaves, nodes = [], []

    def walk(n):
        nodes.append(n)
        kids = getattr(n, "children", [])
        if not kids:
            cams = {a for e in (n.value or []) for a in e}
            leaves.append(len(cams))
        for c in kids:
            walk(c)

    walk(t)
    return {"n_nodes": len(nodes), "n_leaves": len(leaves), "leaf_sizes": leaves}


def test_palace_graph_loads():
    edges = _load_palace_graph()
    cams = {a for e in edges for a in e}
    assert len(edges) >= 4000
    assert len(cams) == 281
    assert max(cams) == 280


def test_metis_partitioner_on_palace_281():
    from gtsfm_tpu.partitioner.partitioners import MetisPartitioner
    from gtsfm_tpu.products.types import make_visibility_graph

    edges = _load_palace_graph()
    graph = make_visibility_graph(edges)
    ref = _ref_tree_stats()

    part = MetisPartitioner(max_cluster_size=55)
    tree = part.run(graph)

    # every camera appears somewhere; no edge is lost
    all_edges = {tuple(e) for e in np.asarray(tree.all_edges()).reshape(-1, 2)}
    assert all_edges == set(edges)
    cams = {a for e in all_edges for a in e}
    assert len(cams) == 281

    leaves = tree.leaves()
    leaf_sizes = [len(lf.local_keys()) for lf in leaves]
    assert len(leaves) >= 2
    # comparable decomposition scale to the reference's pickled tree
    # (reference: 8 leaves of 20-55 cams over 13 nodes)
    assert len(leaves) <= 4 * ref["n_leaves"]
    assert max(leaf_sizes) <= 120  # bounded leaves (merge-BA tractable)
    assert float(np.mean(leaf_sizes)) >= 10  # not shattered into dust

    # overlap structure: parents hold the cut edges (the merge overlap),
    # mirroring the reference's Bayes-tree separator design
    def count_parent_edges(n):
        if n.is_leaf:
            return 0
        return len(n.value) + sum(count_parent_edges(c) for c in n.children)

    assert count_parent_edges(tree) > 0


def test_similarity_retriever_on_palace_matrix():
    """The mounted 281x281 NetVLAD similarity matrix drives the similarity
    retriever: top-K pairs must substantially overlap the visibility graph
    the reference derived from it."""
    from gtsfm_tpu.retriever.retrievers import pairs_from_similarity_matrix

    sim_rows = []
    with open(os.path.join(PALACE, "netvlad_similarity_matrix.txt")) as f:
        for line in f:
            vals = [float(v) for v in line.strip().rstrip(",").split(",")]
            sim_rows.append(vals)
    S = np.asarray(sim_rows, np.float64)
    assert S.shape == (281, 281)
    S = np.where(np.isfinite(S), S, 0.0)
    S = np.maximum(S, S.T)  # stored upper-triangular

    pairs = pairs_from_similarity_matrix(S, num_matched=15, min_score=0.3)
    got = {tuple(sorted(p)) for p in np.asarray(pairs).reshape(-1, 2).tolist()}
    ref_edges = set(_load_palace_graph())
    inter = len(got & ref_edges)
    assert inter / max(len(got), 1) > 0.5, (len(got), inter)
