import numpy as np

from gtsfm_tpu.partitioner.partitioners import BinaryTreePartitioner, SinglePartitioner
from gtsfm_tpu.products.types import ClusterTree, make_visibility_graph


def _two_blob_graph(n_per=10, cross=2, seed=0):
    """Two dense blobs weakly connected — an obvious 2-way partition."""
    rng = np.random.default_rng(seed)
    pairs = []
    for base in (0, n_per):
        for i in range(n_per):
            for j in range(i + 1, n_per):
                if rng.uniform() < 0.7:
                    pairs.append((base + i, base + j))
    for k in range(cross):
        pairs.append((k, n_per + k))
    return make_visibility_graph(pairs)


def test_single_partitioner():
    g = _two_blob_graph()
    tree = SinglePartitioner().run(g)
    assert tree.is_leaf
    assert len(tree.value) == len(g)


def test_binary_partitioner_splits_blobs():
    g = _two_blob_graph()
    tree = BinaryTreePartitioner(max_depth=1, max_cluster_size=12).run(g)
    assert len(tree.children) == 2
    keys_a = set(tree.children[0].all_keys().tolist())
    keys_b = set(tree.children[1].all_keys().tolist())
    assert not keys_a & keys_b
    # each child is (mostly) one blob
    blob0 = set(range(10))
    frac_a = len(keys_a & blob0) / max(len(keys_a), 1)
    assert frac_a > 0.9 or frac_a < 0.1
    # cut edges live at the parent and connect the two children
    for a, b in tree.value:
        assert (a in keys_a) != (b in keys_a)
    # no edges lost
    assert len(tree.all_edges()) == len(g)


def test_binary_partitioner_respects_max_size():
    g = _two_blob_graph(n_per=16)
    tree = BinaryTreePartitioner(max_depth=4, max_cluster_size=10).run(g)
    for leaf in tree.leaves():
        assert len(leaf.local_keys()) <= 16  # blobs of 16 may be unsplittable further


def test_small_graph_stays_leaf():
    g = make_visibility_graph([(0, 1), (1, 2)])
    tree = BinaryTreePartitioner().run(g)
    assert tree.is_leaf


def test_postorder_fold():
    g = _two_blob_graph()
    tree = BinaryTreePartitioner(max_depth=1, max_cluster_size=5).run(g)

    def count(node, child_results):
        return 1 + sum(child_results)

    assert tree.map_postorder(count) == tree.num_nodes()


def test_metis_bisect_finds_bridge_cut():
    """Native multilevel bisection must separate two dense communities
    joined by a thin bridge, with a balanced, near-minimal cut."""
    from gtsfm_tpu.partitioner.partitioners import metis_bisect

    g = _two_blob_graph(n_per=10, cross=2)
    edges = np.asarray(g, np.int64)
    side = metis_bisect(20, edges)
    assert set(np.unique(side).tolist()) == {0, 1}
    # balance: 10/10 (tol 0.1 of 20 -> 8..12 per side)
    assert 8 <= (side == 0).sum() <= 12
    cut = (side[edges[:, 0]] != side[edges[:, 1]]).sum()
    assert cut <= 4, cut  # the 2 bridge edges (+slack)
    # one blob per side
    assert len(set(side[:10].tolist())) == 1 and side[0] != side[10]


def test_metis_bisect_deterministic_and_weighted():
    from gtsfm_tpu.partitioner.partitioners import metis_bisect

    g = _two_blob_graph(n_per=12, cross=3, seed=3)
    edges = np.asarray(g, np.int64)
    s1 = metis_bisect(24, edges)
    s2 = metis_bisect(24, edges)
    np.testing.assert_array_equal(s1, s2)
    # heavy bridge edges flip the optimal cut: weight the 3 cross edges
    # enormously and the blob split must no longer cut them
    w = np.ones(len(edges))
    cross_mask = (edges[:, 0] < 12) != (edges[:, 1] < 12)
    w[cross_mask] = 1000.0
    s3 = metis_bisect(24, edges, w)
    cut_w = w[(s3[edges[:, 0]] != s3[edges[:, 1]])].sum()
    assert cut_w < 1000.0  # no heavy edge crosses the cut


def test_metis_partitioner_tree_invariants():
    from gtsfm_tpu.partitioner.partitioners import MetisPartitioner

    rng = np.random.default_rng(7)
    # random geometric-ish graph over 120 nodes
    pts = rng.uniform(0, 1, (120, 2))
    pairs = []
    for i in range(120):
        for j in range(i + 1, 120):
            if np.linalg.norm(pts[i] - pts[j]) < 0.18:
                pairs.append((i, j))
    g = make_visibility_graph(pairs)
    tree = MetisPartitioner(max_depth=5, max_cluster_size=30).run(g)
    assert not tree.is_leaf
    for leaf in tree.leaves():
        assert len(leaf.local_keys()) <= 60  # bounded leaves
    # every input edge appears exactly once in the tree
    all_e = tree.all_edges()
    assert len(all_e) == len(g)
    assert len({tuple(e) for e in np.asarray(all_e).tolist()}) == len(g)


def test_metis_vs_spectral_cut_quality():
    """The multilevel cut should be at least as good as (or close to) the
    spectral stand-in on a community graph."""
    from gtsfm_tpu.partitioner.partitioners import (
        MetisPartitioner,
        metis_bisect,
        _fiedler_split,
    )

    g = _two_blob_graph(n_per=14, cross=2, seed=5)
    edges = np.asarray(g, np.int64)
    nodes = np.unique(edges.reshape(-1))
    side = metis_bisect(len(nodes), edges)
    cut_m = (side[edges[:, 0]] != side[edges[:, 1]]).sum()
    mask, ok = _fiedler_split(nodes, edges, np.ones(len(edges)))
    assert ok
    side_s = mask[np.searchsorted(nodes, edges)]
    cut_s = (side_s[:, 0] != side_s[:, 1]).sum()
    assert cut_m <= max(cut_s, 2) + 2
