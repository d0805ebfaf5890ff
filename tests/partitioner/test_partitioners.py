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
