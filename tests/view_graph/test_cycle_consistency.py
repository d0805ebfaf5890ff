import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import so3
from gtsfm_tpu.utils.graph import extract_triplets, largest_connected_component
from gtsfm_tpu.view_graph.cycle_consistency import (
    CycleConsistencyFilter,
    EdgeErrorAggregation,
    ViewGraphOptions,
)


def _consistent_graph(n=6, seed=0):
    wRi = np.asarray(so3.random(jax.random.PRNGKey(seed), (n,)))
    edges = np.array([(i, j) for i in range(n) for j in range(i + 1, n)], np.int64)
    i2Ri1 = np.einsum("eij,eik->ejk", wRi[edges[:, 1]], wRi[edges[:, 0]])
    return wRi, edges, i2Ri1.astype(np.float32)


def test_extract_triplets():
    edges = np.array([[0, 1], [1, 2], [0, 2], [2, 3]], np.int64)
    tri = extract_triplets(edges)
    assert tri.tolist() == [[0, 1, 2]]


def test_largest_cc():
    edges = np.array([[0, 1], [1, 2], [4, 5]], np.int64)
    mask = largest_connected_component(6, edges)
    assert mask.tolist() == [True, True, True, False, False, False]


def test_consistent_graph_all_kept():
    _, edges, i2Ri1 = _consistent_graph()
    f = CycleConsistencyFilter()
    mask, errors = f.run(edges, i2Ri1)
    assert mask.all()
    assert np.nanmax(errors[np.isfinite(errors)]) < 0.1


def test_corrupted_edge_rejected():
    _, edges, i2Ri1 = _consistent_graph(n=6, seed=1)
    bad_edge = 3
    i2Ri1 = i2Ri1.copy()
    i2Ri1[bad_edge] = np.asarray(so3.random(jax.random.PRNGKey(9)))
    f = CycleConsistencyFilter(ViewGraphOptions(aggregation=EdgeErrorAggregation.MEDIAN))
    mask, errors = f.run(edges, i2Ri1)
    assert not mask[bad_edge]
    # with MEDIAN aggregation on a dense graph, only the bad edge dies
    assert mask.sum() == len(edges) - 1


def test_edge_without_triplet_rejected():
    # path graph: no triangles at all
    edges = np.array([[0, 1], [1, 2], [2, 3]], np.int64)
    R = np.tile(np.eye(3, dtype=np.float32), (3, 1, 1))
    f = CycleConsistencyFilter()
    mask, errors = f.run(edges, R)
    assert not mask.any()
    assert np.isinf(errors).all()


def test_two_pass_min_then_median():
    _, edges, i2Ri1 = _consistent_graph(n=7, seed=2)
    i2Ri1 = i2Ri1.copy()
    i2Ri1[0] = np.asarray(so3.random(jax.random.PRNGKey(5)))
    pass1 = CycleConsistencyFilter(ViewGraphOptions(aggregation=EdgeErrorAggregation.MIN))
    mask1, _ = pass1.run(edges, i2Ri1)
    pass2 = CycleConsistencyFilter(ViewGraphOptions(aggregation=EdgeErrorAggregation.MEDIAN))
    mask2, _ = pass2.run(edges, i2Ri1, edge_mask=mask1)
    assert not mask2[0]
    assert mask2.sum() >= len(edges) - 2
