"""Pipeline product types: visibility graph, cluster tree, per-view data.

Parity: /root/reference/gtsfm/products/ (visibility_graph.py:7-38,
cluster_tree.py:18-118, one_view_data.py:17, two_view_result.py:17).
The TwoViewResult batch type lives in gtsfm_tpu.frontend.two_view.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

# VisibilityGraph: (E, 2) int array of (i, j) pairs with i < j.
VisibilityGraph = np.ndarray


def make_visibility_graph(pairs: Sequence[Tuple[int, int]]) -> VisibilityGraph:
    """Canonicalize pairs to i < j, dedup, sort."""
    canon = {(min(i, j), max(i, j)) for i, j in pairs if i != j}
    return np.array(sorted(canon), np.int32).reshape(-1, 2)


def graph_keys(graph: VisibilityGraph) -> np.ndarray:
    """Unique node ids appearing in the graph."""
    return np.unique(np.asarray(graph).reshape(-1))


@dataclasses.dataclass
class ClusterTree:
    """Hierarchical scene decomposition: each node holds the visibility
    sub-graph of edges *local* to it; children partition deeper.

    Parity: products/cluster_tree.py:18 (ClusterTree(Tree[VisibilityGraph])
    with local_keys/all_keys/all_edges/group_by_leaf).
    """

    value: VisibilityGraph  # edges local to this node (not in any child)
    children: List["ClusterTree"] = dataclasses.field(default_factory=list)

    @property
    def is_leaf(self) -> bool:
        return not self.children

    def local_keys(self) -> np.ndarray:
        return graph_keys(self.value)

    def all_edges(self) -> VisibilityGraph:
        edges = [np.asarray(self.value).reshape(-1, 2)]
        for c in self.children:
            edges.append(c.all_edges())
        out = np.concatenate([e for e in edges if len(e)], axis=0) if any(len(e) for e in edges) else np.zeros((0, 2), np.int32)
        return make_visibility_graph([tuple(e) for e in out])

    def all_keys(self) -> np.ndarray:
        return graph_keys(self.all_edges())

    def leaves(self) -> List["ClusterTree"]:
        if self.is_leaf:
            return [self]
        out = []
        for c in self.children:
            out.extend(c.leaves())
        return out

    def num_nodes(self) -> int:
        return 1 + sum(c.num_nodes() for c in self.children)

    def map_postorder(self, fn):
        """Bottom-up fold: fn(node, child_results) -> result. This is the
        host-side analog of the reference's submit_tree_map_with_children
        (utils/tree_dask.py:101) — the dependency order of the hierarchical
        merge."""
        child_results = [c.map_postorder(fn) for c in self.children]
        return fn(self, child_results)


@dataclasses.dataclass(frozen=True)
class OneViewData:
    """Frozen per-view record. Parity: products/one_view_data.py:17-25."""

    index: int
    fname: Optional[str] = None
    intrinsics: Optional[object] = None
    absolute_pose_prior: Optional[object] = None
    gt_camera: Optional[object] = None
    gt_pose: Optional[object] = None
