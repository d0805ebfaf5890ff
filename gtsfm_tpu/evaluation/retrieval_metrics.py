"""Retrieval quality metrics.

Parity: /root/reference/gtsfm/evaluation/retrieval_metrics.py:18
(similarity-score vs GT-pose-error scatter + stats) and merge_reports.py
(combining metric groups from multiple runs/clusters).
"""

from __future__ import annotations

import numpy as np

from gtsfm_tpu.evaluation.metrics import Metric, MetricsGroup
from gtsfm_tpu.geometry import SE3, so3


def retrieval_metrics(
    pairs: np.ndarray,
    similarity_matrix: np.ndarray,
    gt_poses: SE3,
) -> MetricsGroup:
    """Per-retrieved-pair similarity scores + GT relative rotation angle —
    how well scores correlate with viewpoint proximity."""
    import jax.numpy as jnp

    R = np.asarray(gt_poses.R)
    i1, i2 = pairs[:, 0], pairs[:, 1]
    rel = np.einsum("eji,ejk->eik", R[i2], R[i1])
    angles = np.asarray(so3.angle_rad(jnp.asarray(rel))) * 180 / np.pi
    scores = similarity_matrix[i1, i2]
    g = MetricsGroup("retrieval_metrics")
    g.add(Metric("num_retrieved_pairs", len(pairs)))
    g.add(Metric("similarity_scores", scores))
    g.add(Metric("gt_relative_rotation_deg", angles))
    if len(scores) > 2:
        corr = np.corrcoef(scores, -angles)[0, 1]
        g.add(Metric("score_vs_proximity_correlation", float(corr)))
    return g


def merge_metrics_groups(groups: list, name: str) -> MetricsGroup:
    """Concatenate same-named distribution metrics across groups (parity:
    merge_reports.py — combining cluster/run reports)."""
    merged = MetricsGroup(name)
    by_metric: dict = {}
    for g in groups:
        for m in g.metrics:
            by_metric.setdefault(m.name, []).append(m)
    for mname, ms in by_metric.items():
        dists = [m.dist for m in ms if m.dist is not None]
        if dists:
            merged.add(Metric(mname, np.concatenate(dists)))
        else:
            vals = [m.scalar for m in ms if m.scalar is not None]
            merged.add(Metric(mname, float(np.mean(vals))))
    return merged
