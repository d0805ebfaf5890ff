"""Ellipsoid (PCA) axis alignment of a reconstruction.

Parity: /root/reference/gtsfm/utils/ellipsoid.py (152 LoC): rotate the
scene so the principal axes of the point cloud align with the world axes
and the centroid sits at the origin — the reference applies this after
GT alignment fails / for visualization (cluster_mvo.py:474-495).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.common.sfm_data import SfmData
from gtsfm_tpu.geometry.sim3 import Sim3


def get_alignment_transform(points: np.ndarray) -> Sim3:
    """Sim3 (unit scale) mapping the cloud to centered, axis-aligned pose."""
    pts = np.asarray(points, np.float64)
    center = pts.mean(axis=0)
    d = pts - center
    cov = d.T @ d / max(len(pts) - 1, 1)
    vals, vecs = np.linalg.eigh(cov)
    # order axes by decreasing variance; right-handed
    order = np.argsort(-vals)
    R = vecs[:, order].T
    if np.linalg.det(R) < 0:
        R[2] *= -1
    return Sim3(
        R=jnp.asarray(R, jnp.float32),
        t=jnp.asarray(-R @ center, jnp.float32),
        s=jnp.asarray(np.float32(1.0)),
    )


def align_scene_to_axes(data: SfmData) -> SfmData:
    tm = np.asarray(data.track_mask)
    pts = np.asarray(data.points)[tm]
    if len(pts) < 3:
        return data
    return data.transform(get_alignment_transform(pts))
