"""Compare two reconstructions (COLMAP-format or SfmData).

Parity: /root/reference/gtsfm/evaluation/compare_colmap_outputs.py (262) and
compare_colmap_outputs_by_cluster.py: align two reconstructions with a
robust Sim3 on matched cameras (by image name) and report per-camera
rotation/translation errors + track statistics.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.common.sfm_data import SfmData
from gtsfm_tpu.evaluation.metrics import Metric, MetricsGroup, pose_auc
from gtsfm_tpu.geometry import SE3, so3
from gtsfm_tpu.geometry.sim3 import align_poses_sim3_robust
from gtsfm_tpu.io import colmap as colmap_io


def match_cameras_by_name(a: SfmData, b: SfmData):
    """-> (idx_a, idx_b) arrays of cameras matched by image file name."""
    names_a = (a.meta.image_names if a.meta else None) or []
    names_b = (b.meta.image_names if b.meta else None) or []
    lut = {n: i for i, n in enumerate(names_b)}
    ia, ib = [], []
    mask_a = np.asarray(a.pose_mask)
    mask_b = np.asarray(b.pose_mask)
    for i, n in enumerate(names_a):
        j = lut.get(n)
        if j is not None and i < len(mask_a) and mask_a[i] and mask_b[j]:
            ia.append(i)
            ib.append(j)
    return np.asarray(ia, np.int64), np.asarray(ib, np.int64)


def compare_reconstructions(est: SfmData, ref: SfmData) -> MetricsGroup:
    """Align est onto ref (robust Sim3 over matched cameras) and report
    per-camera errors + structure stats."""
    ia, ib = match_cameras_by_name(est, ref)
    if len(ia) == 0:
        # fall back to positional matching over jointly-valid slots
        both = np.asarray(est.pose_mask) & np.asarray(ref.pose_mask)[: est.max_cameras]
        ia = ib = np.nonzero(both)[0]
    g = MetricsGroup("reconstruction_comparison")
    g.add(Metric("num_matched_cameras", len(ia)))
    if len(ia) < 3:
        return g
    Pa = SE3(R=est.poses.R[jnp.asarray(ia)], t=est.poses.t[jnp.asarray(ia)])
    Pb = SE3(R=ref.poses.R[jnp.asarray(ib)], t=ref.poses.t[jnp.asarray(ib)])
    sim = align_poses_sim3_robust(Pa, Pb)
    aligned = sim.transform_pose(Pa)
    rot_err = np.asarray(so3.relative_angle_deg(aligned.R, Pb.R))
    t_err = np.linalg.norm(np.asarray(aligned.t) - np.asarray(Pb.t), axis=-1)
    g.add(Metric("rotation_error_deg", rot_err))
    g.add(Metric("translation_error", t_err))
    for k, v in pose_auc(rot_err).items():
        g.add(Metric(k, v))
    g.add(Metric("est_num_tracks", est.number_tracks()))
    g.add(Metric("ref_num_tracks", ref.number_tracks()))
    mean_a, med_a = est.track_length_stats()
    g.add(Metric("est_mean_track_length", mean_a))
    return g


def compare_colmap_dirs(est_dir: str, ref_dir: str) -> MetricsGroup:
    """CLI-style entry: compare two COLMAP text exports."""
    return compare_reconstructions(
        colmap_io.read_scene(est_dir), colmap_io.read_scene(ref_dir)
    )


def compare_colmap_dirs_by_cluster(est_root: str, ref_dir: str) -> list:
    """Per-cluster comparison: every COLMAP export found under est_root
    (cluster_*/ or any subdirectory containing cameras.txt, plus est_root
    itself) is aligned to the reference reconstruction independently, so
    each cluster's quality is visible before/without merging.

    Parity: /root/reference/gtsfm/evaluation/compare_colmap_outputs_by_
    cluster.py (918 LoC: walks cluster outputs, robust-aligns each to GT,
    reports per-camera rotation/translation errors per cluster).

    Returns a list of MetricsGroup, one per discovered cluster, each named
    ``reconstruction_comparison__<cluster>``."""
    import os

    ref = colmap_io.read_scene(ref_dir)
    groups = []
    candidates = []
    if os.path.exists(os.path.join(est_root, "cameras.txt")):
        candidates.append(("root", est_root))
    for name in sorted(os.listdir(est_root)):
        sub = os.path.join(est_root, name)
        if os.path.isdir(sub):
            for inner in (sub, os.path.join(sub, "ba_output")):
                if os.path.exists(os.path.join(inner, "cameras.txt")):
                    candidates.append((name, inner))
                    break
    for name, path in candidates:
        g = compare_reconstructions(colmap_io.read_scene(path), ref)
        g.name = f"reconstruction_comparison__{name}"
        groups.append(g)
    return groups
