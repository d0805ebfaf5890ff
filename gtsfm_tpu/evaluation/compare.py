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


def compare_reconstructions(
    est: SfmData, ref: SfmData, output_dir: Optional[str] = None
) -> MetricsGroup:
    """Align est onto ref (robust Sim3 over matched cameras) and report
    the reference compare_poses metric set:

    - absolute per-camera rotation angle / translation distance /
      translation direction-angle errors (after Sim3 alignment);
    - RELATIVE rotation and translation angular errors over all matched
      camera pairs (alignment-free — the reference's headline numbers,
      compare_colmap_outputs.py:203-217);
    - pose AUC @ 1/2.5/5/10/20 deg from max(rel R err, rel U err)
      (utils/metrics.py:409-443 convention);
    - structure diff: nearest-reference-point distances of the estimated
      landmarks after the same Sim3 (scale-normalized by scene extent);
    - track-count / track-length stats.

    When output_dir is given, also writes the per-camera error table
    (per_camera_errors.csv) and a camera-centers overlay plot — the
    reference tool's CSV + plot artifacts."""
    ia, ib = match_cameras_by_name(est, ref)
    if len(ia) == 0:
        # fall back to positional matching over jointly-valid slots
        both = np.asarray(est.pose_mask) & np.asarray(ref.pose_mask)[: est.max_cameras]
        ia = ib = np.nonzero(both)[0]
    g = MetricsGroup("reconstruction_comparison")
    g.add(Metric("num_matched_cameras", len(ia)))
    g.add(Metric("num_est_cameras", int(np.asarray(est.pose_mask).sum())))
    g.add(Metric("num_ref_cameras", int(np.asarray(ref.pose_mask).sum())))
    if len(ia) < 3:
        return g
    Pa = SE3(R=est.poses.R[jnp.asarray(ia)], t=est.poses.t[jnp.asarray(ia)])
    Pb = SE3(R=ref.poses.R[jnp.asarray(ib)], t=ref.poses.t[jnp.asarray(ib)])
    sim = align_poses_sim3_robust(Pa, Pb)
    aligned = sim.transform_pose(Pa)
    rot_err = np.asarray(so3.relative_angle_deg(aligned.R, Pb.R))
    t_err = np.linalg.norm(np.asarray(aligned.t) - np.asarray(Pb.t), axis=-1)
    # absolute translation direction angle (reference
    # compute_translation_angle_metric: angle between center directions)
    ta = np.asarray(aligned.t)
    tb = np.asarray(Pb.t)
    num = np.abs(np.sum(ta * tb, axis=-1))
    den = np.linalg.norm(ta, axis=-1) * np.linalg.norm(tb, axis=-1)
    t_angle = np.degrees(np.arccos(np.clip(num / np.maximum(den, 1e-12), -1, 1)))
    g.add(Metric("rotation_error_deg", rot_err))
    g.add(Metric("translation_error", t_err))
    g.add(Metric("translation_angle_error_deg", t_angle))

    # relative (alignment-free) pair errors -> the reference's pose AUC
    from gtsfm_tpu.evaluation.metrics import (
        relative_rotation_angular_errors,
        translation_direction_errors_deg,
    )

    n = len(ia)
    pi, pj = np.triu_indices(n, k=1)
    pairs = np.stack([pi, pj], axis=1).astype(np.int64)
    if len(pairs) > 0:
        # relative rotation is invariant to the global frame; relative
        # translation DIRECTIONS are not — use the Sim3-aligned poses
        Ra = np.asarray(aligned.R)
        Rb = np.asarray(Pb.R)
        rel_rot = relative_rotation_angular_errors(Ra, Rb, pairs)
        rel_dir = translation_direction_errors_deg(
            np.asarray(aligned.t), np.asarray(Pb.t), Rb, pairs
        )
        g.add(Metric("relative_rotation_error_deg", rel_rot))
        g.add(Metric("relative_translation_angle_error_deg", rel_dir))
        pose_err = np.maximum(
            np.nan_to_num(rel_rot, nan=np.inf), np.nan_to_num(rel_dir, nan=np.inf)
        )
        for k, v in pose_auc(pose_err).items():
            g.add(Metric(k, v))

    # structure diff: est landmarks vs nearest reference landmark after
    # the same Sim3, normalized by the reference scene extent
    pa = np.asarray(est.points)[np.asarray(est.track_mask)]
    pb = np.asarray(ref.points)[np.asarray(ref.track_mask)]
    if len(pa) > 0 and len(pb) > 0:
        pa_t = np.asarray(sim.transform(jnp.asarray(pa)))
        sub = pa_t[:: max(1, len(pa_t) // 4096)][:4096]
        d2 = (
            np.sum(sub**2, axis=1)[:, None]
            + np.sum(pb**2, axis=1)[None, :]
            - 2.0 * sub @ pb.T
        )
        nn_dist = np.sqrt(np.maximum(d2.min(axis=1), 0.0))
        extent = np.linalg.norm(pb.std(axis=0)) + 1e-12
        g.add(Metric("point_nn_dist", nn_dist))
        g.add(Metric("point_nn_dist_rel_extent", nn_dist / extent))

    g.add(Metric("est_num_tracks", est.number_tracks()))
    g.add(Metric("ref_num_tracks", ref.number_tracks()))
    mean_a, med_a = est.track_length_stats()
    mean_b, med_b = ref.track_length_stats()
    g.add(Metric("est_mean_track_length", mean_a))
    g.add(Metric("ref_mean_track_length", mean_b))

    if output_dir is not None:
        _write_comparison_artifacts(
            output_dir, est, ia, rot_err, t_err, t_angle, aligned, Pb, g
        )
    return g


def _write_comparison_artifacts(output_dir, est, ia, rot_err, t_err, t_angle,
                                aligned, Pb, group: MetricsGroup) -> None:
    """Per-camera CSV + camera-centers overlay plot + metrics CSV
    (compare_colmap_outputs.py:128-143 export_metrics_group_to_csv and
    :62-126 plot_camera_centers)."""
    import csv
    import json
    import os

    os.makedirs(output_dir, exist_ok=True)
    names = (est.meta.image_names if est.meta else None) or []
    with open(os.path.join(output_dir, "per_camera_errors.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["image", "rotation_error_deg", "translation_error",
                    "translation_angle_error_deg"])
        for k, i in enumerate(ia):
            nm = names[i] if i < len(names) else str(i)
            w.writerow([nm, f"{rot_err[k]:.6f}", f"{t_err[k]:.6f}", f"{t_angle[k]:.6f}"])
    with open(os.path.join(output_dir, "comparison_metrics.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["metric_name", "value"])
        for m in group.metrics:
            if m.dist is not None:
                w.writerow([m.name, json.dumps(m.summary()[m.name], sort_keys=True)])
            else:
                w.writerow([m.name, f"{m.scalar:.6f}"])
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(7, 7))
        ax = fig.add_subplot(111, projection="3d")
        ca = np.asarray(aligned.t)
        cb = np.asarray(Pb.t)
        ax.scatter(cb[:, 0], cb[:, 1], cb[:, 2], s=12, c="tab:blue", label="reference")
        ax.scatter(ca[:, 0], ca[:, 1], ca[:, 2], s=12, c="tab:orange", label="estimated")
        ax.legend(loc="best")
        fig.savefig(os.path.join(output_dir, "camera_centers.png"), dpi=150)
        plt.close(fig)
    except Exception:
        pass  # plot is best-effort; CSVs are the artifact of record


def compare_colmap_dirs(
    est_dir: str, ref_dir: str, output_dir: Optional[str] = None
) -> MetricsGroup:
    """CLI-style entry: compare two COLMAP text exports."""
    return compare_reconstructions(
        colmap_io.read_scene(est_dir), colmap_io.read_scene(ref_dir),
        output_dir=output_dir,
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
