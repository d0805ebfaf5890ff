"""Metrics containers + pose/geometry metric computations.

Parity: /root/reference/gtsfm/evaluation/metrics.py:30-358 (GtsfmMetric /
GtsfmMetricsGroup with summary stats + JSON round-trip) and
/root/reference/gtsfm/utils/metrics.py:409-443,722 (pose AUC @ 1/2.5/5/10/20
deg), :445 (BA pose error metrics).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import SE3, so3
from gtsfm_tpu.geometry.sim3 import align_poses_sim3_robust

POSE_AUC_THRESHOLDS_DEG = (1.0, 2.5, 5.0, 10.0, 20.0)


class Metric:
    """Scalar or 1D-distribution metric with auto summary stats."""

    def __init__(self, name: str, data):
        self.name = name
        arr = np.asarray(data, dtype=np.float64)
        if arr.ndim == 0:
            self.scalar = float(arr)
            self.dist = None
        else:
            self.scalar = None
            self.dist = arr

    def summary(self) -> dict:
        if self.dist is None:
            return {self.name: self.scalar}
        d = self.dist[np.isfinite(self.dist)]
        if d.size == 0:
            return {self.name: {"count": 0}}
        return {
            self.name: {
                "count": int(d.size),
                "min": float(d.min()),
                "max": float(d.max()),
                "mean": float(d.mean()),
                "median": float(np.median(d)),
                "stddev": float(d.std()),
                "quartiles": [float(q) for q in np.percentile(d, [0, 25, 50, 75, 100])],
            }
        }

    def to_dict(self) -> dict:
        if self.dist is None:
            return {self.name: self.scalar}
        return {self.name: {"summary": self.summary()[self.name],
                            "full_data": self.dist.tolist()}}


class MetricsGroup:
    def __init__(self, name: str, metrics: Optional[Sequence[Metric]] = None):
        self.name = name
        self.metrics = list(metrics or [])

    def add(self, metric: Metric):
        self.metrics.append(metric)

    def to_dict(self) -> dict:
        out = {}
        for m in self.metrics:
            out.update(m.to_dict())
        return {self.name: out}

    def save_json(self, dirpath: str):
        os.makedirs(dirpath, exist_ok=True)
        with open(os.path.join(dirpath, f"{self.name}.json"), "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def from_json(cls, path: str) -> "MetricsGroup":
        with open(path) as f:
            d = json.load(f)
        name = list(d.keys())[0]
        g = cls(name)
        for k, v in d[name].items():
            if isinstance(v, dict) and "full_data" in v:
                g.add(Metric(k, v["full_data"]))
            else:
                g.add(Metric(k, v))
        return g


def pose_auc(errors_deg: np.ndarray, thresholds_deg=POSE_AUC_THRESHOLDS_DEG) -> dict:
    """AUC of the pose-error recall curve at each threshold.

    Parity: /root/reference/gtsfm/utils/metrics.py:409-443 (SuperGlue
    convention: trapezoidal area of recall vs error up to threshold).
    """
    errs = np.sort(np.asarray(errors_deg, np.float64))
    errs = errs[np.isfinite(errs)]
    n = len(errs)
    out = {}
    if n == 0:
        return {f"pose_auc_@{t}_deg": 0.0 for t in thresholds_deg}
    recall = (np.arange(n) + 1) / n
    e = np.concatenate([[0.0], errs])
    r = np.concatenate([[0.0], recall])
    for t in thresholds_deg:
        last = np.searchsorted(e, t)
        rr = np.concatenate([r[:last], [r[min(last, len(r) - 1)]]])
        ee = np.concatenate([e[:last], [t]])
        out[f"pose_auc_@{t}_deg"] = float(np.trapezoid(rr, ee) / t)
    return out


def relative_pose_errors(
    wTi_est: SE3, wTi_gt: SE3, mask: np.ndarray
) -> tuple:
    """Per-camera rotation (deg) and translation (deg-of-direction + abs)
    errors after robust Sim3 alignment of est onto GT.

    Parity: compute_ba_pose_metrics (/root/reference/gtsfm/utils/metrics.py:445).
    Returns (rot_err_deg (N,), trans_err (N,), est->GT Sim3) — the Sim3 is
    returned (not pre-applied poses) so callers can transform the whole
    scene (poses AND points) consistently via SfmData.transform.
    """
    sim = align_poses_sim3_robust(wTi_est, wTi_gt, mask=jnp.asarray(mask))
    aligned = sim.transform_pose(wTi_est)
    rot_err = np.asarray(so3.relative_angle_deg(aligned.R, wTi_gt.R))
    t_err = np.linalg.norm(np.asarray(aligned.t) - np.asarray(wTi_gt.t), axis=-1)
    rot_err = np.where(mask, rot_err, np.inf)
    t_err = np.where(mask, t_err, np.inf)
    return rot_err, t_err, sim


def relative_rotation_angular_errors(wRi_est, wRi_gt, pairs) -> np.ndarray:
    """Angular error of relative rotations over given pairs (deg)."""
    i1, i2 = pairs[:, 0], pairs[:, 1]
    rel_est = np.einsum("eji,ejk->eik", np.asarray(wRi_est)[i2], np.asarray(wRi_est)[i1])
    rel_gt = np.einsum("eji,ejk->eik", np.asarray(wRi_gt)[i2], np.asarray(wRi_gt)[i1])
    return np.asarray(so3.relative_angle_deg(jnp.asarray(rel_est), jnp.asarray(rel_gt)))


def translation_direction_errors_deg(wti_est, wti_gt, wRi_gt, pairs) -> np.ndarray:
    """Angular error between estimated and GT relative translation
    directions per pair (deg) — the U error of the reference's pose error
    max(R_err, U_err) (two_view_estimator.py:734-843)."""
    i1, i2 = pairs[:, 0], pairs[:, 1]
    d_est = np.asarray(wti_est)[i1] - np.asarray(wti_est)[i2]
    d_gt = np.asarray(wti_gt)[i1] - np.asarray(wti_gt)[i2]
    num = np.abs(np.sum(d_est * d_gt, axis=-1))
    den = np.linalg.norm(d_est, axis=-1) * np.linalg.norm(d_gt, axis=-1)
    return np.degrees(np.arccos(np.clip(num / np.maximum(den, 1e-12), -1.0, 1.0)))


def intrinsics_error_metrics(est_cal, gt_cal, valid_mask=None) -> "MetricsGroup":
    """Per-camera intrinsics errors vs GT: focal absolute/percentage error
    and radial distortion k1/k2 absolute errors when the model carries them.

    Parity: /root/reference/gtsfm/utils/metrics.py:523-578
    (compute_intrinsics_metrics)."""
    fx_est = np.atleast_1d(np.asarray(est_cal.fx, np.float64))
    fx_gt = np.atleast_1d(np.asarray(gt_cal.fx, np.float64))
    if valid_mask is None:
        valid_mask = np.ones(fx_est.shape[0], bool)
    m = np.asarray(valid_mask)
    abs_err = np.abs(fx_est - fx_gt)[m]
    with np.errstate(divide="ignore", invalid="ignore"):
        pct = np.where(fx_gt > 0, np.abs(fx_est - fx_gt) / np.maximum(fx_gt, 1e-12) * 100.0, np.nan)[m]
    g = MetricsGroup(
        "intrinsics_metrics",
        [Metric("focal_length_error_px", abs_err),
         Metric("focal_length_error_pct", pct[np.isfinite(pct)])],
    )
    for k in ("k1", "k2"):
        if hasattr(est_cal, k) and hasattr(gt_cal, k):
            e = np.abs(np.atleast_1d(np.asarray(getattr(est_cal, k), np.float64))
                       - np.atleast_1d(np.asarray(getattr(gt_cal, k), np.float64)))[m]
            g.add(Metric(f"{k}_error", e))
    return g


def precision_recall_from_errors(
    positive_errors, negative_errors, max_positive_error: float
) -> tuple:
    """Precision/recall when predictions are split into accepted (positive)
    and rejected (negative) sets and correctness = error <= threshold.

    Parity: /root/reference/gtsfm/utils/metrics.py:607-630
    (get_precision_recall_from_errors)."""
    pos = np.asarray(list(positive_errors), np.float64)
    neg = np.asarray(list(negative_errors), np.float64)
    tp = float(np.sum(pos <= max_positive_error)) if pos.size else 0.0
    fp = float(np.sum(pos > max_positive_error)) if pos.size else 0.0
    fn = float(np.sum(neg <= max_positive_error)) if neg.size else 0.0
    eps = 1e-12
    return tp / (tp + fp + eps), tp / (tp + fn + eps)
