"""Two-view estimation reports + front-end metric aggregation vs GT.

Parity: /root/reference/gtsfm/common/two_view_estimation_report.py and the
aggregation in two_view_estimator.py:663-843: per-pair rotation/direction
errors vs GT, pose error = max(R_err, U_err) (SuperGlue convention),
success counts at a threshold, inlier-ratio statistics.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.evaluation.metrics import Metric, MetricsGroup
from gtsfm_tpu.geometry import SE3, so3


@dataclasses.dataclass
class TwoViewEstimationReport:
    """Per-pair report record (host-side)."""

    i1: int
    i2: int
    num_matches: int
    num_inliers: int
    inlier_ratio: float
    valid: bool
    R_error_deg: Optional[float] = None
    U_error_deg: Optional[float] = None

    @property
    def pose_error_deg(self) -> Optional[float]:
        if self.R_error_deg is None or self.U_error_deg is None:
            return None
        return max(self.R_error_deg, self.U_error_deg)


def make_reports(pairs: np.ndarray, tvr: dict, gt_poses: Optional[SE3]) -> list:
    """Build per-pair reports; with GT poses, include R/U angular errors."""
    reports = []
    R_err = U_err = None
    if gt_poses is not None:
        R = np.asarray(gt_poses.R)
        t = np.asarray(gt_poses.t)
        i1 = pairs[:, 0]
        i2 = pairs[:, 1]
        gt_rel = np.einsum("eji,ejk->eik", R[i2], R[i1])
        R_err = np.asarray(
            so3.relative_angle_deg(jnp.asarray(gt_rel), jnp.asarray(tvr["i2Ri1"]))
        )
        d_gt = np.einsum("eji,ej->ei", R[i2], t[i1] - t[i2])
        nrm = np.linalg.norm(d_gt, axis=-1)
        d_gt = d_gt / np.maximum(nrm[:, None], 1e-12)
        dot = np.abs(np.sum(d_gt * np.asarray(tvr["i2Ui1"]), axis=-1))
        U_err = np.degrees(np.arccos(np.clip(dot, -1, 1)))
        # pairs with ~zero GT baseline have undefined direction
        U_err = np.where(nrm < 1e-6, 0.0, U_err)
    for e, (a, b) in enumerate(pairs):
        reports.append(
            TwoViewEstimationReport(
                i1=int(a), i2=int(b),
                num_matches=int(tvr["num_matches"][e]),
                num_inliers=int(tvr["num_inliers"][e]),
                inlier_ratio=float(tvr["inlier_ratio"][e]),
                valid=bool(tvr["valid"][e]),
                R_error_deg=float(R_err[e]) if R_err is not None else None,
                U_error_deg=float(U_err[e]) if U_err is not None else None,
            )
        )
    return reports


def aggregate_frontend_metrics(
    reports: list, angular_err_threshold_deg: float = 5.0
) -> MetricsGroup:
    """Parity: two_view_estimator.aggregate_frontend_metrics (:734-843)."""
    valid = [r for r in reports if r.valid]
    g = MetricsGroup("verifier_summary")
    g.add(Metric("num_total_image_pairs", len(reports)))
    g.add(Metric("num_valid_image_pairs", len(valid)))
    if valid and valid[0].R_error_deg is not None:
        R_errs = np.array([r.R_error_deg for r in valid])
        U_errs = np.array([r.U_error_deg for r in valid])
        pose_errs = np.maximum(R_errs, U_errs)
        th = angular_err_threshold_deg
        g.add(Metric("rotation_success_count", int((R_errs < th).sum())))
        g.add(Metric("translation_success_count", int((U_errs < th).sum())))
        g.add(Metric("pose_success_count", int((pose_errs < th).sum())))
        g.add(Metric("rotation_angular_errors_deg", R_errs))
        g.add(Metric("translation_angular_errors_deg", U_errs))
        g.add(Metric("pose_errors_deg", pose_errs))
    if valid:
        g.add(Metric("inlier_ratio_per_pair", np.array([r.inlier_ratio for r in valid])))
        g.add(Metric("num_inliers_per_pair", np.array([r.num_inliers for r in valid])))
    # precision/recall of the accept decision: a pair the verifier accepted
    # counts as correct when its GT pose error <= threshold (parity:
    # utils/metrics.py:607-630 applied to the verifier split)
    rejected = [r for r in reports if not r.valid]
    if valid and valid[0].R_error_deg is not None:
        from gtsfm_tpu.evaluation.metrics import precision_recall_from_errors

        pos = [max(r.R_error_deg, r.U_error_deg) for r in valid]
        neg = [
            max(r.R_error_deg, r.U_error_deg)
            for r in rejected
            if r.R_error_deg is not None
        ]
        precision, recall = precision_recall_from_errors(
            pos, neg, angular_err_threshold_deg
        )
        g.add(Metric("pose_precision", precision))
        g.add(Metric("pose_recall", recall))
    return g
