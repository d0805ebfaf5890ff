"""Synthetic correspondence generation from ground truth.

Parity: /root/reference/gtsfm/frontend/correspondence_generator/
synthetic_correspondence_generator.py:36 (sample a GT surface, project into
cameras, emit noise-free correspondences) — the reference's strategy for
validating the full back-end without a learned front-end
(configs/synthetic_front_end.yaml).

Here the GT surface is either an explicit point set (e.g. an MVS cloud or
mesh vertices) or points sampled inside the GT cameras' view frustum.
Outputs use the batched pair-pipeline currency (padded keypoints per image,
per-pair correspondence indices), so the synthetic front-end slots into
MultiViewOptimizer / HierarchicalReconstruction unchanged.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import SE3, PinholeCamera
from gtsfm_tpu.utils.overlap_frustums import points_in_view


class SyntheticOptions(NamedTuple):
    num_points: int = 500
    noise_px: float = 0.0
    outlier_fraction: float = 0.0
    seed: int = 0


class SyntheticCorrespondenceGenerator:
    # scene_optimizer routes generators with this marker through the
    # GT-driven synthetic path instead of the image-matcher path
    requires_gt = True

    def __init__(self, options: SyntheticOptions = SyntheticOptions()):
        self.options = options

    def generate(
        self,
        gt_poses: SE3,  # [N]
        cal,  # batched calibration [N]
        pairs: np.ndarray,  # (E, 2)
        image_sizes,  # list of (w, h)
        surface_points: Optional[np.ndarray] = None,
    ) -> dict:
        """-> dict with keypoints_xy (N, K, 2), kp_mask (N, K), and per-pair
        corr_i1/corr_i2/corr_mask (E, K) + i2Ri1/i2Ui1/valid from GT."""
        opts = self.options
        rng = np.random.default_rng(opts.seed)
        n = gt_poses.t.shape[0]
        K = opts.num_points

        if surface_points is None:
            # sample points in front of the camera ring: around the centroid
            # of look-at directions
            centers = np.asarray(gt_poses.t)
            fwd = np.asarray(gt_poses.R)[:, :, 2]
            target = (centers + fwd * np.linalg.norm(np.ptp(centers, 0)) * 0.8).mean(0)
            spread = max(np.ptp(centers, axis=0).max() * 0.4, 1.0)
            surface_points = target + rng.uniform(-spread, spread, (K, 3))
        pts = np.asarray(surface_points[:K], np.float32)
        K = len(pts)

        # ONE vmapped projection for all cameras: the per-camera eager
        # project/in_frustum chain cost ~5 device dispatches per camera
        # (~100 s at 281 cameras over a remote-TPU tunnel)
        uv_all, z_all = jax.jit(
            jax.vmap(
                lambda pose, cal_i: PinholeCamera(pose=pose, cal=cal_i).project(
                    jnp.asarray(pts)
                )
            )
        )(gt_poses, cal)
        uv = np.asarray(uv_all)
        z = np.asarray(z_all)
        kp_mask = points_in_view(uv, z, np.asarray(image_sizes, np.float32))
        if opts.noise_px > 0:
            uv = uv + rng.normal(0, opts.noise_px, uv.shape).astype(np.float32)
        kp_xy = uv.astype(np.float32)

        E = len(pairs)
        corr_i1 = np.tile(np.arange(K, dtype=np.int32), (E, 1))
        corr_i2 = corr_i1.copy()
        corr_mask = np.zeros((E, K), bool)
        R = np.asarray(gt_poses.R)
        t = np.asarray(gt_poses.t)
        i2Ri1 = np.zeros((E, 3, 3), np.float32)
        i2Ui1 = np.zeros((E, 3), np.float32)
        for e, (i1, i2) in enumerate(pairs):
            vis = kp_mask[i1] & kp_mask[i2]
            if opts.outlier_fraction > 0:
                flip = rng.uniform(size=K) < opts.outlier_fraction
                corr_i2[e, flip] = rng.integers(0, K, flip.sum())
            corr_mask[e] = vis
            i2Ri1[e] = R[i2].T @ R[i1]
            d = R[i2].T @ (t[i1] - t[i2])
            i2Ui1[e] = d / max(np.linalg.norm(d), 1e-12)
        valid = corr_mask.sum(axis=1) >= 8
        return {
            "keypoints_xy": kp_xy,
            "kp_mask": kp_mask,
            "corr_i1": corr_i1,
            "corr_i2": corr_i2,
            "corr_mask": corr_mask,
            "i2Ri1": i2Ri1,
            "i2Ui1": i2Ui1,
            "valid": valid,
            "num_inliers": corr_mask.sum(axis=1).astype(np.int32),
            "points": pts,
        }
