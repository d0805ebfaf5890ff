"""Track classification against ground truth.

Parity: /root/reference/gtsfm/utils/tracks.py: classify 2D tracks as
correct / erroneous by checking whether all measurements are consistent
with one GT 3D landmark (reprojection of the GT-triangulated point).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.bundle.triangulation import triangulate_dlt
from gtsfm_tpu.geometry import SE3


def classify_tracks_by_gt(
    gt_poses: SE3,
    cal,
    track_cam: np.ndarray,  # (T, K)
    track_uv: np.ndarray,  # (T, K, 2)
    track_mask: np.ndarray,  # (T, K)
    reproj_threshold_px: float = 3.0,
):
    """Triangulate each 2D track with GT cameras; a track is 'correct' when
    every observation reprojects within threshold. Returns (correct bool
    (T,), per-obs errors (T, K))."""
    T, K = track_cam.shape
    cal_m = jax.tree.map(lambda a: a[jnp.asarray(track_cam)], cal)
    xy = cal_m.calibrate(jnp.asarray(track_uv))
    f = np.asarray(cal_m.fx)

    def one(cam_idx, xy_t, mask_t):
        poses_t = jax.tree.map(lambda a: a[cam_idx], gt_poses)
        X = triangulate_dlt(poses_t, xy_t, mask_t)
        p_cam = poses_t.transform_to(X)
        z = jnp.maximum(p_cam[..., 2], 1e-9)
        err_norm = jnp.linalg.norm(p_cam[..., :2] / z[..., None] - xy_t, axis=-1)
        return err_norm, p_cam[..., 2]

    err_norm, depth = jax.vmap(one)(
        jnp.asarray(track_cam), xy, jnp.asarray(track_mask)
    )
    err_px = np.asarray(err_norm) * f
    valid_obs = np.asarray(track_mask)
    ok_obs = (err_px < reproj_threshold_px) & (np.asarray(depth) > 0)
    correct = np.all(ok_obs | ~valid_obs, axis=1) & (valid_obs.sum(axis=1) >= 2)
    return correct, np.where(valid_obs, err_px, np.nan)
