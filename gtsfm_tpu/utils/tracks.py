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


def tracks_from_sfm_data(data, gt_poses: SE3, max_obs_per_track: int = 12,
                         reproj_threshold_px: float = 3.0):
    """classify_tracks_by_gt over an SfmData's flat measurement arrays.

    Converts the (M,) meas_cam/meas_track/meas_uv layout into track-major
    (T, K) arrays (K = max_obs_per_track, extra observations dropped) and
    classifies every valid track against the GT cameras. Returns
    (correct bool (T_valid,), per-obs errors (T_valid, K))."""
    mm = np.asarray(data.meas_mask)
    mc = np.asarray(data.meas_cam)[mm]
    mt = np.asarray(data.meas_track)[mm]
    uv = np.asarray(data.meas_uv)[mm]
    tmask = np.asarray(data.track_mask)
    valid_tracks = np.flatnonzero(tmask)
    remap = np.full(len(tmask), -1, np.int64)
    remap[valid_tracks] = np.arange(len(valid_tracks))
    T, K = len(valid_tracks), max_obs_per_track
    track_cam = np.zeros((T, K), np.int32)
    track_uv = np.zeros((T, K, 2), np.float32)
    track_m = np.zeros((T, K), bool)
    fill = np.zeros(T, np.int32)
    for m in range(len(mc)):
        t = remap[mt[m]]
        if t < 0 or fill[t] >= K:
            continue
        track_cam[t, fill[t]] = mc[m]
        track_uv[t, fill[t]] = uv[m]
        track_m[t, fill[t]] = True
        fill[t] += 1
    return classify_tracks_by_gt(
        gt_poses, data.cal, track_cam, track_uv, track_m,
        reproj_threshold_px=reproj_threshold_px,
    )
