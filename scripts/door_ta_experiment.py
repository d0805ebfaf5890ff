"""Replay the Door pipeline tail (TA -> triangulation -> BA) from a
door_bisect dump under different translation-averaging settings, to test
whether the round-4 1DSfM change moved the final AUC. CPU-only, fast."""

from __future__ import annotations

import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from gtsfm_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp

from gtsfm_tpu.averaging.translation.averaging import (
    TranslationAveraging,
    TranslationAveragingOptions,
    camera_track_directions,
    select_tracks_for_coverage,
)
from gtsfm_tpu.bundle.ba import BundleAdjustment
from gtsfm_tpu.bundle.triangulation import triangulate_tracks
from gtsfm_tpu.common.sfm_data import SfmData
from gtsfm_tpu.evaluation.compare import compare_reconstructions
from gtsfm_tpu.geometry import SE3
from gtsfm_tpu.loader.base import batch_calibrations
from gtsfm_tpu.loader.olsson import OlssonLoader
from gtsfm_tpu.scene.mvo import MVOOptions
from gtsfm_tpu.tracks.dsf import tracks_from_matches
from gtsfm_tpu.utils.numerics import ceil_pow2

DOOR = "/root/reference/tests/data/set1_lund_door"


def tail(dump, ta_opts, mvo=MVOOptions(), label=""):
    loader = OlssonLoader(DOOR, max_resolution=480)
    n = len(loader)
    cal = batch_calibrations(loader.get_all_intrinsics())
    gt_poses = loader.get_gt_poses()
    pairs64 = np.stack(np.triu_indices(n, 1), 1).astype(np.int64)
    kp_xy = dump["kp_xy"]
    edge_mask = dump["edge_mask"].astype(bool)
    wRi, rot_valid = dump["wRi"], dump["rot_valid"].astype(bool)
    i2Ui1 = dump["tv_i2Ui1"]
    cmask = dump["tv_corr_mask"].astype(bool) & edge_mask[:, None]
    track_cam, track_kp, track_uv, track_mask = tracks_from_matches(
        pairs64, dump["tv_corr_i1"], dump["tv_corr_i2"], cmask, kp_xy,
        min_track_len=mvo.min_track_len, max_track_len=mvo.max_track_len,
    )
    T_pad = ceil_pow2(track_cam.shape[0], 16)
    if T_pad != track_cam.shape[0]:
        padn = T_pad - track_cam.shape[0]

        def _p(a, fill=0):
            return np.concatenate([a, np.full((padn,) + a.shape[1:], fill, a.dtype)])

        track_cam, track_kp, track_uv, track_mask = map(_p, (track_cam, track_kp, track_uv, track_mask))

    ta = TranslationAveraging(ta_opts)
    track_dirs = None
    if mvo.ta_tracks_per_camera > 0:
        sel = select_tracks_for_coverage(track_cam, track_mask, n, mvo.ta_tracks_per_camera)
        if len(sel) >= 3:
            cams_d, nodes_d, dirs_d = camera_track_directions(
                wRi, cal, track_cam, track_uv, track_mask, sel
            )
            S_pad = ceil_pow2(len(sel), 8)
            A_raw = len(cams_d)
            A_pad = ceil_pow2(A_raw + 1, 8)
            padn = A_pad - A_raw
            cams_d = np.concatenate([cams_d, np.zeros(padn, np.int32)])
            nodes_d = np.concatenate([nodes_d, np.full(padn, S_pad - 1, np.int32)])
            dirs_d = np.concatenate([dirs_d, np.tile(np.float32([[0, 0, 1]]), (padn, 1))])
            wts_d = np.concatenate([np.ones(A_raw, np.float32), np.zeros(padn, np.float32)])
            track_dirs = (cams_d, nodes_d, dirs_d, wts_d)
    wti, trans_valid, ta_inl = ta.run(
        n, pairs64[edge_mask], i2Ui1[edge_mask], wRi, seed=mvo.seed, track_dirs=track_dirs
    )
    cam_valid = rot_valid & trans_valid
    poses = SE3(R=jnp.asarray(wRi, jnp.float32), t=jnp.asarray(np.asarray(wti), jnp.float32))
    track_mask2 = track_mask & cam_valid[track_cam]
    key = jax.random.PRNGKey(mvo.seed)
    points, tri_inliers, tri_ok = triangulate_tracks(
        poses, cal, jnp.asarray(track_cam), jnp.asarray(track_uv), jnp.asarray(track_mask2), key,
        reproj_threshold_px=mvo.triangulation_reproj_threshold_px,
        num_hypotheses=mvo.triangulation_hypotheses,
        mode=mvo.triangulation_mode,
        min_triangulation_angle_deg=mvo.min_triangulation_angle_deg,
    )
    points = np.asarray(points)
    tri_inliers = np.asarray(tri_inliers) & track_mask2
    tri_ok = np.asarray(tri_ok) & (tri_inliers.sum(1) >= mvo.min_track_len)
    obs_t, obs_k = np.nonzero(tri_inliers & tri_ok[:, None])
    meas_cam = track_cam[obs_t, obs_k].astype(np.int32)
    meas_uv = track_uv[obs_t, obs_k]
    M_raw = len(obs_t)
    M_pad = ceil_pow2(M_raw, 16)
    padn = M_pad - M_raw
    meas_cam = np.concatenate([meas_cam, np.zeros(padn, np.int32)])
    meas_track = np.concatenate([obs_t.astype(np.int32), np.zeros(padn, np.int32)])
    meas_uv = np.concatenate([meas_uv.astype(np.float32), np.zeros((padn, 2), np.float32)])
    meas_mask = np.concatenate([np.ones(M_raw, bool), np.zeros(padn, bool)])
    data = SfmData(
        poses=poses, cal=cal, pose_mask=jnp.asarray(cam_valid),
        points=jnp.asarray(points, jnp.float32), track_mask=jnp.asarray(tri_ok),
        meas_cam=jnp.asarray(meas_cam), meas_track=jnp.asarray(meas_track),
        meas_uv=jnp.asarray(meas_uv, jnp.float32), meas_mask=jnp.asarray(meas_mask),
    )
    ba = BundleAdjustment(mvo.ba)
    counts = np.bincount(meas_cam[meas_mask], minlength=n) * cam_valid
    fixed = np.zeros(n, bool)
    fixed[np.argsort(-counts)[:1]] = True
    data, _ = ba.run_staged(data, reproj_thresholds=mvo.reproj_thresholds,
                            fixed_cam=jnp.asarray(fixed))
    g = compare_reconstructions(data, data.replace(poses=gt_poses))
    auc = {m.name: m.scalar for m in g.metrics if m.dist is None}["pose_auc_@5.0_deg"]
    print(f"[{label:26s}] ta_inliers={int(np.asarray(ta_inl).sum())} "
          f"cams={int(cam_valid.sum())} AUC@5={auc:.4f}")
    return auc


if __name__ == "__main__":
    dump = dict(np.load(sys.argv[1] if len(sys.argv) > 1 else "/tmp/door_cpu.npz"))
    tail(dump, TranslationAveragingOptions(), label="HEAD huber=0.1")
    tail(dump, TranslationAveragingOptions(robust_huber=0.013),
         label="huber=0.013 (ref parity)")
    tail(dump, TranslationAveragingOptions(robust_huber=0.013, reject_outliers=False),
         label="huber=0.013, no reject")
    tail(dump, TranslationAveragingOptions(robust_huber=0.03), label="huber=0.03")
    tail(dump, TranslationAveragingOptions(robust_huber=0.013, refine_iterations=60),
         label="huber=0.013, 60 iters")
