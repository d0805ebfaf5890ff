"""MultiViewOptimizer: the global back-end chain for one cluster.

Parity: /root/reference/gtsfm/multi_view_optimizer.py:94-239 — unpack
two-view results -> 2-pass cycle-consistency view-graph filtering ->
prune to largest connected component -> rotation averaging -> DSF track
formation -> translation averaging -> camera init -> triangulation (data
association) -> staged global bundle adjustment.

Orchestration is plain host Python; every numeric stage is a jitted
batched device computation (the gtsfm_tpu re-design of the reference's
Dask delayed-graph chain).
"""

from __future__ import annotations

import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.averaging.rotation.averaging import RotationAveraging, RotationAveragingOptions
from gtsfm_tpu.averaging.translation.averaging import (
    TranslationAveraging,
    TranslationAveragingOptions,
)
from gtsfm_tpu.bundle.ba import BAOptions, BundleAdjustment
from gtsfm_tpu.utils.numerics import ceil_pow2
from gtsfm_tpu.bundle.triangulation import TriangulationMode, triangulate_tracks
from gtsfm_tpu.common.sfm_data import SceneMeta, SfmData
from gtsfm_tpu.geometry import SE3
from gtsfm_tpu.tracks.dsf import tracks_from_matches
from gtsfm_tpu.utils.graph import largest_connected_component
from gtsfm_tpu.view_graph.cycle_consistency import (
    CycleConsistencyFilter,
    EdgeErrorAggregation,
    ViewGraphOptions,
)


class MVOOptions(NamedTuple):
    view_graph: ViewGraphOptions = ViewGraphOptions()
    run_view_graph_two_passes: bool = True  # MIN then MEDIAN (mvo.py:82-84)
    rotation: RotationAveragingOptions = RotationAveragingOptions()
    translation: TranslationAveragingOptions = TranslationAveragingOptions()
    ba: BAOptions = BAOptions(max_iterations=30, cg_iterations=40, layout="dense")
    reproj_thresholds: tuple = (10.0, 5.0, 3.0)  # staged BA schedule
    min_track_len: int = 2
    max_track_len: int = 15
    triangulation_mode: TriangulationMode = TriangulationMode.RANSAC_SAMPLE_UNIFORM
    # parity: the reference triangulates with a loose 10px threshold and
    # relies on the staged post-BA filter [10, 5, 3] (unified.yaml:95,104);
    # a tight pre-BA threshold is brittle because averaging-initialized
    # poses are only coarsely accurate
    triangulation_reproj_threshold_px: float = 10.0
    triangulation_hypotheses: int = 32
    min_triangulation_angle_deg: float = 1.0
    # camera->track direction augmentation for translation averaging
    # (averaging_1dsfm.py:333-400); 0 disables
    ta_tracks_per_camera: int = 12
    seed: int = 0


class MultiViewOptimizer:
    def __init__(self, options: MVOOptions = MVOOptions(), mesh=None):
        self.mesh = mesh
        self.options = options

    def run(
        self,
        num_images: int,
        pairs: np.ndarray,  # (E, 2)
        i2Ri1: np.ndarray,  # (E, 3, 3)
        i2Ui1: np.ndarray,  # (E, 3)
        pair_valid: np.ndarray,  # (E,)
        num_inliers: np.ndarray,  # (E,)
        corr_i1: np.ndarray,  # (E, M) keypoint indices
        corr_i2: np.ndarray,
        corr_mask: np.ndarray,  # (E, M)
        keypoints_xy: np.ndarray,  # (N, K, 2)
        cal,  # batched calibration [N]
        meta: Optional[SceneMeta] = None,
        pad_hwm: Optional[dict] = None,
    ) -> tuple:
        """-> (SfmData, metrics dict).

        pad_hwm: optional shared high-water-mark dict for the data-dependent
        pad buckets (tracks, measurements, TA augmentation). A hierarchical
        run passes one dict across all its leaves so, with leaves executed
        largest-first, every leaf shares ONE traced/compiled executable set
        per stage instead of retracing at each leaf's own bucket combo
        (measured on palace-281: ~50 s/leaf of pure jit retrace)."""
        opts = self.options

        def _bucket(key: str, raw: int, mult: int) -> int:
            v = ceil_pow2(raw, mult)
            if pad_hwm is not None:
                v = max(v, pad_hwm.get(key, 0))
                pad_hwm[key] = v
            return v
        metrics: dict = {}
        t_start = time.perf_counter()
        pairs = np.asarray(pairs, np.int64)
        edge_mask = np.asarray(pair_valid, bool).copy()
        metrics["num_input_edges"] = int(edge_mask.sum())

        # --- view-graph filtering (2-pass cycle consistency) -------------
        t0 = time.perf_counter()
        f1 = CycleConsistencyFilter(
            ViewGraphOptions(
                max_cycle_error_deg=opts.view_graph.max_cycle_error_deg,
                aggregation=EdgeErrorAggregation.MIN,
            )
        )
        edge_mask, _ = f1.run(pairs, i2Ri1, edge_mask)
        if opts.run_view_graph_two_passes:
            f2 = CycleConsistencyFilter(
                ViewGraphOptions(
                    max_cycle_error_deg=opts.view_graph.max_cycle_error_deg,
                    aggregation=EdgeErrorAggregation.MEDIAN,
                )
            )
            edge_mask, _ = f2.run(pairs, i2Ri1, edge_mask)
        metrics["num_edges_after_cycle_filter"] = int(edge_mask.sum())
        metrics["view_graph_sec"] = time.perf_counter() - t0

        # --- largest connected component ---------------------------------
        cc_mask = largest_connected_component(num_images, pairs[edge_mask])
        edge_mask &= cc_mask[pairs[:, 0]] & cc_mask[pairs[:, 1]]
        metrics["num_cameras_largest_cc"] = int(cc_mask.sum())

        if edge_mask.sum() < 1 or cc_mask.sum() < 2:
            return SfmData.empty(num_images, meta=meta), {**metrics, "failed": True}

        # --- rotation averaging ------------------------------------------
        # full edge arrays + edge_mask (NOT boolean slicing): the kept-edge
        # count is data-dependent, and slicing would give every cluster its
        # own solver shapes — full arrays keep the jit trace shape-stable
        t0 = time.perf_counter()
        ra = RotationAveraging(opts.rotation)
        wRi, rot_valid = ra.run(
            num_images, pairs, np.asarray(i2Ri1),
            num_inliers=np.asarray(num_inliers),
            edge_mask=edge_mask,
        )
        metrics["rotation_averaging_sec"] = time.perf_counter() - t0

        # --- 2D track formation (DSF) ------------------------------------
        t0 = time.perf_counter()
        cmask = np.asarray(corr_mask) & edge_mask[:, None]
        track_cam, track_kp, track_uv, track_mask = tracks_from_matches(
            pairs, corr_i1, corr_i2, cmask, np.asarray(keypoints_xy),
            min_track_len=opts.min_track_len, max_track_len=opts.max_track_len,
        )
        metrics["num_tracks_2d"] = int((track_mask.sum(1) >= 2).sum())
        metrics["dsf_sec"] = time.perf_counter() - t0

        # pow2-bucket the data-dependent track axis so triangulation/BA
        # executables are shared across clusters (hierarchical runs invoke
        # this per leaf with different track counts)
        T_raw = track_cam.shape[0]
        T_pad = _bucket("mvo_tracks", T_raw, 16)
        if T_pad != T_raw:
            padn = T_pad - T_raw

            def _padT(a, fill=0):
                out = np.full((padn,) + a.shape[1:], fill, a.dtype)
                return np.concatenate([a, out])

            track_cam = _padT(track_cam)
            track_kp = _padT(track_kp)
            track_uv = _padT(track_uv)
            track_mask = _padT(track_mask)

        # --- translation averaging ---------------------------------------
        t0 = time.perf_counter()
        ta = TranslationAveraging(opts.translation)
        track_dirs = None
        if opts.ta_tracks_per_camera > 0:
            from gtsfm_tpu.averaging.translation.averaging import (
                camera_track_directions,
                select_tracks_for_coverage,
            )

            sel = select_tracks_for_coverage(
                track_cam, track_mask, num_images, opts.ta_tracks_per_camera
            )
            if len(sel) >= 3:
                cams_d, nodes_d, dirs_d = camera_track_directions(
                    wRi, cal, track_cam, track_uv, track_mask, sel
                )
                # pad the direction-augmentation axis to pow2 with
                # weight-0 entries anchored to a sentinel node so the TA
                # solve shape is bucket-stable across clusters
                S_pad = _bucket("ta_sel", len(sel), 8)
                A_raw = len(cams_d)
                A_pad = _bucket("ta_aug", A_raw + 1, 8)
                padn = A_pad - A_raw
                cams_d = np.concatenate([cams_d, np.zeros(padn, np.int32)])
                nodes_d = np.concatenate(
                    [nodes_d, np.full(padn, S_pad - 1, np.int32)]
                )
                dirs_d = np.concatenate(
                    [dirs_d, np.tile(np.float32([[0, 0, 1]]), (padn, 1))]
                )
                wts_d = np.concatenate(
                    [np.ones(A_raw, np.float32), np.zeros(padn, np.float32)]
                )
                track_dirs = (cams_d, nodes_d, dirs_d, wts_d)
        wti, trans_valid, ta_inlier_mask = ta.run(
            num_images, pairs, np.asarray(i2Ui1), wRi,
            edge_mask=edge_mask, seed=opts.seed, track_dirs=track_dirs,
        )
        metrics["translation_averaging_sec"] = time.perf_counter() - t0
        metrics["num_edges_after_1dsfm"] = int(ta_inlier_mask.sum())

        cam_valid = rot_valid & trans_valid
        metrics["num_cameras_estimated"] = int(cam_valid.sum())
        if cam_valid.sum() < 2:
            return SfmData.empty(num_images, meta=meta), {**metrics, "failed": True}

        poses = SE3(R=jnp.asarray(wRi, jnp.float32), t=jnp.asarray(wti, jnp.float32))

        # --- triangulation (data association) ----------------------------
        t0 = time.perf_counter()
        # drop observations from cameras without poses
        track_mask = track_mask & cam_valid[track_cam]
        key = jax.random.PRNGKey(opts.seed)
        points, tri_inliers, tri_ok = triangulate_tracks(
            poses, cal,
            jnp.asarray(track_cam), jnp.asarray(track_uv), jnp.asarray(track_mask),
            key,
            reproj_threshold_px=opts.triangulation_reproj_threshold_px,
            num_hypotheses=opts.triangulation_hypotheses,
            mode=opts.triangulation_mode,
            min_triangulation_angle_deg=opts.min_triangulation_angle_deg,
        )
        points = np.asarray(points)
        tri_inliers = np.asarray(tri_inliers) & track_mask
        tri_ok = np.asarray(tri_ok) & (tri_inliers.sum(1) >= opts.min_track_len)
        metrics["num_tracks_triangulated"] = int(tri_ok.sum())
        metrics["triangulation_sec"] = time.perf_counter() - t0

        # --- assemble SfmData --------------------------------------------
        T = len(points)
        obs_t, obs_k = np.nonzero(tri_inliers & tri_ok[:, None])
        meas_cam = track_cam[obs_t, obs_k].astype(np.int32)
        meas_kp = track_kp[obs_t, obs_k].astype(np.int32)
        meas_uv = track_uv[obs_t, obs_k]
        meas_track = obs_t.astype(np.int32)
        M_raw = len(obs_t)
        # pow2-bucket the measurement axis (see track padding above) —
        # padding rows carry meas_mask False and contribute exact zeros
        M_pad = _bucket("mvo_meas", M_raw, 16)
        padn = M_pad - M_raw
        meas_cam = np.concatenate([meas_cam, np.zeros(padn, np.int32)])
        meas_track = np.concatenate([meas_track, np.zeros(padn, np.int32)])
        meas_uv = np.concatenate(
            [meas_uv.astype(np.float32), np.zeros((padn, 2), np.float32)]
        )
        meas_mask = np.concatenate([np.ones(M_raw, bool), np.zeros(padn, bool)])
        data = SfmData(
            poses=poses,
            cal=cal,
            pose_mask=jnp.asarray(cam_valid),
            points=jnp.asarray(points, jnp.float32),
            track_mask=jnp.asarray(tri_ok),
            meas_cam=jnp.asarray(meas_cam),
            meas_track=jnp.asarray(meas_track),
            meas_uv=jnp.asarray(meas_uv, jnp.float32),
            meas_mask=jnp.asarray(meas_mask),
            meta=meta,
        )
        if len(obs_t) == 0:
            return data, {**metrics, "failed": True}

        # --- staged global bundle adjustment -----------------------------
        t0 = time.perf_counter()
        ba = BundleAdjustment(opts.ba, mesh=self.mesh)
        # gauge: freeze the two estimated cameras with most measurements
        counts = np.bincount(meas_cam[meas_mask], minlength=num_images) * cam_valid
        anchors = np.argsort(-counts)[:1]
        fixed = np.zeros(num_images, bool)
        fixed[anchors] = True
        data, ba_metrics = ba.run_staged(
            data, reproj_thresholds=opts.reproj_thresholds,
            fixed_cam=jnp.asarray(fixed),
        )
        metrics["ba_sec"] = time.perf_counter() - t0
        metrics["ba_stages"] = ba_metrics
        metrics["num_tracks_final"] = data.number_tracks()
        metrics["num_measurements_final"] = data.number_measurements()
        mean_len, med_len = data.track_length_stats()
        metrics["mean_track_length"] = mean_len
        metrics["median_track_length"] = med_len
        err = np.asarray(data.reprojection_errors())
        msk = np.asarray(data.meas_mask)
        if msk.any():
            metrics["reproj_error_median_px"] = float(np.median(err[msk]))
            metrics["reproj_error_mean_px"] = float(np.mean(err[msk][np.isfinite(err[msk])]))
        metrics["total_sec"] = time.perf_counter() - t_start
        # aux arrays for hierarchical merging: per-measurement keypoint ids
        # let (image, keypoint) -> track lookups across clusters
        metrics["aux"] = {
            "meas_kp": meas_kp,  # (M_raw,) unpadded
            "meas_cam": np.asarray(meas_cam[:M_raw]),
            "meas_track": np.asarray(obs_t.astype(np.int32)),
        }
        return data, metrics
