"""SceneOptimizer: top-level orchestration of a full reconstruction.

Parity: /root/reference/gtsfm/scene_optimizer.py:99-440 (SceneOptimizer.run:
retriever -> correspondence/two-view stage -> graph partitioning -> per-
cluster optimization -> merging -> export + metrics). Every front-end stage
is a swappable component (detector / matcher / global descriptor), composed
by configs/config.py through frontend/registry.py — the analog of the
reference's Hydra object tree (configs/unified.yaml, runner.py:202-311).

TPU-first shape: host Python drives a sequence of jitted batched device
stages. When more than one device is visible, pair batches and BA shard
over a (data, model) jax.sharding.Mesh (parallel/sharding.py) — the
equivalent of the reference's per-pair Dask fan-out
(two_view_estimator.py:846-886). Single-cluster MVO or the partitioned/
hierarchical path via gtsfm_tpu.partitioner + gtsfm_tpu.merging.
"""

from __future__ import annotations

import os
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from contextlib import nullcontext as _nullcontext

from gtsfm_tpu.common.sfm_data import SceneMeta, SfmData
from gtsfm_tpu.evaluation.metrics import (
    Metric,
    MetricsGroup,
    pose_auc,
    relative_pose_errors,
)
from gtsfm_tpu.frontend.detectors.dog_sift import DoGSift, DoGSiftOptions
from gtsfm_tpu.frontend.two_view import TwoViewOptions, run_two_view_batch
from gtsfm_tpu.io import colmap as colmap_io
from gtsfm_tpu.loader.base import LoaderBase, batch_calibrations
from gtsfm_tpu.retriever.retrievers import SequentialRetriever
from gtsfm_tpu.scene.mvo import MVOOptions, MultiViewOptimizer
from gtsfm_tpu.utils.logger import get_logger

logger = get_logger("scene")

from functools import partial as _partial


@_partial(jax.jit, static_argnames=("opts", "use_matches"))
def _two_view_chunk_device(
    kp_xy, kp_mask, descs, cal, midx_all, mmask_all,
    i1, i2, pm, e_idx, base_key, opts, use_matches,
):
    """One two-view chunk over DEVICE-RESIDENT scene arrays: gather the
    pair batch and run it inside a single dispatch. The host sends only
    the chunk's pair indices; scene keypoints/descriptors/matches are
    uploaded once per scene (eager per-chunk gathers re-shipped the
    gathered slabs over the tunnel every chunk)."""
    kwargs = {}
    if use_matches:
        kwargs = dict(
            match_idx=midx_all[e_idx],
            match_mask=mmask_all[e_idx],
            match_score=mmask_all[e_idx].astype(jnp.float32),
        )
    return run_two_view_batch(
        kp_xy1=kp_xy[i1], kp_xy2=kp_xy[i2],
        desc1=descs[i1], desc2=descs[i2],
        kp_mask1=kp_mask[i1], kp_mask2=kp_mask[i2],
        cal1=jax.tree.map(lambda a: a[i1], cal),
        cal2=jax.tree.map(lambda a: a[i2], cal),
        pair_mask=pm,
        key=base_key,
        opts=opts,
        pair_ids=e_idx,
        **kwargs,
    )


class SceneOptimizerOptions(NamedTuple):
    detector: DoGSiftOptions = DoGSiftOptions(max_keypoints=1024)
    two_view: TwoViewOptions = TwoViewOptions()
    mvo: MVOOptions = MVOOptions()
    # pairs per two-view jit call: on a REMOTE tpu every chunk costs fixed
    # dispatch + host<->device transfer latency (~1.5 s measured over the
    # axon tunnel), so large scenes want few, fat chunks — 256 cut the
    # palace-281 two-view stage 114 s -> ~35 s at identical math
    pair_batch_size: int = 256
    image_batch_size: int = 4  # images per detector jit call
    seed: int = 0
    output_root: Optional[str] = None
    save_colmap: bool = True
    # bridge reconnection of disconnected components (scene_optimizer.py:242-262)
    reconnect_bridges: bool = True
    # hierarchical mode: partition + per-cluster MVO + Sim3 merge
    hierarchical: bool = False
    max_cluster_size: int = 40
    # optional dense / splat back-ends (the reference's --run_mvs / --run_gs)
    run_mvs: bool = False
    run_gs: bool = False
    gs_iterations: int = 800
    # interpolated camera-path fly-through of the trained splats, written
    # as a PNG frame sequence (reference renders an mp4 via gsplat+ffmpeg,
    # splat/rendering.py:102-197; the frame sequence is codec-free)
    gs_video_frames: int = 0
    mvs_num_depths: int = 64
    mvs_num_source_views: int = 4
    # "plane_sweep" (weight-free) or "patchmatchnet" (learned; requires
    # mvs_weights_path from scripts/fetch_and_verify_weights.py)
    mvs_backend: str = "plane_sweep"
    mvs_weights_path: Optional[str] = None
    # per-cluster reconstruction engine: mvo (classic front-end + back-end)
    # or a feed-forward model slot (cluster_optimizer/cluster_vggt.py:28-84,
    # cluster_fast_vggt.py, cluster_anysplat.py, configs/vggt.yaml parity)
    cluster_optimizer: str = "mvo"  # mvo | vggt | fastvggt | anysplat
    feedforward_post_ba: bool = True
    # feed-forward model slot: "compact" (weight-free architecture-class)
    # or "vggt_exact" (the checkpoint-exact port, frontend/vggt.py)
    feedforward_backbone: str = "compact"
    vggt_weights_path: Optional[str] = None
    # content-addressed disk caching of detection + two-view stages — the
    # reference's cacher wrapping (configs/unified.yaml,
    # two_view_estimator_cacher.py:21-60); a re-run replays cached stages
    use_cache: bool = False
    cache_root: Optional[str] = None
    # shard pair batches / BA over all visible devices when more than one
    use_mesh: bool = True
    # chunked load+detect: images per host-memory chunk (0 = whole scene at
    # once); bounds peak host memory to O(chunk), parity with the
    # reference's image futures (loader_base.py:363-391)
    load_chunk_size: int = 0
    # direct-correspondence mode: global keypoints per image after the
    # dedup aggregation (keypoint_aggregator_dedup.py parity)
    direct_max_keypoints: int = 2048
    # opt-in per-pair result telemetry (sqlite path) — the reference's
    # Postgres live-monitoring tables (two_view_estimator.py:105-164)
    telemetry_db: Optional[str] = None
    # with no GT to align to, rotate the scene so the point cloud's
    # principal axes align with the world axes (utils/ellipsoid.py;
    # reference wires this into the export path, cluster_mvo.py:474-495)
    axis_align_when_no_gt: bool = True


class SceneOptimizer:
    def __init__(
        self,
        options: SceneOptimizerOptions = SceneOptimizerOptions(),
        retriever=None,
        detector=None,
        matcher=None,
        global_descriptor=None,
        correspondence=None,
    ):
        """detector/matcher/global_descriptor/correspondence follow the
        registry contracts (frontend/registry.py); None selects the
        weight-free defaults (DoGSift, fused mutual-NN, tiny color-moment
        descriptor, det/desc correspondence). A non-None ``correspondence``
        is a direct image-correspondence generator (LoFTR / MASt3R / COLMAP
        — the reference's ImageCorrespondenceGenerator role): per-pair
        correspondences are aggregated into global per-image keypoints
        (KeypointAggregatorDedup) and verified with precomputed matches."""
        self.options = options
        self.retriever = retriever or SequentialRetriever()
        self.correspondence = correspondence
        if detector is None:
            from gtsfm_tpu.frontend.registry import _VmappedDetectorAdapter

            detector = _VmappedDetectorAdapter(
                DoGSift(options.detector), options.detector.max_keypoints
            )
        self.detector = detector
        self.matcher = matcher  # None = fused mutual-NN inside the two-view kernel
        self.global_descriptor = global_descriptor
        self._mesh = None
        if options.use_mesh:
            try:
                if len(jax.devices()) > 1:
                    from gtsfm_tpu.parallel.sharding import make_mesh

                    self._mesh = make_mesh()
            except RuntimeError:
                pass
        self._telemetry = None
        if options.telemetry_db:
            from gtsfm_tpu.common.telemetry import TelemetryDB

            self._telemetry = TelemetryDB(options.telemetry_db)
        self._detect_cache = None
        self._two_view_cacher = None
        self._cluster_cache = None
        if options.use_cache:
            from gtsfm_tpu.frontend.cachers import MatcherCacher
            from gtsfm_tpu.frontend.two_view_cacher import TwoViewEstimatorCacher
            from gtsfm_tpu.utils.cache import DiskCache

            self._detect_cache = DiskCache("detector", root=options.cache_root)
            self._two_view_cacher = TwoViewEstimatorCacher(
                self._run_two_view_uncached,
                options_repr=repr((options.two_view, type(self.matcher).__name__)),
                root=options.cache_root,
            )
            if self.matcher is not None:
                self.matcher = MatcherCacher(self.matcher, root=options.cache_root)
            self._cluster_cache = DiskCache("cluster", root=options.cache_root)

    # ------------------------------------------------------------------
    def run(self, loader: LoaderBase) -> tuple:
        """-> (SfmData, MetricsGroup list)."""
        from gtsfm_tpu.utils.tracing import device_trace

        with device_trace("scene_optimizer_run"):
            return self._run_impl(loader)

    def _run_impl(self, loader: LoaderBase) -> tuple:
        opts = self.options
        t_start = time.perf_counter()
        n = len(loader)
        metrics_groups = []

        # ---- feed-forward cluster optimizer (VGGT/FastVGGT/AnySplat slot,
        # cluster_vggt.py:28-84 parity): bypasses the classic front-end ----
        if opts.cluster_optimizer != "mvo":
            return self._run_feedforward(loader, t_start, metrics_groups)

        # ---- load + detect -------------------------------------------
        t0 = time.perf_counter()
        cals = loader.get_all_intrinsics()
        cal = batch_calibrations(cals)
        needs_global_descs = getattr(
            self.retriever, "__class__", type(None)
        ).__name__ in ("SimilarityRetriever", "JointSimilaritySequentialRetriever")
        needs_images_later = opts.run_mvs or opts.run_gs
        images = None
        global_descs = None
        kp_xy = kp_mask = descs = None
        direct = self.correspondence is not None
        if direct:
            # direct image-correspondence mode (MASt3R / LoFTR / COLMAP):
            # keypoints come from per-pair correspondences, not a detector;
            # detection happens after retrieval, per retrieved pair
            images, sizes = loader.load_grayscale_batch()
            if needs_global_descs:
                global_descs = self._global_descriptor().describe_batch(images)
        elif opts.load_chunk_size and not needs_images_later:
            # streaming path: load+detect(+describe) per chunk, free image
            # arrays immediately — peak host memory O(chunk), not O(scene)
            kp_xy, kp_mask, descs, global_descs, sizes = self._load_detect_chunked(
                loader, want_global_descs=needs_global_descs
            )
        else:
            images, sizes = loader.load_grayscale_batch()
            kp_xy, kp_mask, descs = self._detect_batch(images, sizes)
            if needs_global_descs:
                global_descs = self._global_descriptor().describe_batch(images)
        self._image_wh = (
            max(w for (_h, w) in sizes),
            max(h for (h, _w) in sizes),
        )
        detect_sec = time.perf_counter() - t0
        logger.info("detect+describe: %d images in %.1fs", n, detect_sec)

        # ---- retrieve pairs ------------------------------------------
        t0 = time.perf_counter()
        try:
            pairs = self.retriever.get_image_pairs(
                n, global_descriptors=global_descs, loader=loader
            )
        except TypeError:  # custom retriever without loader-filter support
            pairs = self.retriever.get_image_pairs(n, global_descriptors=global_descs)
        retriever_sec = time.perf_counter() - t0

        # ---- two-view estimation (batched over pairs) ----------------
        t0 = time.perf_counter()
        pair_matches = None
        if direct and getattr(self.correspondence, "requires_gt", False):
            # synthetic correspondence generator: noise-free matches from
            # GT geometry through the PRODUCTION two-view/back-end path
            # (synthetic_correspondence_generator.py:36 /
            # configs/synthetic_front_end.yaml parity)
            syn = self.correspondence.generate(
                loader.get_gt_poses(), cal, pairs,
                [(w, h) for (h, w) in sizes],
            )
            kp_xy = syn["keypoints_xy"]
            kp_mask = syn["kp_mask"]
            # matches stay as (E, K) arrays end-to-end — a per-pair dict
            # round trip costs two Python passes over every correspondence
            pair_matches = (syn["corr_i1"], syn["corr_i2"], syn["corr_mask"])
            descs = np.zeros((n, kp_xy.shape[1], 4), np.float32)
        elif direct:
            from gtsfm_tpu.frontend.correspondence import (
                AggregatorOptions,
                KeypointAggregatorDedup,
            )

            imgs_list = [
                np.asarray(images[i][: h, : w]) for i, (h, w) in enumerate(sizes)
            ]
            pair_corrs = self.correspondence.generate(imgs_list, pairs)
            agg = KeypointAggregatorDedup(
                AggregatorOptions(max_keypoints_per_image=opts.direct_max_keypoints)
            )
            kp_xy, kp_mask, pair_matches = agg.aggregate(n, pair_corrs)
            descs = np.zeros((n, kp_xy.shape[1], 4), np.float32)
        tvr = self._run_two_view(pairs, kp_xy, kp_mask, descs, cal,
                                 pair_matches=pair_matches)

        # bridge reconnection: if the valid graph split into islands, add
        # the most-similar cross-component pairs and estimate them too
        # (skipped in direct mode: new pairs would need new correspondences)
        if direct:
            sim_matrix = None
        else:
            sim_matrix = getattr(self.retriever, "latest_similarity_matrix", None)
        if opts.reconnect_bridges and sim_matrix is None and global_descs is not None and not direct:
            from gtsfm_tpu.retriever.retrievers import similarity_matrix as _simmat

            sim_matrix = np.asarray(_simmat(jnp.asarray(global_descs)))
        if opts.reconnect_bridges and sim_matrix is not None:
            from gtsfm_tpu.retriever.bridge import find_bridge_pairs

            bridges = find_bridge_pairs(n, pairs[tvr["valid"]], sim_matrix)
            existing = {tuple(p) for p in pairs}
            bridges = np.asarray(
                [b for b in bridges if tuple(b) not in existing], np.int32
            ).reshape(-1, 2)
            if len(bridges):
                tvr_b = self._run_two_view(bridges, kp_xy, kp_mask, descs, cal)
                pairs = np.concatenate([pairs, bridges])
                tvr = {k: np.concatenate([tvr[k], tvr_b[k]]) for k in tvr}
        frontend_sec = time.perf_counter() - t0
        logger.info(
            "two-view: %d pairs (%d valid) in %.1fs",
            len(pairs), int(tvr["valid"].sum()), frontend_sec,
        )

        fe_group = MetricsGroup(
            "frontend_summary",
            [
                Metric("num_input_images", n),
                Metric("num_pairs", len(pairs)),
                Metric("num_valid_pairs", int(tvr["valid"].sum())),
                Metric("num_inliers_per_pair", tvr["num_inliers"]),
                Metric("inlier_ratio_per_pair", tvr["inlier_ratio"]),
                Metric("detect_describe_sec", detect_sec),
                Metric("retriever_duration_sec", retriever_sec),
                Metric("two_view_sec", frontend_sec),
            ],
        )
        metrics_groups.append(fe_group)

        # per-pair two-view reports vs GT (verifier_summary parity)
        gt_for_reports = loader.get_gt_poses()
        reports = None
        if gt_for_reports is not None:
            from gtsfm_tpu.frontend.reports import aggregate_frontend_metrics, make_reports

            reports = make_reports(pairs, tvr, gt_for_reports)
            metrics_groups.append(aggregate_frontend_metrics(reports))

        # opt-in sqlite telemetry of the per-pair unit, the reference's DB
        # logging wired into two_view_estimator.py:105-164
        if self._telemetry is not None:
            if reports is None:
                from gtsfm_tpu.frontend.reports import make_reports

                reports = make_reports(pairs, tvr, gt_for_reports)
            self._telemetry.log_metadata(num_images=n, num_pairs=len(pairs))
            self._telemetry.log_two_view_results(reports)
            self._telemetry.log_stage("detect_describe", detect_sec)
            self._telemetry.log_stage("retriever", retriever_sec)
            self._telemetry.log_stage("two_view", frontend_sec)

        # retrieval quality: similarity scores vs GT viewpoint proximity
        # (evaluation/retrieval_metrics.py:18 parity) whenever a similarity
        # retriever produced a matrix and GT poses exist
        if sim_matrix is not None and gt_for_reports is not None and len(pairs):
            from gtsfm_tpu.evaluation.retrieval_metrics import retrieval_metrics

            metrics_groups.append(
                retrieval_metrics(np.asarray(pairs), np.asarray(sim_matrix), gt_for_reports)
            )

        # ---- multi-view optimization ---------------------------------
        meta = SceneMeta(
            image_names=loader.image_filenames(),
            image_sizes=[(w, h) for (h, w) in sizes],
        )
        t_mvo = time.perf_counter()
        if opts.hierarchical:
            from gtsfm_tpu.scene.hierarchical import (
                HierarchicalOptions,
                HierarchicalReconstruction,
            )

            hier = HierarchicalReconstruction(
                HierarchicalOptions(mvo=opts.mvo, max_cluster_size=opts.max_cluster_size),
                mesh=self._mesh,
                cluster_cache=self._cluster_cache,
            )
            data, mvo_metrics = hier.run(n, pairs, tvr, kp_xy, cal, meta=meta)
            self._hier_node_results = hier.node_results
        else:
            mvo = MultiViewOptimizer(opts.mvo, mesh=self._mesh)
            data, mvo_metrics = mvo.run(
                num_images=n,
                pairs=pairs,
                i2Ri1=tvr["i2Ri1"],
                i2Ui1=tvr["i2Ui1"],
                pair_valid=tvr["valid"],
                num_inliers=tvr["num_inliers"],
                corr_i1=tvr["corr_i1"],
                corr_i2=tvr["corr_i2"],
                corr_mask=tvr["corr_mask"],
                keypoints_xy=kp_xy,
                cal=cal,
                meta=meta,
            )
        mvo_metrics["backend_sec"] = time.perf_counter() - t_mvo
        logger.info(
            "back-end: %d cameras, %d tracks in %.1fs",
            data.number_images(), data.number_tracks(),
            mvo_metrics["backend_sec"],
        )
        mvo_group = MetricsGroup(
            "multiview_optimizer_metrics",
            [Metric(k, v) for k, v in mvo_metrics.items() if isinstance(v, (int, float))],
        )
        metrics_groups.append(mvo_group)

        return self._finalize(loader, data, mvo_metrics, images, metrics_groups, t_start)

    # ------------------------------------------------------------------
    def _run_feedforward(self, loader: LoaderBase, t_start, metrics_groups):
        """Feed-forward reconstruction of the whole scene through the
        VGGT-class model slot (cluster_optimizer/cluster_vggt.py:28-84,
        cluster_anysplat.py parity), then the common eval/export tail."""
        opts = self.options
        from gtsfm_tpu.scene.cluster_feedforward import (
            ClusterFastFeedforward,
            ClusterFeedforward,
            ClusterFeedforwardOptions,
        )

        t0 = time.perf_counter()
        images, sizes = loader.load_grayscale_batch()
        cal = batch_calibrations(loader.get_all_intrinsics())
        ff_opts = ClusterFeedforwardOptions(
            run_post_ba=opts.feedforward_post_ba,
            backbone=opts.feedforward_backbone,
            vggt_weights_path=opts.vggt_weights_path or "",
        )
        cls = ClusterFastFeedforward if opts.cluster_optimizer == "fastvggt" else ClusterFeedforward
        ff = cls(ff_opts)
        data, ff_metrics, (poses, depth, conf) = ff.run_raw(images, cal)
        meta = SceneMeta(
            image_names=loader.image_filenames(),
            image_sizes=[(w, h) for (h, w) in sizes],
        )
        data = data.replace(meta=meta)
        ff_metrics["feedforward_sec"] = time.perf_counter() - t0
        metrics_groups.append(
            MetricsGroup(
                "feedforward_metrics",
                [Metric(k, v) for k, v in ff_metrics.items() if isinstance(v, (int, float))],
            )
        )
        gs_init = None
        if opts.cluster_optimizer == "anysplat":
            gs_init = self._feedforward_splats(ff, images, depth, conf, cal,
                                               data.poses, ff_opts)
        return self._finalize(
            loader, data, ff_metrics, images, metrics_groups, t_start, gs_init=gs_init
        )

    # ------------------------------------------------------------------
    @staticmethod
    def _feedforward_splats(ff, images, depth, conf, cal, poses, ff_opts):
        """The anysplat slot's gaussian product. With the exact VGGT
        backbone, run the AnySplat-class per-pixel gaussian head
        (frontend/anysplat.py — an explicit re-design over the exact
        backbone; the public AnySplat source is not vendored in the
        reference). Otherwise fall back to the depth-unprojection lift."""
        from gtsfm_tpu.scene.cluster_feedforward import (
            depth_to_splats,
            pad_to_patch_grid,
        )

        if ff_opts.backbone == "vggt_exact":
            import numpy as np

            import jax.numpy as jnp

            from gtsfm_tpu.frontend.anysplat import AnySplatModel, AnySplatOptions

            padded = pad_to_patch_grid(images, ff_opts.model.patch_size)
            _, _, _, _, vggt_model = ff._run_vggt_exact(padded, cal)
            as_model = AnySplatModel.from_vggt(
                vggt_model,
                AnySplatOptions(conf_threshold=ff_opts.conf_threshold),
            )
            rgb = jnp.asarray(np.repeat(padded[..., None], 3, axis=-1), jnp.float32)
            return as_model.run(rgb)["gaussians"]
        return depth_to_splats(
            poses, depth, conf, cal, images=images,
            conf_threshold=ff_opts.conf_threshold,
        )

    # ------------------------------------------------------------------
    def _finalize(
        self, loader, data, mvo_metrics, images, metrics_groups, t_start, gs_init=None
    ):
        """Common tail: GT eval, optional MVS/splatting, metrics, export."""
        opts = self.options
        # ---- evaluation vs GT ----------------------------------------
        gt = loader.get_gt_poses()
        if (gt is None and opts.axis_align_when_no_gt and gs_init is None
                and not mvo_metrics.get("failed")):
            # no GT frame: canonicalize via PCA axis alignment of the
            # landmark cloud (cluster_mvo.py:474-495 / utils/ellipsoid.py)
            from gtsfm_tpu.utils.ellipsoid import align_scene_to_axes

            data = align_scene_to_axes(data)
        if gt is not None and not mvo_metrics.get("failed"):
            est_mask = np.asarray(data.pose_mask)
            rot_err, t_err, sim = relative_pose_errors(data.poses, gt, est_mask)
            data = data.transform(sim)  # keep whole scene (poses+points) in GT frame
            if gs_init is not None:
                # splats were predicted in the pre-alignment frame — carry
                # them through the same Sim3 (utils/transform.py parity)
                from gtsfm_tpu.splat.merge import transform_splats

                gs_init = transform_splats(gs_init, sim)
            auc = pose_auc(rot_err[est_mask])
            # the reference integration-test criterion as a live metric
            # (tests/test_gtsfm_runner_olssonloader.py:44 via
            # utils/geometry_comparisons.compare_global_poses)
            from gtsfm_tpu.utils.geometry_comparisons import compare_global_poses

            est_idx = np.flatnonzero(est_mask)
            crit = compare_global_poses(
                jax.tree.map(lambda a: a[jnp.asarray(est_idx)], data.poses),
                jax.tree.map(lambda a: a[jnp.asarray(est_idx)], gt),
            ) if len(est_idx) >= 3 else False
            eval_group = MetricsGroup(
                "ba_pose_metrics",
                [
                    Metric("rotation_error_deg", rot_err[est_mask]),
                    Metric("translation_error", t_err[est_mask]),
                    Metric("poses_match_gt_criterion", float(crit)),
                ]
                + [Metric(k, v) for k, v in auc.items()],
            )
            metrics_groups.append(eval_group)
            # track correctness vs GT cameras (utils/tracks.py — the
            # reference's track classification in data-association metrics)
            if data.number_tracks() > 0:
                from gtsfm_tpu.utils.tracks import tracks_from_sfm_data

                correct, _errs = tracks_from_sfm_data(data, gt)
                metrics_groups.append(
                    MetricsGroup(
                        "track_classification_metrics",
                        [
                            Metric("num_tracks_classified", int(correct.size)),
                            Metric("fraction_tracks_gt_consistent",
                                   float(correct.mean()) if correct.size else 0.0),
                        ],
                    )
                )
            # intrinsics error vs the loader's (GT) calibrations
            # (compute_intrinsics_metrics parity, utils/metrics.py:523)
            from gtsfm_tpu.evaluation.metrics import intrinsics_error_metrics
            from gtsfm_tpu.loader.base import batch_calibrations as _batch_cal

            cal0 = _batch_cal(loader.get_all_intrinsics())
            metrics_groups.append(
                intrinsics_error_metrics(data.cal, cal0, valid_mask=est_mask)
            )

        # ---- optional dense MVS / gaussian splatting ------------------
        dense_points = None
        gs_result = None
        if opts.run_mvs and not mvo_metrics.get("failed") and data.number_tracks() > 0:
            from gtsfm_tpu.densify.mvs import MVSOptions, PlaneSweepMVS

            t0 = time.perf_counter()
            mvs_opts = MVSOptions(
                num_depths=opts.mvs_num_depths,
                num_source_views=opts.mvs_num_source_views,
            )
            if opts.mvs_backend == "patchmatchnet":
                from gtsfm_tpu.densify.patchmatchnet import (
                    PatchmatchNetMVS,
                    load_torch_weights,
                )

                mvs = PatchmatchNetMVS(
                    mvs_opts, params=load_torch_weights(opts.mvs_weights_path)
                )
            else:
                mvs = PlaneSweepMVS(mvs_opts)
            dense_points, dense_colors, mvs_metrics = mvs.run(data, images)
            mvs_metrics["mvs_sec"] = time.perf_counter() - t0
            metrics_groups.append(
                MetricsGroup("mvs_metrics", [Metric(k, v) for k, v in mvs_metrics.items()])
            )
        if opts.run_gs and not mvo_metrics.get("failed") and data.number_tracks() > 0:
            from gtsfm_tpu.splat.gaussian_splatting import GaussianSplatting, GSTrainOptions

            t0 = time.perf_counter()
            gs_trainer = GaussianSplatting(GSTrainOptions(iterations=opts.gs_iterations))
            gs_result, gs_metrics = gs_trainer.train(data, images, gs_init=gs_init)
            gs_metrics["gs_sec"] = time.perf_counter() - t0
            metrics_groups.append(
                MetricsGroup("gaussian_splatting_metrics",
                             [Metric(k, v) for k, v in gs_metrics.items()])
            )
        elif gs_init is not None:
            # anysplat slot without training: export the feed-forward splats
            gs_result = gs_init

        total_sec = time.perf_counter() - t_start
        metrics_groups.append(
            MetricsGroup("total_summary", [Metric("total_runtime_sec", total_sec)])
        )
        if self._telemetry is not None:
            self._telemetry.log_stage("total", total_sec)

        # ---- export --------------------------------------------------
        if opts.output_root:
            results_dir = os.path.join(opts.output_root, "results")
            os.makedirs(results_dir, exist_ok=True)
            if opts.save_colmap and data.number_tracks() > 0:
                colmap_io.write_scene(data, os.path.join(results_dir, "ba_output"))
            # hierarchical runs: per-cluster merged results as a SceneTree
            # (results/C_1/C_1_2/... — products/scene_tree.py parity)
            node_results = getattr(self, "_hier_node_results", None)
            if opts.save_colmap and node_results:
                from gtsfm_tpu.products.scene_tree import SceneTree

                nodes = {}
                for path, node_data in node_results:
                    if not path:  # root == the merged ba_output above
                        continue
                    d = os.path.join(
                        results_dir, *[f"C_{'_'.join(map(str, path[: k + 1]))}"
                                       for k in range(len(path))]
                    )
                    nodes[path] = SceneTree(directory=d, scene=node_data)
                for path, node in sorted(nodes.items(), key=lambda kv: len(kv[0])):
                    parent = nodes.get(path[:-1])
                    if parent is not None:
                        parent.children.append(node)
                for path, node in nodes.items():
                    if len(path) == 1:
                        node.write()
            mdir = os.path.join(results_dir, "metrics")
            for g in metrics_groups:
                g.save_json(mdir)
            from gtsfm_tpu.evaluation.report import generate_html_report
            from gtsfm_tpu.ui.registry import ProcessGraphGenerator

            generate_html_report(
                metrics_groups, os.path.join(results_dir, "gtsfm_metrics_report.html")
            )
            ProcessGraphGenerator().save_graph(os.path.join(results_dir, "process_graph.dot"))
            if data.number_tracks() > 0:
                # interactive orbit viewer + static 3D plot (reference: the
                # Flask results browser visualization/app.py:10-40 and the
                # per-run Open3D/matplotlib viz of cluster_mvo's I/O tasks)
                from gtsfm_tpu.visualization.viewer import export_scene_html
                from gtsfm_tpu.visualization.viz import plot_scene_3d

                export_scene_html(data, os.path.join(results_dir, "viewer.html"))
                plots_dir = os.path.join(results_dir, "plots")
                os.makedirs(plots_dir, exist_ok=True)
                plot_scene_3d(data, os.path.join(plots_dir, "scene_3d.png"))
            if dense_points is not None and len(dense_points):
                from gtsfm_tpu.io.ply import write_ply

                write_ply(
                    os.path.join(results_dir, "dense_points.ply"),
                    dense_points, dense_colors,
                )
            if gs_result is not None:
                from gtsfm_tpu.splat.gs_data import export_ply

                export_ply(gs_result, os.path.join(results_dir, "splats.ply"))
                # gaussian means as colored scene points alongside the
                # reconstruction (add_tracks_with_gaussian_mean parity,
                # reference anysplat.py:167-198)
                from gtsfm_tpu.frontend.anysplat import gaussian_means_as_tracks
                from gtsfm_tpu.io.ply import write_ply as _write_pts

                g_pts, g_cols = gaussian_means_as_tracks(data, gs_result)
                _write_pts(
                    os.path.join(results_dir, "gaussian_points.ply"),
                    g_pts, g_cols,
                )
                if opts.gs_video_frames > 0:
                    self._export_splat_video(
                        gs_result, data, results_dir, opts.gs_video_frames
                    )

        return data, metrics_groups

    # ------------------------------------------------------------------
    def _export_splat_video(self, gs_result, data, results_dir: str, n_frames: int):
        """Render a smooth camera-path fly-through of the splats to
        results/splat_video/frame_%04d.png (B-spline over the estimated
        poses; reference parity: splat/rendering.py:102-197)."""
        import numpy as np

        from gtsfm_tpu.geometry import SE3
        from gtsfm_tpu.splat.rendering import bspline_camera_path, render_tiled

        est = np.flatnonzero(np.asarray(data.pose_mask))
        if len(est) < 2:
            return
        poses = SE3(R=data.poses.R[est], t=data.poses.t[est])
        path = bspline_camera_path(poses, n_frames)
        K = np.asarray(data.cal.K())[est[0]]
        H = int(round(float(K[1, 2]) * 2)) or 480
        W = int(round(float(K[0, 2]) * 2)) or 640
        out_dir = os.path.join(results_dir, "splat_video")
        os.makedirs(out_dir, exist_ok=True)
        from PIL import Image as _PILImage

        frames = []
        for f in range(n_frames):
            wTc = SE3(R=path.R[f], t=path.t[f])
            img, _ = render_tiled(gs_result, wTc, jnp.asarray(K), H, W)
            arr = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
            frame = _PILImage.fromarray(arr)
            frame.save(os.path.join(out_dir, f"frame_{f:04d}.png"))
            frames.append(frame)
        # animated fly-through: GIF (codec-free, always) + mp4 when an
        # OpenCV codec is present (reference parity: B-spline path video,
        # splat/rendering.py:102-197) — linked from the results browser
        # (visualization/viewer.py)
        if frames:
            frames[0].save(
                os.path.join(results_dir, "splat_flythrough.gif"),
                save_all=True, append_images=frames[1:],
                duration=max(1000 // 24, 20), loop=0,
            )
            try:
                import cv2

                vw = cv2.VideoWriter(
                    os.path.join(results_dir, "splat_flythrough.mp4"),
                    cv2.VideoWriter_fourcc(*"mp4v"), 24.0, (W, H),
                )
                if vw.isOpened():
                    for frame in frames:
                        vw.write(np.asarray(frame)[:, :, ::-1])  # RGB->BGR
                    vw.release()
            except Exception:  # pragma: no cover - codec-less builds
                pass

    # ------------------------------------------------------------------
    def _global_descriptor(self):
        if self.global_descriptor is None:
            from gtsfm_tpu.frontend.global_descriptors.descriptors import (
                TinyImageDescriptor,
            )

            self.global_descriptor = TinyImageDescriptor()
        if self.options.use_cache:
            from gtsfm_tpu.frontend.cachers import GlobalDescriptorCacher

            if not isinstance(self.global_descriptor, GlobalDescriptorCacher):
                self.global_descriptor = GlobalDescriptorCacher(
                    self.global_descriptor, root=self.options.cache_root
                )
        return self.global_descriptor

    # ------------------------------------------------------------------
    def _load_detect_chunked(self, loader: LoaderBase, want_global_descs: bool):
        """Streaming load+detect: images come in chunks of load_chunk_size
        and are dropped right after detection/description, so peak host
        memory stays O(chunk) for 100+ image scenes (parity with the
        reference's image futures, loader_base.py:363-391)."""
        opts = self.options
        n = len(loader)
        C = opts.load_chunk_size
        K = self.detector.max_keypoints
        kp_xy = np.zeros((n, K, 2), np.float32)
        kp_mask = np.zeros((n, K), bool)
        descs = None
        gdescs = None
        sizes = [None] * n
        for s in range(0, n, C):
            idx = list(range(s, min(s + C, n)))
            images, csizes = loader.load_grayscale_batch(indices=idx)
            cxy, cmask, cd = self._detect_batch(images, csizes)
            if descs is None:
                descs = np.zeros((n, K, cd.shape[-1]), np.float32)
            kp_xy[s : s + len(idx)] = cxy
            kp_mask[s : s + len(idx)] = cmask
            descs[s : s + len(idx)] = cd
            for j, sz in zip(idx, csizes):
                sizes[j] = sz
            if want_global_descs:
                g = self._global_descriptor().describe_batch(images)
                if gdescs is None:
                    gdescs = np.zeros((n, g.shape[-1]), np.float32)
                gdescs[s : s + len(idx)] = g
            del images
        return kp_xy, kp_mask, descs, gdescs, sizes

    # ------------------------------------------------------------------
    def _detect_batch(self, images: np.ndarray, sizes):
        """Chunked detection over the padded image batch via the pluggable
        detector component, with border-validity masking and an optional
        content-addressed cache (frontend/cacher parity)."""
        opts = self.options
        if self._detect_cache is not None:
            from gtsfm_tpu.utils.cache import content_key

            key = content_key(
                images[:, ::8, ::8], np.asarray(sizes),
                type(self.detector.detector).__name__
                if hasattr(self.detector, "detector") else type(self.detector).__name__,
                self.detector.max_keypoints,
            )
            hit = self._detect_cache.get(key)
            if hit is not None:
                return hit
        B = opts.image_batch_size
        n = images.shape[0]
        K = self.detector.max_keypoints
        kp_xy = np.zeros((n, K, 2), np.float32)
        kp_mask = np.zeros((n, K), bool)
        descs = None
        for s in range(0, n, B):
            coords, mask, d = self.detector.detect_batch(images[s : s + B])
            if descs is None:
                descs = np.zeros((n, K, d.shape[-1]), np.float32)
            for b in range(coords.shape[0]):
                h, w = sizes[s + b]
                inb = (
                    (coords[b, :, 0] < w - 4)
                    & (coords[b, :, 1] < h - 4)
                    & (coords[b, :, 0] >= 4)
                    & (coords[b, :, 1] >= 4)
                )
                kp_xy[s + b] = coords[b]
                kp_mask[s + b] = mask[b] & inb
                descs[s + b] = d[b]
        if self._detect_cache is not None:
            self._detect_cache.put(key, (kp_xy, kp_mask, descs))
        return kp_xy, kp_mask, descs

    # ------------------------------------------------------------------
    def _run_two_view(self, pairs, kp_xy, kp_mask, descs, cal, pair_matches=None):
        """Two-view estimation, optionally through the content-addressed
        disk cacher (two_view_estimator_cacher.py parity). Precomputed
        per-pair matches (direct-correspondence mode) bypass the cacher —
        its content key covers descriptors, not external match lists."""
        if self._two_view_cacher is not None and pair_matches is None:
            return self._two_view_cacher.run(pairs, kp_xy, kp_mask, descs, cal)
        return self._run_two_view_uncached(
            pairs, kp_xy, kp_mask, descs, cal, pair_matches=pair_matches
        )

    # ------------------------------------------------------------------
    def _run_two_view_uncached(self, pairs, kp_xy, kp_mask, descs, cal,
                               pair_matches=None):
        """Chunked batched two-view estimation; returns numpy dict. Pair
        chunks shard over the device mesh when one is available."""
        opts = self.options
        P = len(pairs)
        B = opts.pair_batch_size
        K = kp_xy.shape[1]
        out = {
            "i2Ri1": np.zeros((P, 3, 3), np.float32),
            "i2Ui1": np.zeros((P, 3), np.float32),
            "corr_i1": np.zeros((P, K), np.int32),
            "corr_i2": np.zeros((P, K), np.int32),
            "corr_mask": np.zeros((P, K), bool),
            "num_matches": np.zeros(P, np.int32),
            "num_inliers": np.zeros(P, np.int32),
            "inlier_ratio": np.zeros(P, np.float32),
            "valid": np.zeros(P, bool),
        }
        key = jax.random.PRNGKey(opts.seed)
        mesh = self._mesh if (self._mesh is not None and B % self._mesh.shape["data"] == 0) else None
        if mesh is None and self.matcher is None:
            # single-device fast path: scene arrays live on the DEVICE and
            # every chunk gathers + runs inside one jit — the host loop
            # ships only pair indices up and compact results down. The
            # per-chunk host-gather path re-uploaded the gathered keypoint/
            # descriptor slabs every chunk (~10-160 MB each over a remote
            # tunnel; measured 8 s/chunk on palace-281 vs ~1 s here).
            return self._run_two_view_device_resident(
                pairs, kp_xy, kp_mask, descs, cal, out, key, pair_matches
            )
        for s in range(0, P, B):
            chunk = pairs[s : s + B]
            pb = len(chunk)
            pad = B - pb
            i1 = np.concatenate([chunk[:, 0], np.zeros(pad, np.int32)])
            i2 = np.concatenate([chunk[:, 1], np.zeros(pad, np.int32)])
            pm = np.concatenate([np.ones(pb, bool), np.zeros(pad, bool)])
            batch = dict(
                kp_xy1=jnp.asarray(kp_xy[i1]),
                kp_xy2=jnp.asarray(kp_xy[i2]),
                desc1=jnp.asarray(descs[i1]),
                desc2=jnp.asarray(descs[i2]),
                kp_mask1=jnp.asarray(kp_mask[i1]),
                kp_mask2=jnp.asarray(kp_mask[i2]),
                cal1=jax.tree.map(lambda a: a[jnp.asarray(i1)], cal),
                cal2=jax.tree.map(lambda a: a[jnp.asarray(i2)], cal),
                pair_mask=jnp.asarray(pm),
            )
            if mesh is not None:
                from gtsfm_tpu.parallel.sharding import shard_pair_batch

                batch = shard_pair_batch(mesh, batch)
            matches = {}
            if pair_matches is not None:
                # precomputed per-pair correspondence indices (direct mode):
                # match_idx[p, k1] = k2 for each aggregated correspondence
                midx, mmask = self._match_table(chunk, pair_matches if not
                                                isinstance(pair_matches, tuple)
                                                else tuple(np.asarray(x)[s : s + B]
                                                           for x in pair_matches),
                                                K, B)
                matches = dict(
                    match_idx=jnp.asarray(midx),
                    match_mask=jnp.asarray(mmask),
                    match_score=jnp.asarray(mmask, jnp.float32),
                )
            elif self.matcher is not None:
                midx, mmask, mscore = self.matcher.match_batch(
                    batch["desc1"], batch["desc2"],
                    batch["kp_xy1"], batch["kp_xy2"],
                    batch["kp_mask1"], batch["kp_mask2"],
                    image_size=getattr(self, "_image_wh", (1024, 1024)),
                )
                matches = dict(match_idx=midx, match_mask=mmask, match_score=mscore)
            ctx = mesh if mesh is not None else _nullcontext()
            with ctx:
                res = run_two_view_batch(
                    **batch,
                    key=jax.random.fold_in(key, s),
                    opts=opts.two_view,
                    **matches,
                )
            # ONE batched device->host transfer for the whole result struct:
            # nine sequential np.asarray() pulls each paid a full tunnel
            # round trip (~0.15 s apiece on a remote tpu)
            res_h = jax.device_get(
                {
                    "i2Ri1": res.i2Ri1, "i2Ui1": res.i2Ui1,
                    "corr_i1": res.corr_i1, "corr_i2": res.corr_i2,
                    "corr_mask": res.corr_mask, "num_matches": res.num_matches,
                    "num_inliers": res.num_inliers,
                    "inlier_ratio": res.inlier_ratio, "valid": res.valid,
                }
            )
            for name, attr in res_h.items():
                out[name][s : s + pb] = attr[:pb]
        return out

    # ------------------------------------------------------------------
    @staticmethod
    def _match_table(pairs, pair_matches, K, rows):
        """(rows, K) match_idx/match_mask tables (match_idx[p, k1] = k2)
        from either an (E, K) corr_i1/corr_i2/corr_mask array triple
        aligned with `pairs`, or a legacy per-pair dict."""
        P = len(pairs)
        midx = np.zeros((rows, K), np.int32)
        mmask = np.zeros((rows, K), bool)
        if isinstance(pair_matches, tuple):
            ci1, ci2, cm = (np.asarray(x) for x in pair_matches)
            r, k = np.nonzero(cm[:P])
            k1 = ci1[r, k]
            midx[r, k1] = ci2[r, k]
            mmask[r, k1] = True
        else:
            for p, (a, b) in enumerate(pairs):
                e = pair_matches.get((int(a), int(b)))
                if e is None:
                    continue
                idx1, idx2, keep = e
                idx1, idx2 = idx1[keep], idx2[keep]
                midx[p, idx1] = idx2
                mmask[p, idx1] = True
        return midx, mmask

    # ------------------------------------------------------------------
    def _run_two_view_device_resident(
        self, pairs, kp_xy, kp_mask, descs, cal, out, key, pair_matches
    ):
        """Two-view over device-resident scene arrays (no mesh, internal
        matcher). See _two_view_chunk_device."""
        opts = self.options
        P = len(pairs)
        B = opts.pair_batch_size
        K = kp_xy.shape[1]
        kp_dev = jnp.asarray(np.asarray(kp_xy, np.float32))
        kpm_dev = jnp.asarray(np.asarray(kp_mask, bool))
        d_dev = jnp.asarray(np.asarray(descs, np.float32))
        cal_dev = jax.tree.map(jnp.asarray, cal)
        use_matches = pair_matches is not None
        if use_matches:
            # full per-pair match table, uploaded once (+B slack rows so a
            # final-chunk gather never reads out of bounds)
            midx, mmask = self._match_table(pairs, pair_matches, K, P + B)
            midx_dev = jnp.asarray(midx)
            mmask_dev = jnp.asarray(mmask)
        else:
            midx_dev = jnp.zeros((1, K), jnp.int32)
            mmask_dev = jnp.zeros((1, K), bool)
        for s in range(0, P, B):
            chunk = pairs[s : s + B]
            pb = len(chunk)
            pad = B - pb
            i1 = np.concatenate([chunk[:, 0], np.zeros(pad, np.int64)]).astype(np.int32)
            i2 = np.concatenate([chunk[:, 1], np.zeros(pad, np.int64)]).astype(np.int32)
            pm = np.concatenate([np.ones(pb, bool), np.zeros(pad, bool)])
            e_idx = np.arange(s, s + B, dtype=np.int32)
            res = _two_view_chunk_device(
                kp_dev, kpm_dev, d_dev, cal_dev, midx_dev, mmask_dev,
                jnp.asarray(i1), jnp.asarray(i2), jnp.asarray(pm),
                jnp.asarray(e_idx), key,
                opts=opts.two_view, use_matches=use_matches,
            )
            res_h = jax.device_get(
                {
                    "i2Ri1": res.i2Ri1, "i2Ui1": res.i2Ui1,
                    "corr_i1": res.corr_i1, "corr_i2": res.corr_i2,
                    "corr_mask": res.corr_mask, "num_matches": res.num_matches,
                    "num_inliers": res.num_inliers,
                    "inlier_ratio": res.inlier_ratio, "valid": res.valid,
                }
            )
            for name, attr in res_h.items():
                out[name][s : s + pb] = attr[:pb]
        return out
