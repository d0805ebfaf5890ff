"""SceneOptimizer: top-level orchestration of a full reconstruction.

Parity: /root/reference/gtsfm/scene_optimizer.py:99-440 (SceneOptimizer.run:
retriever -> correspondence/two-view stage -> graph partitioning -> per-
cluster optimization -> merging -> export + metrics).

TPU-first shape: host Python drives a sequence of jitted batched device
stages. Round-1 scope runs a single cluster (SinglePartitioner equivalent);
the partitioned/hierarchical path plugs in via gtsfm_tpu.partitioner +
gtsfm_tpu.merging.
"""

from __future__ import annotations

import os
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

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


class SceneOptimizerOptions(NamedTuple):
    detector: DoGSiftOptions = DoGSiftOptions(max_keypoints=1024)
    two_view: TwoViewOptions = TwoViewOptions()
    mvo: MVOOptions = MVOOptions()
    pair_batch_size: int = 64  # pairs per two-view jit call
    image_batch_size: int = 4  # images per detector jit call
    seed: int = 0
    output_root: Optional[str] = None
    save_colmap: bool = True


class SceneOptimizer:
    def __init__(
        self,
        options: SceneOptimizerOptions = SceneOptimizerOptions(),
        retriever=None,
    ):
        self.options = options
        self.retriever = retriever or SequentialRetriever()
        self.detector = DoGSift(options.detector)

    # ------------------------------------------------------------------
    def run(self, loader: LoaderBase) -> tuple:
        """-> (SfmData, MetricsGroup list)."""
        opts = self.options
        t_start = time.perf_counter()
        n = len(loader)
        metrics_groups = []

        # ---- load + detect -------------------------------------------
        t0 = time.perf_counter()
        images, sizes = loader.load_grayscale_batch()
        cals = loader.get_all_intrinsics()
        cal = batch_calibrations(cals)
        kp_xy, kp_mask, descs = self._detect_batch(images, sizes)
        detect_sec = time.perf_counter() - t0

        # ---- retrieve pairs ------------------------------------------
        t0 = time.perf_counter()
        pairs = self.retriever.get_image_pairs(n)
        retriever_sec = time.perf_counter() - t0

        # ---- two-view estimation (batched over pairs) ----------------
        t0 = time.perf_counter()
        tvr = self._run_two_view(pairs, kp_xy, kp_mask, descs, cal)
        frontend_sec = time.perf_counter() - t0

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

        # ---- multi-view optimization ---------------------------------
        meta = SceneMeta(
            image_names=loader.image_filenames(),
            image_sizes=[(w, h) for (h, w) in sizes],
        )
        mvo = MultiViewOptimizer(opts.mvo)
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
        mvo_group = MetricsGroup(
            "multiview_optimizer_metrics",
            [Metric(k, v) for k, v in mvo_metrics.items() if isinstance(v, (int, float))],
        )
        metrics_groups.append(mvo_group)

        # ---- evaluation vs GT ----------------------------------------
        gt = loader.get_gt_poses()
        if gt is not None and not mvo_metrics.get("failed"):
            est_mask = np.asarray(data.pose_mask)
            rot_err, t_err, aligned = relative_pose_errors(data.poses, gt, est_mask)
            data = data.replace(poses=aligned)  # keep scene in GT frame
            auc = pose_auc(rot_err[est_mask])
            eval_group = MetricsGroup(
                "ba_pose_metrics",
                [
                    Metric("rotation_error_deg", rot_err[est_mask]),
                    Metric("translation_error", t_err[est_mask]),
                ]
                + [Metric(k, v) for k, v in auc.items()],
            )
            metrics_groups.append(eval_group)

        total_sec = time.perf_counter() - t_start
        metrics_groups.append(
            MetricsGroup("total_summary", [Metric("total_runtime_sec", total_sec)])
        )

        # ---- export --------------------------------------------------
        if opts.output_root:
            results_dir = os.path.join(opts.output_root, "results")
            os.makedirs(results_dir, exist_ok=True)
            if opts.save_colmap and data.number_tracks() > 0:
                colmap_io.write_scene(data, os.path.join(results_dir, "ba_output"))
            mdir = os.path.join(results_dir, "metrics")
            for g in metrics_groups:
                g.save_json(mdir)

        return data, metrics_groups

    # ------------------------------------------------------------------
    def _detect_batch(self, images: np.ndarray, sizes):
        """Chunked vmapped detection over the padded image batch."""
        opts = self.options
        B = opts.image_batch_size
        n = images.shape[0]
        K = opts.detector.max_keypoints
        kp_xy = np.zeros((n, K, 2), np.float32)
        kp_mask = np.zeros((n, K), bool)
        descs = None
        det = jax.jit(
            jax.vmap(lambda im: self.detector(im))
        )
        for s in range(0, n, B):
            chunk = jnp.asarray(images[s : s + B])
            kps, d = det(chunk)
            d = np.asarray(d)
            if descs is None:
                descs = np.zeros((n, K, d.shape[-1]), np.float32)
            coords = np.asarray(kps.coordinates)
            mask = np.asarray(kps.mask)
            for b in range(chunk.shape[0]):
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
        return kp_xy, kp_mask, descs

    # ------------------------------------------------------------------
    def _run_two_view(self, pairs, kp_xy, kp_mask, descs, cal):
        """Chunked batched two-view estimation; returns numpy dict."""
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
        for s in range(0, P, B):
            chunk = pairs[s : s + B]
            pb = len(chunk)
            pad = B - pb
            i1 = np.concatenate([chunk[:, 0], np.zeros(pad, np.int32)])
            i2 = np.concatenate([chunk[:, 1], np.zeros(pad, np.int32)])
            pm = np.concatenate([np.ones(pb, bool), np.zeros(pad, bool)])
            res = run_two_view_batch(
                kp_xy1=jnp.asarray(kp_xy[i1]),
                kp_xy2=jnp.asarray(kp_xy[i2]),
                desc1=jnp.asarray(descs[i1]),
                desc2=jnp.asarray(descs[i2]),
                kp_mask1=jnp.asarray(kp_mask[i1]),
                kp_mask2=jnp.asarray(kp_mask[i2]),
                cal1=jax.tree.map(lambda a: a[jnp.asarray(i1)], cal),
                cal2=jax.tree.map(lambda a: a[jnp.asarray(i2)], cal),
                pair_mask=jnp.asarray(pm),
                key=jax.random.fold_in(key, s),
                opts=opts.two_view,
            )
            for name, attr in [
                ("i2Ri1", res.i2Ri1), ("i2Ui1", res.i2Ui1),
                ("corr_i1", res.corr_i1), ("corr_i2", res.corr_i2),
                ("corr_mask", res.corr_mask), ("num_matches", res.num_matches),
                ("num_inliers", res.num_inliers), ("inlier_ratio", res.inlier_ratio),
                ("valid", res.valid),
            ]:
                out[name][s : s + pb] = np.asarray(attr)[:pb]
        return out
