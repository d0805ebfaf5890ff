"""Feed-forward cluster optimizers (VGGT / AnySplat slots).

Parity: /root/reference/gtsfm/cluster_optimizer/cluster_vggt.py (feed-
forward VGGT per cluster with worker-side model cache + optional post-BA)
and cluster_anysplat.py (feed-forward splats per cluster).

ClusterFeedforward runs the FeedforwardReconstruction model on a cluster's
image batch, converts predictions to SfmData, and optionally polishes with
BA. ClusterFeedforwardSplat additionally lifts the predicted depth maps to
an initial Gaussian splat set (the AnySplat-style product) that the splat
trainer can refine.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.bundle.ba import BAOptions, BundleAdjustment
from gtsfm_tpu.common.sfm_data import SfmData
from gtsfm_tpu.frontend.feedforward import (
    FeedforwardOptions,
    FeedforwardReconstruction,
    feedforward_to_sfm_data,
)
from gtsfm_tpu.splat.gs_data import GSData


class ClusterFeedforwardOptions(NamedTuple):
    model: FeedforwardOptions = FeedforwardOptions()
    # "compact" = the weight-free architecture-class model
    # (frontend/feedforward.py); "vggt_exact" = the checkpoint-exact VGGT
    # port (frontend/vggt.py, torch-verified) — pass the converted
    # facebook/VGGT-1B weights via vggt_weights_path
    backbone: str = "compact"
    vggt_weights_path: str = ""
    run_post_ba: bool = True
    ba: BAOptions = BAOptions(max_iterations=10, layout="dense")
    conf_threshold: float = 0.5
    # multi-view tracks via the tracking head (run_vggt_tracking parity);
    # falls back to depth self-tracks when tracking yields too few
    use_tracking: bool = True
    tracks_per_camera: int = 12
    track_vis_threshold: float = 0.6


_MODEL_CACHE: dict = {}


def _resolve_model(opts: ClusterFeedforwardOptions, hw, params=None):
    """Per-process model cache (parity: cluster_vggt.py:28-29,84 worker-side
    model cache)."""
    key = (opts.model, hw)
    if params is not None or key not in _MODEL_CACHE:
        _MODEL_CACHE[key] = FeedforwardReconstruction(opts.model, params=params, example_hw=hw)
    return _MODEL_CACHE[key]


def pad_to_patch_grid(images: np.ndarray, P: int) -> np.ndarray:
    """Zero-pad (B, H, W) images up to the transformer's patch grid."""
    B, H, W = images.shape
    Hp = ((H + P - 1) // P) * P
    Wp = ((W + P - 1) // P) * P
    if (Hp, Wp) == (H, W):
        return images
    out = np.zeros((B, Hp, Wp), np.float32)
    out[:, :H, :W] = images
    return out


class ClusterFeedforward:
    def __init__(self, options: ClusterFeedforwardOptions = ClusterFeedforwardOptions(), params=None):
        self.options = options
        self.params = params

    def run(self, images: np.ndarray, cal) -> tuple:
        """images: (B, H, W) grayscale [0,1]; cal: batched calibration [B].
        -> (SfmData, metrics)."""
        data, metrics, _raw = self.run_raw(images, cal)
        return data, metrics

    def run_raw(self, images: np.ndarray, cal) -> tuple:
        """Like run() but also returns the raw model products
        (poses, depth, conf) — the inputs depth_to_splats needs for the
        AnySplat-style feed-forward splat path (cluster_anysplat.py parity).
        """
        opts = self.options
        B, H, W = images.shape
        # pad to the transformer's patch grid (the reference crops/pads VGGT
        # inputs to 518px, loader_base.load_image_batch_vggt); crop the
        # dense products back after inference
        P = opts.model.patch_size
        Hp = ((H + P - 1) // P) * P
        Wp = ((W + P - 1) // P) * P
        images = pad_to_patch_grid(images, P)
        vggt_model = None
        if opts.backbone == "vggt_exact":
            poses, depth, conf, cal, vggt_model = self._run_vggt_exact(images, cal)
        else:
            model = _resolve_model(opts, (Hp, Wp), self.params)
            poses, depth, conf, focal = model.run(jnp.asarray(images, jnp.float32))
        if (Hp, Wp) != (H, W):
            depth = depth[:, :H, :W]
            hp_c = max(1, (H + P - 1) // P)
            wp_c = max(1, (W + P - 1) // P)
            conf = conf[:, :hp_c, :wp_c]
        data = None
        if (
            opts.use_tracking
            and opts.backbone == "vggt_exact"
            and vggt_model is not None
            and vggt_model.has_track_head
        ):
            # exact CoTracker-style track head (run_vggt_tracking parity,
            # reference vggt.py:1104-1177): query confident frame-0 pixels,
            # track across all frames, anchor 3D points on frame-0 depth
            data = vggt_exact_tracks_to_sfm_data(
                vggt_model, images, poses, np.asarray(depth),
                np.asarray(conf), cal,
                conf_threshold=opts.conf_threshold,
                vis_threshold=opts.track_vis_threshold,
                per_camera=opts.tracks_per_camera,
                patch_size=P,
            )
        if data is None and opts.use_tracking and opts.backbone == "compact":
            from gtsfm_tpu.frontend.feedforward import feedforward_tracks_to_sfm_data

            track_feat = np.asarray(model.last_track_feat)
            hp_c = max(1, (H + P - 1) // P)
            wp_c = max(1, (W + P - 1) // P)
            data = feedforward_tracks_to_sfm_data(
                poses, np.asarray(depth), np.asarray(conf), cal,
                track_feat[:, :hp_c, :wp_c],
                conf_threshold=opts.conf_threshold,
                vis_threshold=opts.track_vis_threshold,
                per_camera=opts.tracks_per_camera,
                patch_size=P,
            )
        if data is None or data.number_tracks() < 8:
            data = feedforward_to_sfm_data(
                poses, np.asarray(depth), np.asarray(conf), cal,
                conf_threshold=opts.conf_threshold,
            )
        metrics = {"num_tracks_ff": data.number_tracks()}
        if opts.run_post_ba and data.number_tracks() > 4:
            ba = BundleAdjustment(opts.ba)
            fixed = jnp.zeros(B, bool).at[0].set(True)
            data, ba_m = ba.run(data, fixed_cam=fixed)
            metrics["post_ba"] = ba_m
        return data, metrics, (poses, np.asarray(depth), np.asarray(conf))


    def _run_vggt_exact(self, images: np.ndarray, cal):
        """Run the checkpoint-exact VGGT (frontend/vggt.py) and adapt its
        products to the compact-model contract: wTi poses, depth (B, H, W),
        patch-level confidence, and the PREDICTED calibrations (the
        reference uses VGGT's own intrinsics, vggt.py:862-874)."""
        import jax

        from gtsfm_tpu.frontend.vggt import VGGTModel, VGGTOptions, load_torch_weights
        from gtsfm_tpu.geometry import SE3, Cal3Bundler

        opts = self.options
        key = ("vggt_exact", opts.vggt_weights_path, images.shape[1:])
        if key not in _MODEL_CACHE:
            if opts.vggt_weights_path:
                params, vo = load_torch_weights(opts.vggt_weights_path)
                _MODEL_CACHE[key] = VGGTModel(vo, params=params)
            else:
                # random-weight exact architecture (shape/pipeline tests),
                # including a reduced-dim exact track head so the tracking
                # path is exercised end-to-end
                from gtsfm_tpu.frontend.vggt import init_params
                from gtsfm_tpu.frontend.vggt_track import (
                    TrackOptions,
                    init_track_params,
                )

                vo = VGGTOptions(
                    embed_dim=64, depth=2, num_heads=4, dino_depth=2,
                    dino_heads=4, dino_pretrain_grid=4, camera_trunk_depth=2,
                    camera_iterations=2, dpt_features=32,
                    dpt_out_channels=(16, 32, 64, 64),
                    intermediate_layer_idx=(0, 0, 1, 1),
                )
                params = init_params(jax.random.PRNGKey(0), vo)
                params["track_head"] = init_track_params(
                    jax.random.PRNGKey(1),
                    TrackOptions(latent_dim=32, hidden_size=48, corr_levels=3,
                                 corr_radius=2, depth=2, num_heads=8,
                                 num_virtual_tracks=8, iters=2),
                    vo,
                )
                _MODEL_CACHE[key] = VGGTModel(vo, params=params)
        model = _MODEL_CACHE[key]
        rgb = jnp.asarray(np.repeat(images[..., None], 3, axis=-1), jnp.float32)
        out = model.run(rgb)
        extri = np.asarray(out["extrinsic"])  # (B, 3, 4) world->cam
        R_wc = extri[:, :, :3]
        t_wc = extri[:, :, 3]
        poses = SE3(
            R=jnp.asarray(np.swapaxes(R_wc, 1, 2)),
            t=jnp.asarray(-np.einsum("bij,bi->bj", R_wc, t_wc)),
        )
        K = np.asarray(out["intrinsic"])  # predicted intrinsics
        B = images.shape[0]
        cal_pred = Cal3Bundler.create(
            jnp.asarray(0.5 * (K[:, 0, 0] + K[:, 1, 1])),
            jnp.zeros(B), jnp.zeros(B),
            jnp.asarray(K[:, 0, 2]), jnp.asarray(K[:, 1, 2]),
        )
        depth = np.asarray(out["depth"])
        # pixel confidence -> patch-level grid (compact-model contract)
        P = self.options.model.patch_size
        Bc, H, W = depth.shape
        hp, wp = max(1, H // P), max(1, W // P)
        conf_px = np.asarray(out["depth_conf"])
        conf = conf_px[:, : hp * P, : wp * P].reshape(Bc, hp, P, wp, P).mean((2, 4))
        # VGGT confidence is 1 + exp(x) >= 1: shift to the compact model's
        # [0, 1]-ish range so conf_threshold semantics carry over
        conf = 1.0 - 1.0 / np.maximum(conf, 1.0)
        return poses, jnp.asarray(depth), jnp.asarray(conf), cal_pred, model


def vggt_exact_tracks_to_sfm_data(
    model,
    images: np.ndarray,
    poses,
    depth: np.ndarray,
    conf: np.ndarray,
    cal,
    conf_threshold: float = 0.5,
    vis_threshold: float = 0.6,
    max_queries: int = 256,
    per_camera: int = 12,
    patch_size: int = 14,
):
    """Multi-view tracks from the EXACT VGGT track head: query pixels are
    drawn from confident patches of frame 0, tracked across every frame by
    the CoTracker-style head, and each surviving >= 2-view track anchors
    its 3D point by unprojecting the frame-0 depth (the reference's
    pred_point_3d = dense_points[query][query_points], vggt.py:1086).
    Returns SfmData or None. Single query frame (frame 0) — the
    reference's DINO frame ranking / multi-query sweep is a retrieval
    refinement on top of the same head."""
    from gtsfm_tpu.frontend.feedforward import select_tracks_for_ba
    from gtsfm_tpu.geometry import PinholeCamera

    B, H, W = images.shape
    hp, wp = conf.shape[1], conf.shape[2]
    s = patch_size
    flat_conf = conf[0, :hp, :wp].reshape(-1)
    good = np.nonzero(flat_conf >= conf_threshold)[0]
    if len(good) == 0:
        good = np.argsort(-flat_conf)[: min(max_queries, flat_conf.size)]
    good = good[np.argsort(-flat_conf[good])][:max_queries]
    if len(good) == 0:
        return None
    qy, qx = good // wp, good % wp
    qp = np.stack([(qx + 0.5) * s, (qy + 0.5) * s], axis=-1).astype(np.float32)

    rgb = jnp.asarray(np.repeat(images[..., None], 3, axis=-1), jnp.float32)
    out = model.track(rgb, jnp.asarray(qp))
    xy = np.asarray(out["tracks"])  # (B, Q, 2) pixel coords
    vis = np.asarray(out["vis"]) * np.asarray(out["conf"])  # (B, Q)

    Q = len(good)
    valid = vis.T >= vis_threshold  # (Q, B)
    valid[:, 0] = True  # frame 0 observes its own queries
    multi = valid.sum(axis=1) >= 2
    chosen = select_tracks_for_ba(
        vis.T * multi[:, None], valid & multi[:, None], per_camera=per_camera
    )

    cam_ref = PinholeCamera(
        pose=jax.tree.map(lambda a: a[0], poses),
        cal=jax.tree.map(lambda a: a[0], cal),
    )
    tracks = []
    Hd, Wd = depth.shape[1], depth.shape[2]
    for qi in np.nonzero(chosen)[0]:
        uv_ref = qp[qi]
        iy, ix = min(int(uv_ref[1]), Hd - 1), min(int(uv_ref[0]), Wd - 1)
        X = np.asarray(
            cam_ref.backproject(jnp.asarray(uv_ref), jnp.asarray(depth[0, iy, ix]))
        )
        obs = []
        for b in range(B):
            if not valid[qi, b]:
                continue
            uv = uv_ref if b == 0 else xy[b, qi]
            if 0 <= uv[0] < W and 0 <= uv[1] < H:
                obs.append((b, np.asarray(uv, np.float32)))
        if len(obs) >= 2:
            tracks.append((X, obs))
    if not tracks:
        return None
    return SfmData.from_cameras_and_tracks(poses, cal, tracks, num_cameras=B)


class ClusterFastFeedforward(ClusterFeedforward):
    """FastVGGT-class cluster optimizer (parity: cluster_fast_vggt.py):
    the same feed-forward reconstruction with token-merged global attention
    (global_kv_stride=4), trading a little accuracy for a ~stride-fold
    cheaper global-attention stage on large clusters."""

    def __init__(self, options: ClusterFeedforwardOptions | None = None, params=None):
        if options is None:
            options = ClusterFeedforwardOptions(
                model=FeedforwardOptions(global_kv_stride=4)
            )
        elif options.model.global_kv_stride <= 1:
            options = options._replace(
                model=options.model._replace(global_kv_stride=4)
            )
        super().__init__(options, params=params)


def depth_to_splats(
    poses, depth: np.ndarray, conf: np.ndarray, cal, images: Optional[np.ndarray] = None,
    conf_threshold: float = 0.5, stride: int = 8, max_gaussians: int = 100_000,
) -> GSData:
    """Lift predicted depth maps to an initial Gaussian splat set — the
    AnySplat-style feed-forward product. Scale per splat = pixel footprint
    at its depth; color from the source image."""
    from gtsfm_tpu.geometry import PinholeCamera

    B, H, W = depth.shape
    pts, cols, scales = [], [], []
    for b in range(B):
        cam = PinholeCamera(
            pose=jax.tree.map(lambda a: a[b], poses),
            cal=jax.tree.map(lambda a: a[b], cal),
        )
        f = float(np.asarray(cam.cal.fx))
        hp, wp = conf[b].shape
        ys, xs = np.mgrid[0:H:stride, 0:W:stride]
        cy = np.minimum(ys * hp // H, hp - 1)
        cx = np.minimum(xs * wp // W, wp - 1)
        keep = conf[b][cy, cx] >= conf_threshold
        uv = np.stack([xs[keep], ys[keep]], -1).astype(np.float32)
        d = depth[b][ys[keep], xs[keep]].astype(np.float32)
        X = np.asarray(cam.backproject(jnp.asarray(uv), jnp.asarray(d)))
        pts.append(X)
        scales.append(d * stride / f)  # pixel-footprint scale
        if images is not None:
            cols.append(images[b][ys[keep], xs[keep]])
        if sum(len(p) for p in pts) > max_gaussians:
            break
    if not pts:
        return GSData.from_points(np.zeros((1, 3), np.float32))
    P = np.concatenate(pts)[:max_gaussians]
    S = np.concatenate(scales)[:max_gaussians]
    C = np.concatenate(cols)[:max_gaussians] if cols else None
    gs = GSData.from_points(P, colors=C, max_gaussians=len(P))
    return gs.replace(log_scales=jnp.asarray(np.log(np.maximum(S, 1e-5))[:, None].repeat(3, 1)))
