"""AnySplat-class feed-forward gaussian predictor — an explicit RE-DESIGN.

Parity (functional): /root/reference/gtsfm/frontend/anysplat.py:133-300
(AnySplatReconstructionResult: one forward pass over an image set ->
camera extrinsics/intrinsics + a 3D-gaussian field with means, scales,
rotations, opacities and SH0 colors) and
cluster_optimizer/cluster_anysplat.py (feed-forward splats per cluster,
gaussian means exported as colored scene points).

The public AnySplat checkpoint (lhjiang/anysplat) wraps a VGGT-style
geometry backbone with a per-pixel gaussian parameter head; its source
tree is NOT vendored in the reference (thirdparty/AnySplat is empty), so
a checkpoint-exact port cannot be verified here. This module therefore
implements the same contract as a TPU-native re-design over this repo's
checkpoint-exact VGGT backbone (frontend/vggt.py):

  aggregator + camera head + depth head   exact VGGT (convertible from
                                          facebook/VGGT-1B weights)
  gaussian_head                           a DPT-family head predicting
                                          14 channels per pixel: 3
                                          tanh-bounded xyz offsets (in
                                          units of depth), 3 log-scale
                                          residuals on the pixel-footprint
                                          scale, 4 rotation quaternion
                                          logits, 1 opacity logit, 3 color
                                          logits

Per-pixel gaussians: mean = unproject(u, v, depth) + offset * depth,
scale = footprint * exp(residual), alpha = sigmoid(logit) * conf-gate.
Confidence-ranked subsampling caps the output at max_gaussians for the
splat trainer / renderer.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.frontend.vggt import (
    VGGTModel,
    VGGTOptions,
    aggregator_forward,
    camera_head_forward,
    dpt_head_forward,
    init_params,
    pose_encoding_to_extri_intri,
)
from gtsfm_tpu.splat.gs_data import GSData


class AnySplatOptions(NamedTuple):
    max_gaussians: int = 100_000
    conf_threshold: float = 0.3  # on the [0, 1]-shifted depth confidence
    offset_bound: float = 0.05  # xyz offset bound, in units of depth


def _gaussian_field(params, images, opts: VGGTOptions):
    """(S, H, W, 3) images -> (extri, intri, depth, conf01, per-pixel
    gaussian params). The gaussian head shares the aggregator pass with
    the camera/depth heads."""
    S, H, W, _ = images.shape
    outputs, ps = aggregator_forward(params["aggregator"], images, opts)
    pose_enc = camera_head_forward(params["camera_head"], outputs, opts)
    extri, intri = pose_encoding_to_extri_intri(pose_enc, (H, W))
    depth, conf = dpt_head_forward(
        params["depth_head"], outputs, ps, (H, W), opts, activation="exp"
    )
    raw = dpt_head_forward(
        params["gaussian_head"], outputs, ps, (H, W), opts, activation="raw"
    )  # (S, H, W, 14)
    conf01 = 1.0 - 1.0 / jnp.maximum(conf, 1.0)
    return extri, intri, depth[..., 0], conf01, raw


@partial(jax.jit, static_argnames=("opts",))
def _anysplat_forward(params, images, opts: VGGTOptions):
    return _gaussian_field(params, images, opts)


class AnySplatModel:
    """run(images (S, H, W, 3) in [0, 1]) -> dict with extrinsic (S, 3, 4)
    world->cam, intrinsic (S, 3, 3), depth, depth_conf in [0, 1], and
    gaussians: GSData — the AnySplatReconstructionResult contract
    (reference anysplat.py:133-141)."""

    def __init__(self, options: VGGTOptions = VGGTOptions(), params=None,
                 splat_options: AnySplatOptions = AnySplatOptions(), seed: int = 0):
        self.options = options
        self.splat_options = splat_options
        if params is None:
            params = init_params(jax.random.PRNGKey(seed), options)
        if "gaussian_head" not in params:
            params = dict(params)
            params["gaussian_head"] = init_gaussian_head(
                jax.random.PRNGKey(seed + 1), options
            )
        self.params = params

    @classmethod
    def from_vggt(cls, vggt: VGGTModel,
                  splat_options: AnySplatOptions = AnySplatOptions(),
                  seed: int = 0) -> "AnySplatModel":
        """Share the exact VGGT backbone weights; the gaussian head is
        initialized fresh (no public checkpoint is convertible here)."""
        return cls(vggt.options, params=dict(vggt.params),
                   splat_options=splat_options, seed=seed)

    def run(self, images: jnp.ndarray) -> dict:
        images = jnp.asarray(images)
        extri, intri, depth, conf01, raw = _anysplat_forward(
            self.params, images, self.options
        )
        gs = self._assemble_gaussians(
            np.asarray(extri), np.asarray(intri), np.asarray(depth),
            np.asarray(conf01), np.asarray(raw),
        )
        return {
            "extrinsic": extri, "intrinsic": intri, "depth": depth,
            "depth_conf": conf01, "gaussians": gs,
        }

    def _assemble_gaussians(self, extri, intri, depth, conf01, raw) -> GSData:
        so = self.splat_options
        S, H, W = depth.shape
        budget = max(1, so.max_gaussians // S)
        means, scales, quats, opac, cols = [], [], [], [], []
        ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
        for s in range(S):
            K = intri[s]
            fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
            # an untrained depth head's exp activation can reach e^{+-30};
            # keep the assembled field in a numerically sane range
            d = np.clip(depth[s], 1e-2, 1e3)
            # camera-frame backprojection + bounded learned offset
            xc = (xs - cx) / max(fx, 1e-6) * d
            yc = (ys - cy) / max(fy, 1e-6) * d
            off = np.tanh(raw[s, ..., 0:3]) * so.offset_bound * d[..., None]
            p_cam = np.stack([xc, yc, d], axis=-1) + off
            R = extri[s, :, :3]  # world -> cam
            t = extri[s, :, 3]
            p_world = (p_cam - t) @ R  # R^T (p - t)
            # confidence-ranked subsample to the per-frame budget
            score = conf01[s].reshape(-1)
            keep = np.argsort(-score)[:budget]
            keep = keep[score[keep] >= min(so.conf_threshold, float(score[keep[0]]))]
            if keep.size == 0:
                continue
            iy, ix = keep // W, keep % W
            footprint = d[iy, ix] / max(fx, 1e-6)  # 1px at depth
            means.append(p_world[iy, ix])
            # clamp the total log-scale: exp(2 * log_scale) must stay finite
            # through the rasterizer's covariance even for an untrained
            # depth head whose exp activation can be extreme
            scales.append(
                np.clip(
                    np.log(np.maximum(footprint[:, None], 1e-6))
                    + np.clip(raw[s, iy, ix, 3:6], -4.0, 4.0),
                    -12.0, 8.0,
                )
            )
            q = raw[s, iy, ix, 6:10]
            q = q + np.array([1.0, 0, 0, 0])  # identity-centered logits
            quats.append(q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-6))
            opac.append(raw[s, iy, ix, 10])
            cols.append(raw[s, iy, ix, 11:14])
        if not means:
            return GSData.from_points(np.zeros((1, 3), np.float32))
        P = np.concatenate(means).astype(np.float32)
        n = len(P)
        return GSData(
            means=jnp.asarray(P),
            log_scales=jnp.asarray(np.concatenate(scales).astype(np.float32)),
            quats=jnp.asarray(np.concatenate(quats).astype(np.float32)),
            colors=jnp.asarray(np.concatenate(cols).astype(np.float32)),
            opacity_logit=jnp.asarray(np.concatenate(opac).astype(np.float32)),
            alive=jnp.ones(n, jnp.float32),
        )


def init_gaussian_head(key, o: VGGTOptions) -> dict:
    """DPT gaussian head params: the depth head's structure with a
    14-channel final conv (offsets 3, log-scale residuals 3, quat 4,
    opacity 1, color 3)."""
    head = init_params(key, o)["depth_head"]
    k1, _ = jax.random.split(key)
    F = o.dpt_features
    head["output_conv2_2"] = {
        "kernel": jax.random.normal(k1, (1, 1, 32, 14)) * 0.02,
        "bias": jnp.zeros(14),
    }
    return head


def gaussian_means_as_tracks(data, gs: GSData, max_points: int = 20_000):
    """Gaussian means appended to the reconstruction as colored
    measurement-less scene points, densifying the exported point cloud
    (parity: anysplat.add_tracks_with_gaussian_mean, reference
    anysplat.py:167-198). Returns (points (M, 3), colors uint8 (M, 3)) for
    the export tail — SfmData tracks carry measurements, so the dense
    gaussian geometry travels alongside rather than inside the BA state."""
    op = np.asarray(jax.nn.sigmoid(gs.opacity_logit) * gs.alive)
    k = min(max_points, op.size)
    idx = np.argsort(-op)[:k]
    pts = np.asarray(gs.means)[idx]
    cols = np.asarray(jax.nn.sigmoid(gs.colors))[idx]
    return pts.astype(np.float32), (np.clip(cols, 0, 1) * 255).astype(np.uint8)
