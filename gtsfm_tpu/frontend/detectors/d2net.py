"""D2-Net detector/descriptor in Flax.

Parity: /root/reference/gtsfm/frontend/detector_descriptor/d2net.py (torch
D2Net from thirdparty/d2net: a truncated VGG-16 dense-feature trunk, a
hard-detection module of depthwise/local maxima with a Harris-style edge
filter, and handcrafted sub-pixel localization). Re-built layer-for-layer
as a Flax module so the public d2_tf.pth-family checkpoints convert 1:1
via load_torch_weights(); the detection/localization stages are pure jnp
stencils (no torch at inference). Weights are NOT bundled (zero-egress
image); random init still runs for pipeline-shape tests, and DoGSift stays
the weight-free production detector.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.common.keypoints import Keypoints

# torch Sequential indices of the ten conv layers in the published trunk
_CONV_IDS = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21)


class D2NetOptions(NamedTuple):
    max_keypoints: int = 2048
    edge_threshold: float = 5.0
    use_relu: bool = True  # final ReLU on the dense features (d2 checkpoints)


class D2NetTrunk(nn.Module):
    """VGG-16 truncated at conv4_3 with dilated conv4 block (stride 4)."""

    use_relu: bool = True

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3), H, W divisible by 4
        relu = nn.relu

        def c(ch, i, padding=1, **kw):
            return nn.Conv(ch, (3, 3), padding=padding, name=f"conv{i}", **kw)
        x = relu(c(64, 0)(x))
        x = relu(c(64, 2)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = relu(c(128, 5)(x))
        x = relu(c(128, 7)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = relu(c(256, 10)(x))
        x = relu(c(256, 12)(x))
        x = relu(c(256, 14)(x))
        # AvgPool2d(2, stride=1): valid padding, output (H-1, W-1)
        x = nn.avg_pool(x, (2, 2), strides=(1, 1))
        dil = dict(kernel_dilation=(2, 2), padding=2)
        x = relu(c(512, 17, **dil)(x))
        x = relu(c(512, 19, **dil)(x))
        x = c(512, 21, **dil)(x)
        if self.use_relu:
            x = relu(x)
        return x  # (B, H/4 - 1, W/4 - 1, 512)


def _shift(x, di, dj):
    """Zero-padded spatial shift of (B, H, W, C) by (di, dj)."""
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    H, W = x.shape[1], x.shape[2]
    return p[:, 1 + di : 1 + di + H, 1 + dj : 1 + dj + W]


def _hessian_stencils(f):
    """Per-channel second-derivative stencils (the fixed 3x3 filters of the
    published HardDetection/HandcraftedLocalization modules)."""
    dii = _shift(f, -1, 0) - 2.0 * f + _shift(f, 1, 0)
    djj = _shift(f, 0, -1) - 2.0 * f + _shift(f, 0, 1)
    dij = 0.25 * (
        _shift(f, -1, -1) - _shift(f, -1, 1) - _shift(f, 1, -1) + _shift(f, 1, 1)
    )
    return dii, dij, djj


def hard_detection(f, edge_threshold: float = 5.0):
    """Boolean detection mask (B, H, W, C): depthwise max & 3x3 local max &
    Harris-style edge rejection on the dense features."""
    is_depth_max = f == jnp.max(f, axis=-1, keepdims=True)
    local_max = nn.max_pool(f, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
    is_local_max = f == local_max
    dii, dij, djj = _hessian_stencils(f)
    det = dii * djj - dij * dij
    tr = dii + djj
    thr = (edge_threshold + 1.0) ** 2 / edge_threshold
    not_edge = (tr * tr <= thr * det) & (det > 0)
    return is_depth_max & is_local_max & not_edge


def handcrafted_localization(f):
    """Sub-pixel Newton step (B, H, W, C, 2) in (i, j) order."""
    dii, dij, djj = _hessian_stencils(f)
    det = dii * djj - dij * dij
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    di = 0.5 * (_shift(f, 1, 0) - _shift(f, -1, 0))
    dj = 0.5 * (_shift(f, 0, 1) - _shift(f, 0, -1))
    step_i = -(djj * di - dij * dj) / det_safe
    step_j = -(-dij * di + dii * dj) / det_safe
    return jnp.stack([step_i, step_j], axis=-1)


class D2Net:
    """Detector-descriptor component. images: (B, H, W) grayscale in [0,1]
    (replicated to the trunk's 3 input channels, like the gtsfm wrapper
    feeding RGB); returns (Keypoints [B, K], descriptors (B, K, 512))."""

    STRIDE = 4  # feature-map stride of the truncated VGG trunk

    def __init__(
        self,
        options: D2NetOptions = D2NetOptions(),
        weights_path: Optional[str] = None,
        params=None,
    ):
        self.options = options
        self.net = D2NetTrunk(use_relu=options.use_relu)
        if params is not None:
            self.params = params
        elif weights_path is not None:
            self.params = load_torch_weights(weights_path)
        else:
            self.params = self.net.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
            )["params"]
        self._fwd = jax.jit(self._forward)

    def _forward(self, params, x):
        f = self.net.apply({"params": params}, x)
        detected = hard_detection(f, self.options.edge_threshold)
        disp = handcrafted_localization(f)
        # response: feature magnitude where detected, collapsed over channels
        resp = jnp.max(jnp.where(detected, f, 0.0), axis=-1)  # (B, h, w)
        best_c = jnp.argmax(jnp.where(detected, f, -jnp.inf), axis=-1)
        return f, resp, best_c, disp

    def __call__(self, images: jnp.ndarray):
        x = jnp.repeat(images[..., None], 3, axis=-1)
        f, resp, best_c, disp = self._fwd(self.params, x)
        B, h, w, C = f.shape
        K = self.options.max_keypoints
        flat = resp.reshape(B, -1)
        top, idx = jax.lax.top_k(flat, min(K, h * w))
        ys = idx // w
        xs = idx % w
        valid = top > 0

        def per_image(fb, dispb, cb, ysb, xsb):
            ch = cb[ysb, xsb]
            off = dispb[ysb, xsb, ch]  # (K, 2) (di, dj)
            d = fb[ysb, xsb]  # (K, C)
            d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
            # feature-map coords (+ subpixel) -> input pixels: the two max
            # pools give stride 4; the stride-1 avg pool shifts by +0.5 cell
            u = (xsb + jnp.clip(off[:, 1], -0.5, 0.5) + 0.5) * self.STRIDE
            v = (ysb + jnp.clip(off[:, 0], -0.5, 0.5) + 0.5) * self.STRIDE
            return jnp.stack([u, v], -1), d

        uv, descs = jax.vmap(per_image)(f, disp, best_c, ys, xs)
        kps = Keypoints(
            coordinates=uv,
            scales=jnp.full(uv.shape[:-1], float(self.STRIDE)),
            responses=top,
            mask=valid,
        )
        return kps, descs


def load_torch_weights(path: str):
    """Convert a public d2net checkpoint (torch state_dict, conv weights at
    dense_feature_extraction.model.{0,2,...,21}) to Flax params.

    torch conv weight (O, I, kh, kw) -> flax kernel (kh, kw, I, O).
    Accepts checkpoints that wrap the state_dict under a 'model' key.
    """
    from gtsfm_tpu.utils.torch_io import load_torch_checkpoint

    sd = load_torch_checkpoint(path)
    if isinstance(sd, dict) and "model" in sd and not any(
        k.startswith("dense_feature_extraction") for k in sd
    ):
        sd = sd["model"]
    return convert_torch_state_dict(sd)


def convert_torch_state_dict(sd) -> dict:
    params = {}
    for i in _CONV_IDS:
        w = np.asarray(sd[f"dense_feature_extraction.model.{i}.weight"])
        b = np.asarray(sd[f"dense_feature_extraction.model.{i}.bias"])
        params[f"conv{i}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }
    return params
