"""DISK detector/descriptor in JAX (thin U-Net, policy-gradient features).

Parity: /root/reference/gtsfm/frontend/detector_descriptor/disk.py:23-67
(torch DISK from thirdparty/LightGlue, i.e. the kornia port of
cvlab-epfl/disk). Re-built layer-for-layer after the original "thin setup"
U-Net so the public checkpoint converts via load_torch_weights():

  Unet(in_features=3, size=5, down=[16, 32, 64, 64, 64],
       up=[64, 64, 64, desc_dim + 1])

  down block 0:   Conv2d(3 -> 16, 5x5, pad 2)                 (no pool)
  down block k>0: AvgPool(2) -> InstanceNorm -> PReLU -> Conv2d(5x5)
  up block j:     bilinear x2 (half-pixel centers) of the bottom path,
                  concat skip, InstanceNorm -> PReLU -> Conv2d(5x5)
  output:         129 channels = 128-d dense descriptors + 1 heatmap

Inference = batched jit forward (convs on the MXU) + 5x5 device-side NMS
+ top-K by heatmap score; descriptors are read at keypoint pixels and
L2-normalized, as in the reference wrapper's extract() path.

Assumed torch state_dict layout (documented here because the image is
zero-egress and no checkpoint is bundled; tests/frontend/test_disk_exact.py
builds a torch reference with this exact layout and verifies the converter
layer-for-layer):

  unet.path_down.0.1.0.{weight,bias}            first conv
  unet.path_down.k.1.1.weight                   PReLU slope (k=1..4)
  unet.path_down.k.1.2.{weight,bias}            conv
  unet.path_up.j.conv.1.weight                  PReLU slope (j=0..3)
  unet.path_up.j.conv.2.{weight,bias}           conv

The converter also tolerates an ``extractor.`` / ``model.`` key prefix and
ignores InstanceNorm running stats if present.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.common.keypoints import Keypoints

DOWN = [16, 32, 64, 64, 64]
UP = [64, 64, 64, 129]
DESC_DIM = 128
KSIZE = 5


class DISKOptions(NamedTuple):
    max_keypoints: int = 2048
    nms_window: int = 5
    score_threshold: float = 0.0


def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d(affine=False): per-(image, channel) over H, W.

    x: (B, H, W, C)."""
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def _prelu(x: jnp.ndarray, slope: jnp.ndarray) -> jnp.ndarray:
    """Per-channel PReLU. slope: (C,), x: (..., C)."""
    return jnp.maximum(x, 0.0) + slope * jnp.minimum(x, 0.0)


def _conv5(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """5x5 SAME conv. kernel: (kh, kw, I, O) flax layout."""
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))


def _upsample2(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear x2 with half-pixel centers (torch align_corners=False)."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="bilinear")


def init_params(key) -> dict:
    """He-init random parameters with the documented structure."""
    params = {"down": [], "up": []}
    dims = [3] + DOWN
    for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
        key, k1 = jax.random.split(key)
        blk = {
            "kernel": jax.random.normal(k1, (KSIZE, KSIZE, cin, cout))
            * np.sqrt(2.0 / (KSIZE * KSIZE * cin)),
            "bias": jnp.zeros(cout),
        }
        if i > 0:
            blk["slope"] = jnp.full(cin, 0.25)
        params["down"].append(blk)
    bot = [DOWN[-1]] + UP[:-1]
    hor = dims[-2::-1]  # [64, 64, 32, 16]
    for j, (b, h, cout) in enumerate(zip(bot, hor, UP)):
        cin = b + h
        key, k1 = jax.random.split(key)
        params["up"].append(
            {
                "slope": jnp.full(cin, 0.25),
                "kernel": jax.random.normal(k1, (KSIZE, KSIZE, cin, cout))
                * np.sqrt(2.0 / (KSIZE * KSIZE * cin)),
                "bias": jnp.zeros(cout),
            }
        )
    return params


def unet_forward(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, H, W, 3), H and W divisible by 16 -> (B, H, W, 129)."""
    feats = []
    y = x
    for i, blk in enumerate(params["down"]):
        if i > 0:
            y = _avg_pool2(y)
            y = _prelu(_instance_norm(y), blk["slope"])
        y = _conv5(y, blk["kernel"], blk["bias"])
        feats.append(y)
    y = feats[-1]
    for blk, skip in zip(params["up"], feats[-2::-1]):
        y = jnp.concatenate([_upsample2(y), skip], axis=-1)
        y = _prelu(_instance_norm(y), blk["slope"])
        y = _conv5(y, blk["kernel"], blk["bias"])
    return y


@partial(jax.jit, static_argnames=("opts",))
def _forward_and_detect(params: dict, images: jnp.ndarray, opts: DISKOptions):
    """images: (B, H, W) grayscale in [0, 1]."""
    x = jnp.repeat(images[..., None], 3, axis=-1)
    out = unet_forward(params, x)
    desc_dense = out[..., :DESC_DIM]
    heat = out[..., DESC_DIM]  # (B, H, W)

    win = opts.nms_window
    pooled = jax.lax.reduce_window(
        heat,
        -jnp.inf,
        jax.lax.max,
        (1, win, win),
        (1, 1, 1),
        "SAME",
    )
    nms = jnp.where(heat == pooled, heat, -jnp.inf)

    B, H, W = heat.shape
    K = opts.max_keypoints
    top, idx = jax.lax.top_k(nms.reshape(B, -1), K)
    ys = idx // W
    xs = idx % W
    valid = top > opts.score_threshold

    d = jax.vmap(lambda dd, y_, x_: dd[y_, x_])(desc_dense, ys, xs)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    kps = Keypoints(
        coordinates=jnp.stack([xs, ys], axis=-1).astype(jnp.float32),
        scales=jnp.ones((B, K), jnp.float32),
        responses=top,
        mask=valid,
    )
    return kps, d


class DISK:
    """Detector-descriptor component. images: (B, H, W) grayscale, [0, 1];
    H and W must be divisible by 16 (the registry adapter pads)."""

    def __init__(
        self,
        options: DISKOptions = DISKOptions(),
        weights_path: Optional[str] = None,
        params: Optional[dict] = None,
    ):
        self.options = options
        if params is not None:
            self.params = params
        elif weights_path is not None:
            self.params = load_torch_weights(weights_path)
        else:
            self.params = init_params(jax.random.PRNGKey(0))

    def __call__(self, images: jnp.ndarray):
        return _forward_and_detect(self.params, images, self.options)


def load_torch_weights(path: str) -> dict:
    """Convert a torch DISK state_dict (layout in the module docstring)
    to the JAX parameter pytree. torch conv (O, I, kh, kw) -> (kh, kw, I, O)."""
    from gtsfm_tpu.utils.torch_io import load_torch_checkpoint

    sd = load_torch_checkpoint(path)
    if isinstance(sd, dict) and "extractor" in sd:
        sd = sd["extractor"]
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def find(*suffixes):
        for k, v in sd.items():
            for s in suffixes:
                if k.endswith(s):
                    return v
        raise KeyError(f"none of {suffixes} in checkpoint (keys: {sorted(sd)[:8]}...)")

    def conv(w, b):
        return jnp.asarray(w.transpose(2, 3, 1, 0)), jnp.asarray(b)

    params = {"down": [], "up": []}
    k0, b0 = conv(
        find("unet.path_down.0.1.0.weight", "unet.path_down.0.1.weight"),
        find("unet.path_down.0.1.0.bias", "unet.path_down.0.1.bias"),
    )
    params["down"].append({"kernel": k0, "bias": b0})
    for k in range(1, len(DOWN)):
        w, b = conv(
            find(f"unet.path_down.{k}.1.2.weight"), find(f"unet.path_down.{k}.1.2.bias")
        )
        params["down"].append(
            {
                "slope": jnp.asarray(find(f"unet.path_down.{k}.1.1.weight")),
                "kernel": w,
                "bias": b,
            }
        )
    for j in range(len(UP)):
        w, b = conv(find(f"unet.path_up.{j}.conv.2.weight"), find(f"unet.path_up.{j}.conv.2.bias"))
        params["up"].append(
            {
                "slope": jnp.asarray(find(f"unet.path_up.{j}.conv.1.weight")),
                "kernel": w,
                "bias": b,
            }
        )
    return params
