"""SuperPoint detector/descriptor in Flax.

Parity: /root/reference/gtsfm/frontend/detector_descriptor/superpoint.py:33
(torch SuperPoint from thirdparty/SuperGluePretrainedNetwork). Re-built as
a Flax module with identical architecture so the public MagicLeap weights
(superpoint_v1.pth) convert 1:1 via load_torch_weights(); inference is a
batched jit forward (bf16 convs on the MXU) + device-side NMS and top-K.

Weights are NOT bundled (zero-egress image); without a checkpoint the
module still runs (random init) for pipeline-shape tests, and the DoGSift
detector is the weight-free production path.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.common.keypoints import Keypoints


class SuperPointOptions(NamedTuple):
    max_keypoints: int = 2048
    detection_threshold: float = 0.005
    nms_radius: int = 4
    remove_borders: int = 4


class SuperPointNet(nn.Module):
    """VGG-style encoder + detector head (65ch cell softmax) + descriptor
    head (256-d), matching the MagicLeap architecture layer-for-layer."""

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, 1), H,W divisible by 8
        relu = nn.relu
        conv = lambda c, name: nn.Conv(c, (3, 3), padding="SAME", name=name)
        pool = lambda y: nn.max_pool(y, (2, 2), strides=(2, 2))

        y = relu(conv(64, "conv1a")(x))
        y = relu(conv(64, "conv1b")(y))
        y = pool(y)
        y = relu(conv(64, "conv2a")(y))
        y = relu(conv(64, "conv2b")(y))
        y = pool(y)
        y = relu(conv(128, "conv3a")(y))
        y = relu(conv(128, "conv3b")(y))
        y = pool(y)
        y = relu(conv(128, "conv4a")(y))
        y = relu(conv(128, "conv4b")(y))

        # detector head
        d = relu(nn.Conv(256, (3, 3), padding="SAME", name="convPa")(y))
        scores = nn.Conv(65, (1, 1), name="convPb")(d)  # (B, H/8, W/8, 65)

        # descriptor head
        e = relu(nn.Conv(256, (3, 3), padding="SAME", name="convDa")(y))
        desc = nn.Conv(256, (1, 1), name="convDb")(e)  # (B, H/8, W/8, 256)
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
        return scores, desc


def _simple_nms(scores: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Keep local maxima within (2r+1) windows. scores: (B, H, W)."""
    win = 2 * radius + 1
    pooled = nn.max_pool(
        scores[..., None], (win, win), strides=(1, 1), padding="SAME"
    )[..., 0]
    return jnp.where(scores == pooled, scores, 0.0)


@partial(jax.jit, static_argnames=("opts",))
def _postprocess(scores65, desc_coarse, opts: SuperPointOptions):
    """scores65: (B, Hc, Wc, 65) -> Keypoints + descriptors per image."""
    B, Hc, Wc, _ = scores65.shape
    probs = jax.nn.softmax(scores65, axis=-1)[..., :64]  # drop dustbin
    heat = probs.reshape(B, Hc, Wc, 8, 8).transpose(0, 1, 3, 2, 4).reshape(B, Hc * 8, Wc * 8)
    heat = _simple_nms(heat, opts.nms_radius)
    H, W = Hc * 8, Wc * 8
    b_ = opts.remove_borders
    yy = jnp.arange(H)
    xx = jnp.arange(W)
    border = (
        (yy[:, None] >= b_) & (yy[:, None] < H - b_) & (xx[None, :] >= b_) & (xx[None, :] < W - b_)
    )
    heat = jnp.where(border[None], heat, 0.0)

    K = opts.max_keypoints
    flat = heat.reshape(B, -1)
    top, idx = jax.lax.top_k(flat, K)
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    valid = top > opts.detection_threshold

    # bilinear-sample coarse descriptors at keypoint locations
    def sample(desc_c, x, y):
        gx = x / 8.0 - 0.5
        gy = y / 8.0 - 0.5
        x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, Wc - 2)
        y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, Hc - 2)
        fx = jnp.clip(gx - x0, 0, 1)[:, None]
        fy = jnp.clip(gy - y0, 0, 1)[:, None]
        d = (
            desc_c[y0, x0] * (1 - fy) * (1 - fx)
            + desc_c[y0, x0 + 1] * (1 - fy) * fx
            + desc_c[y0 + 1, x0] * fy * (1 - fx)
            + desc_c[y0 + 1, x0 + 1] * fy * fx
        )
        return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)

    descs = jax.vmap(sample)(desc_coarse, xs, ys)
    kps = Keypoints(
        coordinates=jnp.stack([xs, ys], axis=-1),
        scales=jnp.ones_like(xs),
        responses=top,
        mask=valid,
    )
    return kps, descs


class SuperPoint:
    """Detector-descriptor component. images: (B, H, W) grayscale in [0,1]."""

    def __init__(
        self,
        options: SuperPointOptions = SuperPointOptions(),
        weights_path: Optional[str] = None,
        params=None,
    ):
        self.options = options
        self.net = SuperPointNet()
        if params is not None:
            self.params = params
        elif weights_path is not None:
            self.params = load_torch_weights(weights_path)
        else:
            self.params = self.net.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1))
            )["params"]
        self._fwd = jax.jit(lambda p, x: self.net.apply({"params": p}, x))

    def __call__(self, images: jnp.ndarray):
        x = images[..., None]
        scores, desc = self._fwd(self.params, x)
        return _postprocess(scores, desc, self.options)


def load_torch_weights(path: str):
    """Convert MagicLeap superpoint_v1.pth (torch state_dict) to Flax params.

    torch conv weight (O, I, kh, kw) -> flax kernel (kh, kw, I, O).
    """
    from gtsfm_tpu.utils.torch_io import load_torch_checkpoint

    sd = load_torch_checkpoint(path)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params = {}
    names = [
        "conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
        "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb",
    ]
    for n in names:
        w = np.asarray(sd[f"{n}.weight"])
        b = np.asarray(sd[f"{n}.bias"])
        params[n] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }
    return params
