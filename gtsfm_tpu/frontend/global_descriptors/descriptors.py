"""Global image descriptors for retrieval.

Parity: /root/reference/gtsfm/frontend/global_descriptor/ —
global_descriptor_base.py:21 (describe_batch interface), NetVLAD
(netvlad_global_descriptor.py, hloc/torch) and MegaLoc.

Two implementations:
  * NetVLADDescriptor — Flax: small conv encoder + NetVLAD pooling
    (soft-assignment to learned cluster centers, intra-normalized VLAD
    aggregation). Accepts converted public weights; random init otherwise.
  * TinyImageDescriptor — weight-free: blurred downsampled grayscale,
    mean- and contrast-normalized. Zero-egress-friendly production default for
    the similarity retriever (works well for scene-level place similarity).
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class NetVLADOptions(NamedTuple):
    num_clusters: int = 32
    encoder_dim: int = 128
    output_dim: int = 1024


class NetVLADNet(nn.Module):
    opts: NetVLADOptions

    @nn.compact
    def __call__(self, x):  # (B, H, W, 1) grayscale
        relu = nn.relu
        y = relu(nn.Conv(32, (3, 3), strides=(2, 2), name="conv1")(x))
        y = relu(nn.Conv(64, (3, 3), strides=(2, 2), name="conv2")(y))
        y = relu(nn.Conv(128, (3, 3), strides=(2, 2), name="conv3")(y))
        y = nn.Conv(self.opts.encoder_dim, (3, 3), name="conv4")(y)
        B, H, W, D = y.shape
        feats = y.reshape(B, H * W, D)
        feats = feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)

        K = self.opts.num_clusters
        centers = self.param("centers", nn.initializers.normal(0.1), (K, D))
        assign_w = nn.Dense(K, name="assign")
        a = jax.nn.softmax(assign_w(feats), axis=-1)  # (B, HW, K)
        # VLAD: sum_i a_ik (f_i - c_k)
        vlad = jnp.einsum("bik,bid->bkd", a, feats) - jnp.einsum(
            "bik,kd->bkd", a, centers
        )
        # intra-normalization then global L2
        vlad = vlad / jnp.maximum(jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-12)
        v = vlad.reshape(B, K * D)
        v = nn.Dense(self.opts.output_dim, name="proj")(v)
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


class NetVLADDescriptor:
    def __init__(self, options: NetVLADOptions = NetVLADOptions(), params=None):
        self.options = options
        self.net = NetVLADNet(options)
        if params is None:
            params = self.net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))["params"]
        self.params = params
        self._fwd = jax.jit(lambda p, x: self.net.apply({"params": p}, x))

    def describe_batch(self, images: np.ndarray) -> np.ndarray:
        """(B, H, W) grayscale [0,1] -> (B, output_dim) L2-normalized."""
        return np.asarray(self._fwd(self.params, jnp.asarray(images)[..., None]))


class TinyImageDescriptor:
    """Weight-free global descriptor: downsample to res x res, subtract
    mean, L2 normalize. Surprisingly strong for viewpoint-similar retrieval
    and fully deterministic."""

    def __init__(self, res: int = 32):
        self.res = res
        self._fwd = jax.jit(self._describe)

    def _describe(self, images: jnp.ndarray) -> jnp.ndarray:
        B, H, W = images.shape
        small = jax.image.resize(images, (B, self.res, self.res), "linear")
        v = small.reshape(B, -1)
        v = v - jnp.mean(v, axis=-1, keepdims=True)
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

    def describe_batch(self, images: np.ndarray) -> np.ndarray:
        return np.asarray(self._fwd(jnp.asarray(images, jnp.float32)))
