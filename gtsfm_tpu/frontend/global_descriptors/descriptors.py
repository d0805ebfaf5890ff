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


# ---- exact hloc VGG16-NetVLAD (public Pitts30K checkpoint layout) ----------

# Sequential indices of the 13 convs in VGG16 features (trunc at conv5_3)
_VGG16_CONV_IDS = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_VGG16_CHANNELS = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)
_VGG16_POOL_AFTER = {2, 7, 14, 21}  # indices after which a 2x2 max-pool runs


class NetVLADVGG16(nn.Module):
    """The exact hloc NetVLAD architecture (VGG16 truncated at conv5_3 +
    NetVLAD pooling + 4096-d whitening), layer-for-layer in Flax so the
    public Pitts30K/TokyoTM checkpoints convert 1:1.

    Parity: thirdparty/hloc/netvlad.py (NetVLAD.forward): input RGB in
    [0, 1] (B, H, W, 3); output L2-normalized (B, 4096).
    """

    num_clusters: int = 64
    whiten_dim: int = 4096
    # mean image of the MATLAB checkpoint (set from the converted weights;
    # VGG mean as the generic default)
    mean_rgb: tuple = (123.68, 116.779, 103.939)

    @nn.compact
    def __call__(self, x):
        x = jnp.clip(x * 255.0, 0.0, 255.0) - jnp.asarray(self.mean_rgb)
        for i, ch in zip(_VGG16_CONV_IDS, _VGG16_CHANNELS):
            x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{i}")(x)
            if i != _VGG16_CONV_IDS[-1]:  # last ReLU removed in hloc
                x = nn.relu(x)
            if i in _VGG16_POOL_AFTER:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        B, H, W, D = x.shape
        feats = x.reshape(B, H * W, D)
        feats = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12
        )
        # NetVLAD pooling: soft-assign to K centers, aggregate residuals
        scores = nn.Dense(self.num_clusters, use_bias=False, name="score_proj")(feats)
        assign = jax.nn.softmax(scores, axis=-1)  # (B, N, K)
        centers = self.param(
            "centers", nn.initializers.xavier_uniform(), (D, self.num_clusters)
        )
        # residual sum: sum_n a_nk (f_n - c_k)  -> (B, D, K)
        vlad = jnp.einsum("bnk,bnd->bdk", assign, feats) - (
            jnp.sum(assign, axis=1)[:, None, :] * centers[None]
        )
        # intra-normalization over D per cluster, then global L2
        vlad = vlad / jnp.maximum(jnp.linalg.norm(vlad, axis=1, keepdims=True), 1e-12)
        vlad = vlad.reshape(B, -1)
        vlad = vlad / jnp.maximum(jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-12)
        out = nn.Dense(self.whiten_dim, name="whiten")(vlad)
        return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)


def convert_hloc_netvlad_state_dict(sd) -> dict:
    """Convert the hloc NetVLAD torch state_dict (backbone.N.weight /
    netvlad.score_proj.weight / netvlad.centers / whiten.*) to Flax params.

    VLAD flattening order note: torch flattens (B, D, K) row-major over D
    then K; this module flattens the same (B, D, K) layout, so the whiten
    matrix maps over without permutation.
    """
    import numpy as _np

    params = {}
    for i in _VGG16_CONV_IDS:
        w = _np.asarray(sd[f"backbone.{i}.weight"])  # (O, I, kh, kw)
        b = _np.asarray(sd[f"backbone.{i}.bias"])
        params[f"conv{i}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }
    score = _np.asarray(sd["netvlad.score_proj.weight"])  # (K, D, 1)
    params["score_proj"] = {"kernel": jnp.asarray(score[..., 0].T)}
    params["centers"] = jnp.asarray(sd["netvlad.centers"])  # (D, K)
    params["whiten"] = {
        "kernel": jnp.asarray(_np.asarray(sd["whiten.weight"]).T),
        "bias": jnp.asarray(sd["whiten.bias"]),
    }
    return params


class HlocNetVLADDescriptor:
    """describe_batch over the exact VGG16-NetVLAD (use with converted
    public weights; random init only for shape tests). Images: (B, H, W)
    grayscale or (B, H, W, 3) RGB in [0, 1]."""

    def __init__(self, params=None, weights_path=None):
        self.net = NetVLADVGG16()
        if params is None and weights_path is not None:
            import torch

            sd = torch.load(weights_path, map_location="cpu")
            params = convert_hloc_netvlad_state_dict(sd)
        if params is None:
            params = self.net.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
            )["params"]
        self.params = params
        self._fwd = jax.jit(lambda p, x: self.net.apply({"params": p}, x))

    def describe_batch(self, images: np.ndarray) -> np.ndarray:
        x = np.asarray(images, np.float32)
        if x.ndim == 3:
            x = np.repeat(x[..., None], 3, axis=-1)
        return np.asarray(self._fwd(self.params, jnp.asarray(x)))
