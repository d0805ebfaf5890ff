"""MegaLoc global descriptor in JAX: DINOv2 ViT-B/14 + SALAD aggregation.

Parity: /root/reference/gtsfm/frontend/global_descriptor/
megaloc_global_descriptor.py:18-90 and /root/reference/thirdparty/megaloc/
megaloc.py:25-257 ("MegaLoc: One Retrieval to Place Them All",
arXiv:2502.17237). Architecture, exactly as the reference model:

  backbone   DINOv2 ViT-B/14 (768-d, 12 heads, 12 blocks, LayerScale,
             pretrain grid 37x37, bicubic pos-embed interpolation with
             interpolate_offset=0.1)
  aggregator SALAD: per-patch cluster features (1x1 conv MLP, 256-d),
             cluster score matrix (1x1 conv MLP, 64 clusters), global
             token MLP (256-d), Sinkhorn OT assignment with learned
             dustbin (3 iterations), mass-normalized soft-assignment
             pooling, per-cluster L2 norm; concat token -> 16640-d
  head       Linear 16640 -> 8448 + final L2 norm

Inference preprocessing matches the reference wrapper: resize to 322x322
(antialias), ImageNet mean/std normalization; the whole forward is one
batched jit (ViT matmuls ride the MXU in bf16-friendly shapes).

load_torch_weights() consumes the public megaloc.torch state_dict layout
(backbone.model.* / aggregator.agg.* / aggregator.linear.*); dims are read
from tensor shapes so the converter is verified layer-for-layer against a
reduced-dim torch reference in tests/frontend/test_megaloc_exact.py
(zero-egress image: no checkpoint bundled, random init runs for shape
tests).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class MegaLocOptions(NamedTuple):
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    patch_size: int = 14
    pretrain_grid: int = 37  # 518 / 14
    num_clusters: int = 64
    cluster_dim: int = 256
    token_dim: int = 256
    mlp_dim: int = 512
    feat_dim: int = 8448
    image_size: int = 322  # resized input (multiple of 14)


# ---------------------------------------------------------------------------
# torch-exact bicubic (a=-0.75, half-pixel, scale-factor semantics)
# ---------------------------------------------------------------------------


def _cubic_weights(t: jnp.ndarray, a: float = -0.75):
    """Cubic convolution weights for the 4 taps around fractional offset t."""
    w0 = a * ((1 + t) ** 3) - 5 * a * ((1 + t) ** 2) + 8 * a * (1 + t) - 4 * a
    t2, t3 = t * t, t * t * t
    w1 = (a + 2) * t3 - (a + 3) * t2 + 1  # tap at floor, distance t
    w2 = (a + 2) * (1 - t) ** 3 - (a + 3) * (1 - t) ** 2 + 1  # floor+1
    w3 = a * (2 - t) ** 3 - 5 * a * (2 - t) ** 2 + 8 * a * (2 - t) - 4 * a
    return jnp.stack([w0, w1, w2, w3], axis=-1)  # (..., 4)


def _bicubic_axis(x: jnp.ndarray, out_size: int, scale: float, axis: int):
    """Resample one axis with torch's bicubic (align_corners=False,
    antialias=False, explicit scale factor: src = (dst + .5)/scale - .5)."""
    n = x.shape[axis]
    dst = jnp.arange(out_size, dtype=jnp.float32)
    src = (dst + 0.5) / scale - 0.5
    fl = jnp.floor(src)
    t = src - fl
    idx = fl.astype(jnp.int32)[:, None] + jnp.arange(-1, 3)[None, :]  # (out, 4)
    idx = jnp.clip(idx, 0, n - 1)
    w = _cubic_weights(t)  # (out, 4)
    taps = jnp.take(x, idx.reshape(-1), axis=axis)
    shape = list(x.shape)
    shape[axis : axis + 1] = [out_size, 4]
    taps = taps.reshape(shape)
    wshape = [1] * taps.ndim
    wshape[axis], wshape[axis + 1] = out_size, 4
    return jnp.sum(taps * w.reshape(wshape), axis=axis + 1)


def interpolate_pos_embed(pos_embed: jnp.ndarray, grid_h: int, grid_w: int, offset: float = 0.1):
    """DINOv2 interpolate_pos_encoding: pos_embed (1, 1+M*M, D) -> patch pos
    embeds resampled to (grid_h, grid_w) with scale=(g+offset)/M bicubic."""
    D = pos_embed.shape[-1]
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:]
    M = int(round(math.sqrt(patch_pe.shape[1])))
    if (grid_h, grid_w) == (M, M):
        return cls_pe, patch_pe
    grid = patch_pe.reshape(M, M, D)
    sy = (grid_h + offset) / M
    sx = (grid_w + offset) / M
    grid = _bicubic_axis(grid, grid_h, sy, axis=0)
    grid = _bicubic_axis(grid, grid_w, sx, axis=1)
    return cls_pe, grid.reshape(1, grid_h * grid_w, D)


# ---------------------------------------------------------------------------
# DINOv2 ViT
# ---------------------------------------------------------------------------


def _layer_norm(x, p, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _attention(x, p, num_heads: int):
    B, N, D = x.shape
    qkv = x @ p["qkv_kernel"] + p["qkv_bias"]  # (B, N, 3D)
    qkv = qkv.reshape(B, N, 3, num_heads, D // num_heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, d)
    scale = (D // num_heads) ** -0.5
    att = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
    att = jax.nn.softmax(att, axis=-1)
    y = jnp.einsum("bhnm,bmhd->bnhd", att, v).reshape(B, N, D)
    return y @ p["proj_kernel"] + p["proj_bias"]


def _mlp(x, p):
    y = x @ p["fc1_kernel"] + p["fc1_bias"]
    y = jax.nn.gelu(y, approximate=False)
    return y @ p["fc2_kernel"] + p["fc2_bias"]


def vit_forward(params: dict, images: jnp.ndarray, opts: MegaLocOptions):
    """images: (B, H, W, 3), ImageNet-normalized, H, W divisible by 14.

    Returns (patch_tokens (B, h, w, D), cls_token (B, D)) after final norm,
    matching dinov2 forward_features' x_norm_patchtokens / x_norm_clstoken."""
    B, H, W, _ = images.shape
    ps = opts.patch_size
    gh, gw = H // ps, W // ps
    x = jax.lax.conv_general_dilated(
        images,
        params["patch_kernel"],
        window_strides=(ps, ps),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_bias"]
    D = x.shape[-1]
    x = x.reshape(B, gh * gw, D)
    cls_pe, patch_pe = interpolate_pos_embed(params["pos_embed"], gh, gw)
    cls = jnp.broadcast_to(params["cls_token"] + cls_pe, (B, 1, D))
    x = jnp.concatenate([cls, x + patch_pe], axis=1)
    nh = opts.num_heads
    for blk in params["blocks"]:
        x = x + blk["ls1"] * _attention(_layer_norm(x, blk["norm1"]), blk["attn"], nh)
        x = x + blk["ls2"] * _mlp(_layer_norm(x, blk["norm2"]), blk["mlp"])
    x = _layer_norm(x, params["norm"])
    return x[:, 1:].reshape(B, gh, gw, D), x[:, 0]


# ---------------------------------------------------------------------------
# SALAD aggregation
# ---------------------------------------------------------------------------


def _log_otp_solver(log_a, log_b, M, num_iters: int = 3):
    """Sinkhorn in log space; M: (B, m+1, n). Port of the reference
    log_otp_solver (thirdparty/megaloc/megaloc.py:125-148, reg=1)."""
    u = jnp.zeros_like(log_a)
    v = jnp.zeros_like(log_b)
    for _ in range(num_iters):
        u = log_a - jax.nn.logsumexp(M + v[:, None, :], axis=2)
        v = log_b - jax.nn.logsumexp(M + u[:, :, None], axis=1)
    return M + u[:, :, None] + v[:, None, :]


def _get_matching_probs(S, dustbin_score, num_iters: int = 3):
    """S: (B, m, n) -> log assignment (B, m+1, n) (reference lines 153-167)."""
    B, m, n = S.shape
    S_aug = jnp.concatenate([S, jnp.full((B, 1, n), dustbin_score)], axis=1)
    norm = -jnp.log(float(n + m))
    log_a = jnp.full((m + 1,), norm).at[-1].add(jnp.log(float(n - m)))
    log_b = jnp.full((n,), norm)
    log_a = jnp.broadcast_to(log_a, (B, m + 1))
    log_b = jnp.broadcast_to(log_b, (B, n))
    log_P = _log_otp_solver(log_a, log_b, S_aug, num_iters=num_iters)
    return log_P - norm


def _l2n(x, axis):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def salad_forward(params: dict, patch_feats: jnp.ndarray, cls_token: jnp.ndarray):
    """patch_feats: (B, h, w, C); cls_token: (B, C) -> (B, m*l + g)."""
    B, h, w, C = patch_feats.shape
    x = patch_feats.reshape(B, h * w, C)  # row-major == torch flatten(2)

    def mlp2(p, y):
        y = y @ p["fc1_kernel"] + p["fc1_bias"]
        y = jax.nn.relu(y)
        return y @ p["fc2_kernel"] + p["fc2_bias"]

    f = mlp2(params["cluster"], x)  # (B, n, l)
    p_score = mlp2(params["score"], x)  # (B, n, m)
    t = mlp2(params["token"], cls_token)  # (B, g)

    logp = _get_matching_probs(p_score.transpose(0, 2, 1), params["dust_bin"], 3)
    p = jnp.exp(logp)[:, :-1, :]  # (B, m, n)

    agg = jnp.einsum("bnl,bmn->blm", f, p)  # (B, l, m)
    agg = _l2n(agg, axis=1).reshape(B, -1)  # flatten in (l, m) order
    out = jnp.concatenate([_l2n(t, axis=-1), agg], axis=-1)
    return _l2n(out, axis=-1)


def megaloc_forward(params: dict, images: jnp.ndarray, opts: MegaLocOptions):
    """images: (B, H, W, 3) ImageNet-normalized -> (B, feat_dim) unit-norm."""
    patch, cls = vit_forward(params["backbone"], images, opts)
    y = salad_forward(params["salad"], patch, cls)
    y = y @ params["linear"]["kernel"] + params["linear"]["bias"]
    return _l2n(y, axis=-1)


# ---------------------------------------------------------------------------
# parameter init / torch conversion
# ---------------------------------------------------------------------------


def init_params(key, opts: MegaLocOptions) -> dict:
    D, nh = opts.embed_dim, opts.num_heads
    M = opts.pretrain_grid

    def dense(k, cin, cout):
        return (
            jax.random.normal(k, (cin, cout)) * (1.0 / np.sqrt(cin)),
            jnp.zeros(cout),
        )

    keys = iter(jax.random.split(key, 16 + 12 * opts.depth))
    backbone = {
        "patch_kernel": jax.random.normal(
            next(keys), (opts.patch_size, opts.patch_size, 3, D)
        )
        * 0.02,
        "patch_bias": jnp.zeros(D),
        "cls_token": jax.random.normal(next(keys), (1, 1, D)) * 0.02,
        "pos_embed": jax.random.normal(next(keys), (1, 1 + M * M, D)) * 0.02,
        "blocks": [],
        "norm": {"scale": jnp.ones(D), "bias": jnp.zeros(D)},
    }
    for _ in range(opts.depth):
        qkv_k, qkv_b = dense(next(keys), D, 3 * D)
        proj_k, proj_b = dense(next(keys), D, D)
        fc1_k, fc1_b = dense(next(keys), D, opts.mlp_ratio * D)
        fc2_k, fc2_b = dense(next(keys), opts.mlp_ratio * D, D)
        backbone["blocks"].append(
            {
                "norm1": {"scale": jnp.ones(D), "bias": jnp.zeros(D)},
                "attn": {
                    "qkv_kernel": qkv_k,
                    "qkv_bias": qkv_b,
                    "proj_kernel": proj_k,
                    "proj_bias": proj_b,
                },
                "ls1": jnp.ones(D),
                "norm2": {"scale": jnp.ones(D), "bias": jnp.zeros(D)},
                "mlp": {
                    "fc1_kernel": fc1_k,
                    "fc1_bias": fc1_b,
                    "fc2_kernel": fc2_k,
                    "fc2_bias": fc2_b,
                },
                "ls2": jnp.ones(D),
            }
        )

    def mlp2_params(k1, k2, cin, mid, cout):
        a_k, a_b = dense(k1, cin, mid)
        b_k, b_b = dense(k2, mid, cout)
        return {"fc1_kernel": a_k, "fc1_bias": a_b, "fc2_kernel": b_k, "fc2_bias": b_b}

    salad = {
        "token": mlp2_params(next(keys), next(keys), D, opts.mlp_dim, opts.token_dim),
        "cluster": mlp2_params(next(keys), next(keys), D, opts.mlp_dim, opts.cluster_dim),
        "score": mlp2_params(next(keys), next(keys), D, opts.mlp_dim, opts.num_clusters),
        "dust_bin": jnp.asarray(1.0),
    }
    lin_k, lin_b = dense(
        next(keys), opts.num_clusters * opts.cluster_dim + opts.token_dim, opts.feat_dim
    )
    return {"backbone": backbone, "salad": salad, "linear": {"kernel": lin_k, "bias": lin_b}}


def load_torch_weights(path: str, opts: Optional[MegaLocOptions] = None):
    """Convert the public megaloc.torch state_dict. Dims are read from the
    tensors, so reduced-dim references (tests) convert through the same path.

    Layout (thirdparty/megaloc/megaloc.py): backbone.model.{cls_token,
    pos_embed, patch_embed.proj, blocks.i.{norm1, attn.qkv, attn.proj, ls1.
    gamma, norm2, mlp.fc1, mlp.fc2, ls2.gamma}, norm}; aggregator.agg.
    {token_features.{0,2}, cluster_features.{0,3}, score.{0,3}, dust_bin};
    aggregator.linear."""
    from gtsfm_tpu.utils.torch_io import load_torch_checkpoint

    sd = load_torch_checkpoint(path)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: np.asarray(v) for k, v in sd.items()}
    pre = "backbone.model."

    def t(name):
        return jnp.asarray(sd[name])

    def lin_t(name):  # torch Linear (O, I) -> (I, O)
        return jnp.asarray(sd[name].T)

    D = sd[pre + "cls_token"].shape[-1]
    patch_w = sd[pre + "patch_embed.proj.weight"]  # (D, 3, p, p)
    ps = patch_w.shape[-1]
    n_blocks = len({k.split(".")[3] for k in sd if k.startswith(pre + "blocks.")})
    M = int(round(math.sqrt(sd[pre + "pos_embed"].shape[1] - 1)))

    backbone = {
        "patch_kernel": jnp.asarray(patch_w.transpose(2, 3, 1, 0)),
        "patch_bias": t(pre + "patch_embed.proj.bias"),
        "cls_token": t(pre + "cls_token"),
        "pos_embed": t(pre + "pos_embed"),
        "blocks": [],
        "norm": {"scale": t(pre + "norm.weight"), "bias": t(pre + "norm.bias")},
    }
    for i in range(n_blocks):
        b = f"{pre}blocks.{i}."
        backbone["blocks"].append(
            {
                "norm1": {"scale": t(b + "norm1.weight"), "bias": t(b + "norm1.bias")},
                "attn": {
                    "qkv_kernel": lin_t(b + "attn.qkv.weight"),
                    "qkv_bias": t(b + "attn.qkv.bias"),
                    "proj_kernel": lin_t(b + "attn.proj.weight"),
                    "proj_bias": t(b + "attn.proj.bias"),
                },
                "ls1": t(b + "ls1.gamma"),
                "norm2": {"scale": t(b + "norm2.weight"), "bias": t(b + "norm2.bias")},
                "mlp": {
                    "fc1_kernel": lin_t(b + "mlp.fc1.weight"),
                    "fc1_bias": t(b + "mlp.fc1.bias"),
                    "fc2_kernel": lin_t(b + "mlp.fc2.weight"),
                    "fc2_bias": t(b + "mlp.fc2.bias"),
                },
                "ls2": t(b + "ls2.gamma"),
            }
        )

    def conv1x1(name):  # torch Conv2d 1x1 (O, I, 1, 1) -> (I, O)
        return jnp.asarray(sd[name][:, :, 0, 0].T)

    agg = "aggregator.agg."
    salad = {
        "token": {
            "fc1_kernel": lin_t(agg + "token_features.0.weight"),
            "fc1_bias": t(agg + "token_features.0.bias"),
            "fc2_kernel": lin_t(agg + "token_features.2.weight"),
            "fc2_bias": t(agg + "token_features.2.bias"),
        },
        "cluster": {
            "fc1_kernel": conv1x1(agg + "cluster_features.0.weight"),
            "fc1_bias": t(agg + "cluster_features.0.bias"),
            "fc2_kernel": conv1x1(agg + "cluster_features.3.weight"),
            "fc2_bias": t(agg + "cluster_features.3.bias"),
        },
        "score": {
            "fc1_kernel": conv1x1(agg + "score.0.weight"),
            "fc1_bias": t(agg + "score.0.bias"),
            "fc2_kernel": conv1x1(agg + "score.3.weight"),
            "fc2_bias": t(agg + "score.3.bias"),
        },
        "dust_bin": t(agg + "dust_bin"),
    }
    params = {
        "backbone": backbone,
        "salad": salad,
        "linear": {
            "kernel": lin_t("aggregator.linear.weight"),
            "bias": t("aggregator.linear.bias"),
        },
    }
    if opts is None:
        opts = MegaLocOptions()
    head_dim = 64 if D % 64 == 0 else 16
    num_heads = opts.num_heads if D == opts.embed_dim else max(1, D // head_dim)
    opts = opts._replace(
        embed_dim=D,
        depth=n_blocks,
        num_heads=num_heads,
        patch_size=ps,
        pretrain_grid=M,
        num_clusters=salad["score"]["fc2_bias"].shape[0],
        cluster_dim=salad["cluster"]["fc2_bias"].shape[0],
        token_dim=salad["token"]["fc2_bias"].shape[0],
        mlp_dim=salad["token"]["fc1_bias"].shape[0],
        feat_dim=params["linear"]["bias"].shape[0],
    )
    return params, opts


# ---------------------------------------------------------------------------
# component
# ---------------------------------------------------------------------------

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class MegaLocDescriptor:
    """describe_batch over MegaLoc. Images: (B, H, W) grayscale or
    (B, H, W, 3) RGB in [0, 1]; resized to image_size and ImageNet-
    normalized like the reference wrapper's preprocessing transforms."""

    def __init__(
        self,
        options: MegaLocOptions = MegaLocOptions(),
        weights_path: Optional[str] = None,
        params: Optional[dict] = None,
        test_small: bool = False,
    ):
        if weights_path is not None and params is None:
            params, options = load_torch_weights(weights_path, options)
        if params is None:
            if test_small:
                options = options._replace(
                    embed_dim=32, depth=2, num_heads=2, pretrain_grid=5,
                    num_clusters=8, cluster_dim=16, token_dim=16, mlp_dim=32,
                    feat_dim=64, image_size=70,
                )
            params = init_params(jax.random.PRNGKey(0), options)
        self.options = options
        self.params = params
        self._fwd = jax.jit(partial(megaloc_forward, opts=options))

    def describe_batch(self, images: np.ndarray) -> np.ndarray:
        x = np.asarray(images, np.float32)
        if x.ndim == 3:
            x = np.repeat(x[..., None], 3, axis=-1)
        s = self.options.image_size
        xj = jnp.asarray(x)
        if xj.shape[1:3] != (s, s):
            xj = jax.image.resize(xj, (xj.shape[0], s, s, 3), method="bilinear")
        xj = (xj - _IMAGENET_MEAN) / _IMAGENET_STD
        return np.asarray(self._fwd(self.params, xj))
