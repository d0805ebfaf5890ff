"""Exact VGGT (facebookresearch/vggt layout) feed-forward reconstruction
model in JAX.

Parity: /root/reference/gtsfm/frontend/vggt.py:800 (run_VGGT: aggregator
-> camera head -> DPT depth head -> unprojection; the reference's 1,304
LoC wrapper over the public VGGT-1B, "VGGT: Visual Geometry Grounded
Transformer", Wang et al., CVPR 2025). Faithful re-expression of the
public architecture so the facebook/VGGT-1B state_dict converts
one-to-one:

  aggregator     DINOv2 ViT-L/14-reg4 patch embed (cls + 4 register
                 tokens, LayerScale, bicubic pos-embed interpolation),
                 then 24 ALTERNATING-ATTENTION layers: a frame block
                 (attention within each frame's tokens) followed by a
                 global block (attention across all frames) — both
                 DINOv2-style blocks with qk-norm and 2D RoPE (freq 100)
                 over patch positions (special tokens at position 0);
                 per-frame camera token + 4 register tokens, with
                 SEPARATE learned values for frame 0 vs the rest
                 (slice_expand_and_flatten); every layer's frame+global
                 outputs concatenated to 2C for the heads
  camera_head    iterative (4x) AdaLN-modulated 4-block trunk over the
                 camera tokens predicting absT_quaR_FoV pose encodings
  depth_head     DPT over 4 intermediate aggregator layers (projects +
                 resize pyramid + scratch refinenets + output convs),
                 exp depth activation, 1+exp confidence
  point_head     same DPT family predicting 3D points directly (XYZ via
                 the inv_log activation + confidence)

The uv-grid positional embedding inside the public DPT head is
parameter-free and NOT reproduced here (pos_embed=False both sides of
the exactness test); enable-and-golden-check it when the real
checkpoint is reachable. The CoTracker-style track head is the exact
port in frontend/vggt_track.py (converted alongside when track_head.*
keys are present; VGGTModel.track()).

load_torch_weights() consumes the public model.state_dict() naming
(aggregator.patch_embed.* / aggregator.frame_blocks.N.* /
aggregator.global_blocks.N.* / camera_head.* / depth_head.* /
point_head.*); dims are read from tensor shapes, so the converter is
verified layer-for-layer against a reduced-dim torch mirror in
tests/frontend/test_vggt_exact.py.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.frontend.global_descriptors.megaloc import (
    _layer_norm,
    _mlp,
    interpolate_pos_embed,
)
from gtsfm_tpu.frontend.mast3r import apply_rope2d

_RESNET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_RESNET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGGTOptions(NamedTuple):
    embed_dim: int = 1024
    depth: int = 24  # alternating frame/global layer pairs
    num_heads: int = 16
    mlp_ratio: int = 4
    patch_size: int = 14
    num_register_tokens: int = 4
    rope_freq: float = 100.0
    init_values: float = 0.01  # LayerScale init (converted, not used at init)
    # DINO patch embed (ViT-L/14 reg4)
    dino_depth: int = 24
    dino_heads: int = 16
    dino_pretrain_grid: int = 37  # 518 / 14
    # camera head
    camera_trunk_depth: int = 4
    camera_iterations: int = 4
    pose_dim: int = 9  # absT(3) + quaR(4) + FoV(2)
    # DPT heads
    dpt_features: int = 256
    dpt_out_channels: tuple = (256, 512, 1024, 1024)
    intermediate_layer_idx: tuple = (4, 11, 17, 23)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def _attention_qknorm_rope(x, p, num_heads: int, pos=None, rope_freq: float = 0.0,
                           eps: float = 1e-5):
    """DINOv2-style attention block with optional per-head qk LayerNorm and
    2D RoPE on (y, x) positions (vggt/layers/{block,rope}.py)."""
    N, D = x.shape
    h = num_heads
    dh = D // h
    qkv = x @ p["qkv_kernel"] + p["qkv_bias"]  # (N, 3D)
    qkv = qkv.reshape(N, 3, h, dh)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]  # (N, h, dh)
    if "q_norm" in p:
        q = _layer_norm(q, p["q_norm"], eps)
        k = _layer_norm(k, p["k_norm"], eps)
    if pos is not None and rope_freq > 0:
        # (N, h, dh) -> (1, h, N, dh) for the shared rope helper
        q = apply_rope2d(q.transpose(1, 0, 2)[None], pos, rope_freq)[0].transpose(1, 0, 2)
        k = apply_rope2d(k.transpose(1, 0, 2)[None], pos, rope_freq)[0].transpose(1, 0, 2)
    att = jnp.einsum("nhd,mhd->hnm", q * dh**-0.5, k)
    att = jax.nn.softmax(att, axis=-1)
    y = jnp.einsum("hnm,mhd->nhd", att, v).reshape(N, D)
    return y @ p["proj_kernel"] + p["proj_bias"]


def _block(x, p, num_heads: int, pos=None, rope_freq: float = 0.0,
           eps: float = 1e-5):
    """eps: LayerNorm epsilon — the DINO patch embed blocks use 1e-6
    (dinov2 convention), VGGT's own blocks the torch default 1e-5."""
    ls1 = p.get("ls1", 1.0)
    ls2 = p.get("ls2", 1.0)
    x = x + ls1 * _attention_qknorm_rope(
        _layer_norm(x, p["norm1"], eps), p["attn"], num_heads, pos, rope_freq, eps
    )
    x = x + ls2 * _mlp(_layer_norm(x, p["norm2"], eps), p["mlp"])
    return x


# ---------------------------------------------------------------------------
# DINOv2 patch embed with register tokens
# ---------------------------------------------------------------------------


def dino_forward(params: dict, images: jnp.ndarray, opts: VGGTOptions):
    """images: (S, H, W, 3) resnet-normalized. Returns x_norm_patchtokens
    (S, P, D) — DINOv2 ViT-L/14-reg forward_features (registers inserted
    after the cls token, positional embedding on cls+patches only)."""
    S, H, W, _ = images.shape
    ps = opts.patch_size
    gh, gw = H // ps, W // ps
    x = jax.lax.conv_general_dilated(
        images, params["patch_kernel"], window_strides=(ps, ps), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_bias"]
    D = x.shape[-1]
    x = x.reshape(S, gh * gw, D)
    cls_pe, patch_pe = interpolate_pos_embed(params["pos_embed"], gh, gw)
    cls = jnp.broadcast_to(params["cls_token"] + cls_pe, (S, 1, D))
    regs = jnp.broadcast_to(params["register_tokens"], (S, params["register_tokens"].shape[1], D))
    x = jnp.concatenate([cls, regs, x + patch_pe], axis=1)
    for blk in params["blocks"]:
        x = jax.vmap(lambda t: _block(t, blk, opts.dino_heads, eps=1e-6))(x)
    x = _layer_norm(x, params["norm"], 1e-6)
    return x[:, 1 + regs.shape[1]:]


# ---------------------------------------------------------------------------
# aggregator
# ---------------------------------------------------------------------------


def _slice_expand(token, S):
    """(2, X, C): row 0 for frame 0, row 1 for frames 1..S-1 -> (S, X, C)
    (vggt/models/aggregator.py slice_expand_and_flatten)."""
    first = token[0:1]
    rest = jnp.broadcast_to(token[1:2], (S - 1,) + token.shape[1:])
    return jnp.concatenate([first, rest], axis=0)


def aggregator_forward(params: dict, images: jnp.ndarray, opts: VGGTOptions):
    """images: (S, H, W, 3) in [0, 1]. Returns (outputs list of
    (S, L, 2C) per alternating layer, patch_start_idx)."""
    o = opts
    S, H, W, _ = images.shape
    ps = o.patch_size
    gh, gw = H // ps, W // ps
    P = gh * gw
    imgs = (images - _RESNET_MEAN) / _RESNET_STD
    patch_tokens = dino_forward(params["patch_embed"], imgs, o)  # (S, P, C)
    C = patch_tokens.shape[-1]

    cam = _slice_expand(params["camera_token"], S)  # (S, 1, C)
    regs = _slice_expand(params["register_token"], S)  # (S, R, C)
    tokens = jnp.concatenate([cam, regs, patch_tokens], axis=1)  # (S, L, C)
    patch_start = 1 + regs.shape[1]
    L = tokens.shape[1]

    # rope positions: patch (y, x) shifted +1; special tokens at (0, 0)
    yy, xx = jnp.meshgrid(jnp.arange(gh), jnp.arange(gw), indexing="ij")
    pos_patch = jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1) + 1
    pos = jnp.concatenate(
        [jnp.zeros((patch_start, 2), jnp.int32), pos_patch.astype(jnp.int32)]
    )  # (L, 2) per frame
    pos_global = jnp.tile(pos, (S, 1))  # (S*L, 2)

    outputs = []
    for i in range(o.depth):
        # frame attention: within each frame
        tokens = jax.vmap(
            lambda t: _block(t, params["frame_blocks"][i], o.num_heads, pos, o.rope_freq)
        )(tokens)
        frame_out = tokens
        # global attention: across all frames
        flat = tokens.reshape(S * L, C)
        flat = _block(flat, params["global_blocks"][i], o.num_heads, pos_global, o.rope_freq)
        tokens = flat.reshape(S, L, C)
        outputs.append(jnp.concatenate([frame_out, tokens], axis=-1))  # (S, L, 2C)
    return outputs, patch_start


# ---------------------------------------------------------------------------
# camera head
# ---------------------------------------------------------------------------


def camera_head_forward(params: dict, outputs: list, opts: VGGTOptions):
    """-> pose encodings (S, 9) after the last refinement iteration
    (vggt/heads/camera_head.py: AdaLN-modulated iterative trunk)."""
    o = opts
    tokens = outputs[-1][:, 0]  # camera token, (S, 2C)
    tokens = _layer_norm(tokens, params["token_norm"], 1e-5)
    S = tokens.shape[0]
    pred = None
    for _ in range(o.camera_iterations):
        if pred is None:
            inp = jnp.broadcast_to(params["empty_pose_tokens"], (S, o.pose_dim))
        else:
            inp = jax.lax.stop_gradient(pred)
        mod_in = inp @ params["embed_pose_kernel"] + params["embed_pose_bias"]
        mod = jax.nn.silu(mod_in) @ params["mod_kernel"] + params["mod_bias"]
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        # adaLN (no affine) + modulate + gate, residual onto the raw tokens
        mu = jnp.mean(tokens, axis=-1, keepdims=True)
        var = jnp.var(tokens, axis=-1, keepdims=True)
        normed = (tokens - mu) * jax.lax.rsqrt(var + 1e-5)
        t = gate * (normed * (1 + scale) + shift) + tokens
        for blk in params["trunk"]:
            t = _block(t, blk, o.num_heads)
        delta = _mlp_2layer(
            _layer_norm(t, params["trunk_norm"], 1e-5), params["pose_branch"]
        )
        pred = delta if pred is None else pred + delta
    return pred


def _mlp_2layer(x, p):
    y = x @ p["fc1_kernel"] + p["fc1_bias"]
    y = jax.nn.gelu(y, approximate=False)
    return y @ p["fc2_kernel"] + p["fc2_bias"]


def pose_encoding_to_extri_intri(pose_enc: jnp.ndarray, hw) -> tuple:
    """absT_quaR_FoV encoding (S, 9) -> (extrinsic (S, 3, 4) world->cam,
    intrinsic (S, 3, 3)) — vggt/utils/pose_enc.py."""
    H, W = hw
    T = pose_enc[:, :3]
    quat = pose_enc[:, 3:7]
    fov_h = pose_enc[:, 7]
    fov_w = pose_enc[:, 8]
    R = _quat_to_mat(quat)
    extri = jnp.concatenate([R, T[:, :, None]], axis=-1)
    fy = (H / 2.0) / jnp.tan(fov_h / 2.0)
    fx = (W / 2.0) / jnp.tan(fov_w / 2.0)
    S = pose_enc.shape[0]
    K = jnp.zeros((S, 3, 3))
    K = K.at[:, 0, 0].set(fx).at[:, 1, 1].set(fy)
    K = K.at[:, 0, 2].set(W / 2.0).at[:, 1, 2].set(H / 2.0).at[:, 2, 2].set(1.0)
    return extri, K


def _quat_to_mat(quat: jnp.ndarray) -> jnp.ndarray:
    """(S, 4) quaternion, real part LAST (x, y, z, w) as in
    vggt/utils/rotation.py, unnormalized -> rotation matrices."""
    q = quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-9)
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# DPT head
# ---------------------------------------------------------------------------


def _conv2d(x, p, stride=1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"]
    return y


def _conv_transpose2d(x, p, stride):
    y = jax.lax.conv_transpose(
        x, p["kernel"], strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"]
    return y


def _interp_bilinear_ac(x, out_h, out_w):
    """Bilinear resize with align_corners=True on (N, H, W, C)."""
    n, h, w, c = x.shape

    def axis_resize(a, axis, out):
        m = a.shape[axis]
        if m == out:
            return a
        if m == 1:
            reps = [1] * a.ndim
            reps[axis] = out
            return jnp.tile(a, reps)
        pos = jnp.arange(out, dtype=jnp.float32) * (m - 1) / (out - 1)
        i0 = jnp.floor(pos).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, m - 1)
        f = pos - i0
        a0 = jnp.take(a, i0, axis=axis)
        a1 = jnp.take(a, i1, axis=axis)
        shape = [1] * a.ndim
        shape[axis] = out
        return a0 + (a1 - a0) * f.reshape(shape)

    return axis_resize(axis_resize(x, 1, out_h), 2, out_w)


def _residual_conv_unit(x, p):
    y = jax.nn.relu(x)
    y = _conv2d(y, p["conv1"])
    y = jax.nn.relu(y)
    y = _conv2d(y, p["conv2"])
    return x + y


def _fusion_block(p, x, skip=None, out_hw=None):
    out = x
    if skip is not None:
        out = out + _residual_conv_unit(skip, p["resConfUnit1"])
    out = _residual_conv_unit(out, p["resConfUnit2"])
    if out_hw is None:
        out_hw = (2 * out.shape[1], 2 * out.shape[2])
    out = _interp_bilinear_ac(out, *out_hw)
    return _conv2d(out, p["out_conv"])


def dpt_head_forward(params: dict, outputs: list, patch_start: int,
                     image_hw, opts: VGGTOptions, activation: str = "exp",
                     down_ratio: int = 1):
    """DPT fusion over 4 intermediate aggregator layers -> per-pixel
    (value, confidence) at full image resolution
    (vggt/heads/dpt_head.py, the DepthAnything DPT family).

    activation="features" is the head's feature_only mode (the track
    head's feature extractor): the fused pyramid stops after
    output_conv1, resized to (H, W) / down_ratio, and returns feature
    maps instead of (value, confidence)."""
    o = opts
    H, W = image_hw
    gh, gw = H // o.patch_size, W // o.patch_size
    feats = []
    for k, li in enumerate(o.intermediate_layer_idx):
        t = outputs[li][:, patch_start:]  # (S, P, 2C)
        t = _layer_norm(t, params["norm"], 1e-5)
        x = t.reshape(t.shape[0], gh, gw, t.shape[-1])
        x = _conv2d(x, params["projects"][k], padding="VALID")
        if k == 0:
            x = _conv_transpose2d(x, params["resize"][0], 4)
        elif k == 1:
            x = _conv_transpose2d(x, params["resize"][1], 2)
        elif k == 3:
            # torch Conv2d(k=3, stride=2, padding=1): explicit (1, 1) pads
            # (XLA SAME would pad (0, 1) at even sizes — different taps)
            x = _conv2d(x, params["resize"][3], stride=2, padding=((1, 1), (1, 1)))
        x = _conv2d(x, params["scratch"][f"layer{k + 1}_rn"])
        feats.append(x)

    l1, l2, l3, l4 = feats
    p = params["scratch"]
    path4 = _fusion_block(p["refinenet4"], l4, out_hw=(l3.shape[1], l3.shape[2]))
    path3 = _fusion_block(p["refinenet3"], path4, l3, out_hw=(l2.shape[1], l2.shape[2]))
    path2 = _fusion_block(p["refinenet2"], path3, l2, out_hw=(l1.shape[1], l1.shape[2]))
    path1 = _fusion_block(p["refinenet1"], path2, l1)
    out = _conv2d(path1, params["output_conv1"])
    out = _interp_bilinear_ac(
        out, gh * o.patch_size // down_ratio, gw * o.patch_size // down_ratio
    )
    if activation == "features":
        return out
    out = _conv2d(out, params["output_conv2_0"])
    out = jax.nn.relu(out)
    out = _conv2d(out, params["output_conv2_2"], padding="VALID")
    if activation == "raw":
        return out
    val = out[..., :-1]
    conf_raw = out[..., -1]
    if activation == "exp":
        val = jnp.exp(val)
    elif activation == "inv_log":
        # vggt inv_log: sign(x) * (exp(|x|) - 1)
        val = jnp.sign(val) * (jnp.expm1(jnp.abs(val)))
    conf = 1.0 + jnp.exp(conf_raw)
    return val, conf


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------


class VGGTModel:
    """run(images (S, H, W, 3) in [0,1]) -> dict with extrinsic (S, 3, 4)
    world->cam, intrinsic (S, 3, 3), depth (S, H, W), depth_conf (S, H, W)
    — the run_VGGT contract (reference vggt.py:800-886)."""

    def __init__(self, options: VGGTOptions = VGGTOptions(), params=None,
                 seed: int = 0):
        self.options = options
        self.params = params if params is not None else init_params(
            jax.random.PRNGKey(seed), options
        )
        self._fwd = jax.jit(partial(_vggt_forward, opts=self.options))
        self._fwd_track = None

    def run(self, images: jnp.ndarray) -> dict:
        extri, intri, depth, conf = self._fwd(self.params, jnp.asarray(images))
        return {
            "extrinsic": extri, "intrinsic": intri,
            "depth": depth, "depth_conf": conf,
        }

    @property
    def has_track_head(self) -> bool:
        return "track_head" in self.params

    def track(self, images: jnp.ndarray, query_points: jnp.ndarray) -> dict:
        """Track query_points (N, 2) pixel xy of frame 0 across all frames
        via the exact CoTracker-style track head (model.track_head parity,
        reference vggt.py:1104). Returns tracks (S, N, 2), vis (S, N),
        conf (S, N)."""
        from gtsfm_tpu.frontend.vggt_track import (
            track_head_forward,
            track_options_from_params,
        )

        if self._fwd_track is None:
            topts = track_options_from_params(self.params["track_head"])

            def fwd(params, imgs, qp):
                S, H, W, _ = imgs.shape
                outputs, ps = aggregator_forward(params["aggregator"], imgs, self.options)
                coord_preds, vis, conf = track_head_forward(
                    params["track_head"], outputs, ps, (H, W), qp,
                    self.options, topts,
                )
                return coord_preds[-1], vis, conf

            self._fwd_track = jax.jit(fwd)
        tracks, vis, conf = self._fwd_track(
            self.params, jnp.asarray(images), jnp.asarray(query_points)
        )
        return {"tracks": tracks, "vis": vis, "conf": conf}


def _vggt_forward(params, images, opts: VGGTOptions):
    S, H, W, _ = images.shape
    outputs, patch_start = aggregator_forward(params["aggregator"], images, opts)
    pose_enc = camera_head_forward(params["camera_head"], outputs, opts)
    extri, intri = pose_encoding_to_extri_intri(pose_enc, (H, W))
    depth, conf = dpt_head_forward(
        params["depth_head"], outputs, patch_start, (H, W), opts, activation="exp"
    )
    return extri, intri, depth[..., 0], conf


# ---------------------------------------------------------------------------
# init (random, for shape tests) + torch conversion
# ---------------------------------------------------------------------------


def init_params(key, o: VGGTOptions) -> dict:
    ks = iter(jax.random.split(key, 4096))
    C = o.embed_dim
    sd = 0.02

    def dense(cin, cout, bias=True):
        p = {"kernel": jax.random.normal(next(ks), (cin, cout)) * sd}
        if bias:
            p["bias"] = jnp.zeros(cout)
        return p

    def ln(c):
        return {"scale": jnp.ones(c), "bias": jnp.zeros(c)}

    def blk(c, heads, qk_norm):
        dh = c // heads
        p = {
            "norm1": ln(c), "norm2": ln(c),
            "attn": {
                "qkv_kernel": jax.random.normal(next(ks), (c, 3 * c)) * sd,
                "qkv_bias": jnp.zeros(3 * c),
                "proj_kernel": jax.random.normal(next(ks), (c, c)) * sd,
                "proj_bias": jnp.zeros(c),
            },
            "mlp": {
                "fc1_kernel": jax.random.normal(next(ks), (c, o.mlp_ratio * c)) * sd,
                "fc1_bias": jnp.zeros(o.mlp_ratio * c),
                "fc2_kernel": jax.random.normal(next(ks), (o.mlp_ratio * c, c)) * sd,
                "fc2_bias": jnp.zeros(c),
            },
            "ls1": jnp.full(c, o.init_values),
            "ls2": jnp.full(c, o.init_values),
        }
        if qk_norm:
            p["attn"]["q_norm"] = ln(dh)
            p["attn"]["k_norm"] = ln(dh)
        return p

    g = o.dino_pretrain_grid
    dino = {
        "patch_kernel": jax.random.normal(next(ks), (o.patch_size, o.patch_size, 3, C)) * sd,
        "patch_bias": jnp.zeros(C),
        "cls_token": jax.random.normal(next(ks), (1, 1, C)) * sd,
        "register_tokens": jax.random.normal(next(ks), (1, o.num_register_tokens, C)) * sd,
        "pos_embed": jax.random.normal(next(ks), (1, 1 + g * g, C)) * sd,
        "blocks": [blk(C, o.dino_heads, False) for _ in range(o.dino_depth)],
        "norm": ln(C),
    }
    aggregator = {
        "patch_embed": dino,
        "camera_token": jax.random.normal(next(ks), (2, 1, C)) * sd,
        "register_token": jax.random.normal(next(ks), (2, o.num_register_tokens, C)) * sd,
        "frame_blocks": [blk(C, o.num_heads, True) for _ in range(o.depth)],
        "global_blocks": [blk(C, o.num_heads, True) for _ in range(o.depth)],
    }
    C2 = 2 * C
    camera_head = {
        "token_norm": ln(C2),
        "trunk": [blk(C2, o.num_heads, True) for _ in range(o.camera_trunk_depth)],
        "trunk_norm": ln(C2),
        "empty_pose_tokens": jnp.zeros((1, o.pose_dim)),
        "embed_pose_kernel": jax.random.normal(next(ks), (o.pose_dim, C2)) * sd,
        "embed_pose_bias": jnp.zeros(C2),
        "mod_kernel": jax.random.normal(next(ks), (C2, 3 * C2)) * sd,
        "mod_bias": jnp.zeros(3 * C2),
        "pose_branch": {
            "fc1_kernel": jax.random.normal(next(ks), (C2, C2 // 2)) * sd,
            "fc1_bias": jnp.zeros(C2 // 2),
            "fc2_kernel": jax.random.normal(next(ks), (C2 // 2, o.pose_dim)) * sd,
            "fc2_bias": jnp.zeros(o.pose_dim),
        },
    }

    def conv(cin, cout, k, bias=True):
        p = {"kernel": jax.random.normal(next(ks), (k, k, cin, cout)) * sd}
        if bias:
            p["bias"] = jnp.zeros(cout)
        return p

    F = o.dpt_features
    oc = o.dpt_out_channels

    def dpt():
        return {
            "norm": ln(C2),
            "projects": [conv(C2, c, 1) for c in oc],
            "resize": [conv(oc[0], oc[0], 4), conv(oc[1], oc[1], 2), None,
                       conv(oc[3], oc[3], 3)],
            "scratch": {
                **{f"layer{i + 1}_rn": conv(oc[i], F, 3, bias=False) for i in range(4)},
                **{
                    f"refinenet{i}": {
                        "resConfUnit1": {"conv1": conv(F, F, 3), "conv2": conv(F, F, 3)},
                        "resConfUnit2": {"conv1": conv(F, F, 3), "conv2": conv(F, F, 3)},
                        "out_conv": conv(F, F, 1),
                    }
                    for i in range(1, 5)
                },
            },
            "output_conv1": conv(F, F // 2, 3),
            "output_conv2_0": conv(F // 2, 32, 3),
            "output_conv2_2": conv(32, 2, 1),
        }

    return {
        "aggregator": aggregator,
        "camera_head": camera_head,
        "depth_head": dpt(),
    }


def convert_torch_state_dict(sd: dict, opts: Optional[VGGTOptions] = None) -> tuple:
    """Public VGGT state_dict -> (params, VGGTOptions). Dims are read from
    tensor shapes."""

    def t(name):
        v = sd[name]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                          np.float32)

    C = t("aggregator.camera_token").shape[-1]
    depth = max(
        int(k.split(".")[2]) for k in sd if k.startswith("aggregator.frame_blocks.")
    ) + 1
    dino_depth = max(
        int(k.split(".")[3]) for k in sd if k.startswith("aggregator.patch_embed.blocks.")
    ) + 1
    n_reg = t("aggregator.register_token").shape[-2]
    grid = int(math.isqrt(t("aggregator.patch_embed.pos_embed").shape[1] - 1))
    mlp_ratio = (
        t("aggregator.frame_blocks.0.mlp.fc1.weight").shape[0] // C
    )
    heads = C // t(
        "aggregator.frame_blocks.0.attn.q_norm.weight"
    ).shape[0] if "aggregator.frame_blocks.0.attn.q_norm.weight" in sd else 16
    dpt_oc = tuple(
        t(f"depth_head.projects.{i}.weight").shape[0] for i in range(4)
    )
    F = t("depth_head.scratch.layer1_rn.weight").shape[0]
    trunk_depth = max(
        int(k.split(".")[2]) for k in sd if k.startswith("camera_head.trunk.")
    ) + 1
    if opts is None:
        opts = VGGTOptions(
            embed_dim=C, depth=depth, num_heads=heads, mlp_ratio=mlp_ratio,
            num_register_tokens=n_reg, dino_depth=dino_depth, dino_heads=heads,
            dino_pretrain_grid=grid, camera_trunk_depth=trunk_depth,
            dpt_features=F, dpt_out_channels=dpt_oc,
        )

    def lin(name, bias=True):
        p = {"kernel": jnp.asarray(t(f"{name}.weight").T)}
        if bias:
            p["bias"] = jnp.asarray(t(f"{name}.bias"))
        return p

    def ln(name):
        return {"scale": jnp.asarray(t(f"{name}.weight")),
                "bias": jnp.asarray(t(f"{name}.bias"))}

    def conv(name, bias=True):
        p = {"kernel": jnp.asarray(t(f"{name}.weight").transpose(2, 3, 1, 0))}
        if bias:
            p["bias"] = jnp.asarray(t(f"{name}.bias"))
        return p

    def convT(name):
        # torch ConvTranspose2d weight (in, out, kh, kw): spatial flip +
        # (kh, kw, in, out) matches lax.conv_transpose VALID semantics
        # (verified numerically: transpose_kernel=False needs the flip)
        w = t(f"{name}.weight")[:, :, ::-1, ::-1]
        return {
            "kernel": jnp.asarray(w.transpose(2, 3, 0, 1).copy()),
            "bias": jnp.asarray(t(f"{name}.bias")),
        }

    def blk(prefix, qk_norm):
        p = {
            "norm1": ln(f"{prefix}.norm1"),
            "norm2": ln(f"{prefix}.norm2"),
            "attn": {
                "qkv_kernel": jnp.asarray(t(f"{prefix}.attn.qkv.weight").T),
                "qkv_bias": jnp.asarray(t(f"{prefix}.attn.qkv.bias")),
                "proj_kernel": jnp.asarray(t(f"{prefix}.attn.proj.weight").T),
                "proj_bias": jnp.asarray(t(f"{prefix}.attn.proj.bias")),
            },
            "mlp": {
                "fc1_kernel": jnp.asarray(t(f"{prefix}.mlp.fc1.weight").T),
                "fc1_bias": jnp.asarray(t(f"{prefix}.mlp.fc1.bias")),
                "fc2_kernel": jnp.asarray(t(f"{prefix}.mlp.fc2.weight").T),
                "fc2_bias": jnp.asarray(t(f"{prefix}.mlp.fc2.bias")),
            },
        }
        if f"{prefix}.ls1.gamma" in sd:
            p["ls1"] = jnp.asarray(t(f"{prefix}.ls1.gamma"))
            p["ls2"] = jnp.asarray(t(f"{prefix}.ls2.gamma"))
        if qk_norm and f"{prefix}.attn.q_norm.weight" in sd:
            p["attn"]["q_norm"] = ln(f"{prefix}.attn.q_norm")
            p["attn"]["k_norm"] = ln(f"{prefix}.attn.k_norm")
        return p

    pe = "aggregator.patch_embed"
    dino = {
        "patch_kernel": jnp.asarray(
            t(f"{pe}.patch_embed.proj.weight").transpose(2, 3, 1, 0)
        ),
        "patch_bias": jnp.asarray(t(f"{pe}.patch_embed.proj.bias")),
        "cls_token": jnp.asarray(t(f"{pe}.cls_token")),
        "register_tokens": jnp.asarray(t(f"{pe}.register_tokens")),
        "pos_embed": jnp.asarray(t(f"{pe}.pos_embed")),
        "blocks": [blk(f"{pe}.blocks.{i}", False) for i in range(opts.dino_depth)],
        "norm": ln(f"{pe}.norm"),
    }
    aggregator = {
        "patch_embed": dino,
        "camera_token": jnp.asarray(t("aggregator.camera_token")[0]),
        "register_token": jnp.asarray(t("aggregator.register_token")[0]),
        "frame_blocks": [
            blk(f"aggregator.frame_blocks.{i}", True) for i in range(opts.depth)
        ],
        "global_blocks": [
            blk(f"aggregator.global_blocks.{i}", True) for i in range(opts.depth)
        ],
    }
    camera_head = {
        "token_norm": ln("camera_head.token_norm"),
        "trunk": [blk(f"camera_head.trunk.{i}", True) for i in range(opts.camera_trunk_depth)],
        "trunk_norm": ln("camera_head.trunk_norm"),
        "empty_pose_tokens": jnp.asarray(t("camera_head.empty_pose_tokens").reshape(1, -1)),
        "embed_pose_kernel": jnp.asarray(t("camera_head.embed_pose.weight").T),
        "embed_pose_bias": jnp.asarray(t("camera_head.embed_pose.bias")),
        # poseLN_modulation = Sequential(SiLU, Linear) -> index 1
        "mod_kernel": jnp.asarray(t("camera_head.poseLN_modulation.1.weight").T),
        "mod_bias": jnp.asarray(t("camera_head.poseLN_modulation.1.bias")),
        "pose_branch": {
            "fc1_kernel": jnp.asarray(t("camera_head.pose_branch.fc1.weight").T),
            "fc1_bias": jnp.asarray(t("camera_head.pose_branch.fc1.bias")),
            "fc2_kernel": jnp.asarray(t("camera_head.pose_branch.fc2.weight").T),
            "fc2_bias": jnp.asarray(t("camera_head.pose_branch.fc2.bias")),
        },
    }

    def dpt(head):
        return {
            "norm": ln(f"{head}.norm"),
            "projects": [conv(f"{head}.projects.{i}") for i in range(4)],
            "resize": [convT(f"{head}.resize_layers.0"),
                       convT(f"{head}.resize_layers.1"), None,
                       conv(f"{head}.resize_layers.3")],
            "scratch": {
                **{f"layer{i + 1}_rn": conv(f"{head}.scratch.layer{i + 1}_rn", bias=False)
                   for i in range(4)},
                **{
                    f"refinenet{i}": {
                        "resConfUnit1": {
                            "conv1": conv(f"{head}.scratch.refinenet{i}.resConfUnit1.conv1"),
                            "conv2": conv(f"{head}.scratch.refinenet{i}.resConfUnit1.conv2"),
                        },
                        "resConfUnit2": {
                            "conv1": conv(f"{head}.scratch.refinenet{i}.resConfUnit2.conv1"),
                            "conv2": conv(f"{head}.scratch.refinenet{i}.resConfUnit2.conv2"),
                        },
                        "out_conv": conv(f"{head}.scratch.refinenet{i}.out_conv"),
                    }
                    for i in range(1, 5)
                },
            },
            "output_conv1": conv(f"{head}.scratch.output_conv1"),
            "output_conv2_0": conv(f"{head}.scratch.output_conv2.0"),
            "output_conv2_2": conv(f"{head}.scratch.output_conv2.2"),
        }

    params = {
        "aggregator": aggregator,
        "camera_head": camera_head,
        "depth_head": dpt("depth_head"),
    }
    if "point_head.norm.weight" in sd:
        params["point_head"] = dpt("point_head")
    if "track_head.tracker.fmap_norm.weight" in sd:
        from gtsfm_tpu.frontend.vggt_track import convert_torch_track_state_dict

        params["track_head"], _ = convert_torch_track_state_dict(sd)
    return params, opts


def load_torch_weights(path: str):
    """facebook/VGGT-1B checkpoint -> (params, options)."""
    from gtsfm_tpu.utils.torch_io import load_torch_checkpoint

    ckpt = load_torch_checkpoint(path)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k[len("model."):] if k.startswith("model.") else k: v for k, v in sd.items()}
    return convert_torch_state_dict(sd)
