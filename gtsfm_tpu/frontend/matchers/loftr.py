"""Exact LoFTR (kornia layout) detector-free matcher in Flax.

Parity: /root/reference/gtsfm/frontend/matcher/loftr.py (wraps
kornia.feature.LoFTR, the public ZJU LoFTR architecture: Sun et al.,
CVPR 2021). Faithful re-expression of the released "ds" (dual-softmax)
models so the official outdoor_ds.ckpt / indoor_ds_new.ckpt state_dicts
convert one-to-one:

- backbone: ResNetFPN_8_2 (conv7x7/2 + three 2-BasicBlock stages ->
  1/8 coarse 256-d + FPN top-down fusion -> 1/2 fine 128-d), BatchNorm
  folded to affine pairs at conversion (exact in eval mode)
- PositionEncodingSine added to coarse features (the released models were
  trained with the historical "temp bug" divisor — reproduced bit-for-bit
  behind temp_bug_fix=False, kornia's default for pretrained weights)
- loftr_coarse: 8 alternating self/cross LoFTREncoderLayers, LINEAR
  attention (elu+1 feature maps, value-length normalization, eps 1e-6),
  bias-free q/k/v/merge projections, LayerNorm + concat-MLP residual
- coarse matching: 1/sqrt(c)-scaled dual-softmax correlation at
  temperature 0.1, mutual-max + threshold + border removal
- fine_preprocess: 5x5 fine-feature windows at each coarse match
  (unfold stride 4, zero padding), optional coarse-feature concat path
  (down_proj + merge_feat)
- loftr_fine: self/cross transformer over the 25-token windows
- fine matching: center-vs-window correlation softmax -> spatial
  expectation (dsnt) -> sub-pixel refinement of image-2 coordinates

All heavy ops are batched MXU matmuls; the match set is padded to a
static max_matches for jit. load_torch_weights() converts the official
checkpoint (keys may carry a "matcher." prefix, kornia strips it the
same way); verified layer-for-layer against a torch re-implementation in
tests/frontend/test_loftr_exact.py.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class LoFTROptions(NamedTuple):
    d_coarse: int = 256
    d_fine: int = 128
    nhead: int = 8
    initial_dim: int = 128
    block_dims: tuple = (128, 196, 256)
    coarse_layer_names: tuple = ("self", "cross") * 4
    fine_layer_names: tuple = ("self", "cross")
    fine_window_size: int = 5
    fine_concat_coarse_feat: bool = True
    match_threshold: float = 0.2
    dual_softmax_temperature: float = 0.1
    border_rm: int = 2
    # the released checkpoints were trained with the historical positional-
    # encoding divisor bug; True selects the corrected formula
    temp_bug_fix: bool = False
    max_matches: int = 1024


# ---------------------------------------------------------------------------
# backbone: ResNetFPN_8_2
# ---------------------------------------------------------------------------


class _AffineBN(nn.Module):
    """Eval-mode BatchNorm folded to (scale, shift)."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        shift = self.param("shift", nn.initializers.zeros, (self.features,))
        return x * scale + shift


class _BasicBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, name="conv1")(x)
        y = nn.relu(_AffineBN(self.planes, name="bn1")(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        y = _AffineBN(self.planes, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, name="down_conv")(x)
            x = _AffineBN(self.planes, name="down_bn")(x)
        return nn.relu(x + y)


def _upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x upsampling with align_corners=True (torch interpolate
    semantics used by the LoFTR FPN)."""

    def up_axis(a, axis):
        n = a.shape[axis]
        m = 2 * n
        if n == 1:
            return jnp.repeat(a, 2, axis=axis)
        pos = jnp.arange(m, dtype=jnp.float32) * (n - 1) / (m - 1)
        i0 = jnp.floor(pos).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, n - 1)
        f = (pos - i0.astype(jnp.float32))
        a0 = jnp.take(a, i0, axis=axis)
        a1 = jnp.take(a, i1, axis=axis)
        shape = [1] * a.ndim
        shape[axis] = m
        return a0 + (a1 - a0) * f.reshape(shape)

    return up_axis(up_axis(x, 0), 1)


class ResNetFPN_8_2(nn.Module):
    opts: LoFTROptions

    @nn.compact
    def __call__(self, x):  # (H, W, 1) -> ((H/8, W/8, 256), (H/2, W/2, 128))
        o = self.opts
        d0, (d1, d2, d3) = o.initial_dim, o.block_dims
        y = nn.Conv(d0, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x0 = nn.relu(_AffineBN(d0, name="bn1")(y))  # 1/2
        x1 = _BasicBlock(d1, 1, name="layer1_0")(x0)
        x1 = _BasicBlock(d1, 1, name="layer1_1")(x1)  # 1/2
        x2 = _BasicBlock(d2, 2, name="layer2_0")(x1)
        x2 = _BasicBlock(d2, 1, name="layer2_1")(x2)  # 1/4
        x3 = _BasicBlock(d3, 2, name="layer3_0")(x2)
        x3 = _BasicBlock(d3, 1, name="layer3_1")(x3)  # 1/8

        x3_out = nn.Conv(d3, (1, 1), use_bias=False, name="layer3_outconv")(x3)
        x3_2x = _upsample2x_align_corners(x3_out)
        x2_out = nn.Conv(d3, (1, 1), use_bias=False, name="layer2_outconv")(x2)
        z = x2_out + x3_2x
        z = nn.Conv(d3, (3, 3), padding=1, use_bias=False, name="layer2_outconv2_0")(z)
        z = nn.leaky_relu(_AffineBN(d3, name="layer2_outconv2_1")(z), 0.01)
        x2_out = nn.Conv(d2, (3, 3), padding=1, use_bias=False, name="layer2_outconv2_3")(z)
        x2_2x = _upsample2x_align_corners(x2_out)
        x1_out = nn.Conv(d2, (1, 1), use_bias=False, name="layer1_outconv")(x1)
        z = x1_out + x2_2x
        z = nn.Conv(d2, (3, 3), padding=1, use_bias=False, name="layer1_outconv2_0")(z)
        z = nn.leaky_relu(_AffineBN(d2, name="layer1_outconv2_1")(z), 0.01)
        x1_out = nn.Conv(d1, (3, 3), padding=1, use_bias=False, name="layer1_outconv2_3")(z)
        return x3_out, x1_out


# ---------------------------------------------------------------------------
# positional encoding + transformer
# ---------------------------------------------------------------------------


def position_encoding_sine(h: int, w: int, d_model: int, temp_bug_fix: bool) -> np.ndarray:
    """PositionEncodingSine (h, w, d_model); 1-indexed positions as in the
    original (cumsum of ones)."""
    pe = np.zeros((d_model, h, w), np.float32)
    y_pos = np.cumsum(np.ones((h, w), np.float32), axis=0)[None]
    x_pos = np.cumsum(np.ones((h, w), np.float32), axis=1)[None]
    ar = np.arange(0, d_model // 2, 2, dtype=np.float32)
    if temp_bug_fix:
        div = np.exp(ar * (-math.log(10000.0) / (d_model // 2)))
    else:  # the historical buggy divisor the released models trained with
        div = np.exp(ar * (-math.log(10000.0) / d_model // 2))
    div = div[:, None, None]
    pe[0::4] = np.sin(x_pos * div)
    pe[1::4] = np.cos(x_pos * div)
    pe[2::4] = np.sin(y_pos * div)
    pe[3::4] = np.cos(y_pos * div)
    return pe.transpose(1, 2, 0)  # (h, w, d)


def _linear_attention(q, k, v, eps=1e-6):
    """LoFTR LinearAttention: (L, h, d) tokens, elu+1 feature maps."""
    Q = nn.elu(q) + 1.0
    K = nn.elu(k) + 1.0
    L_v = v.shape[0]
    values = v / L_v
    KV = jnp.einsum("shd,shv->hdv", K, values)
    Z = 1.0 / (jnp.einsum("lhd,hd->lh", Q, jnp.sum(K, axis=0)) + eps)
    return jnp.einsum("lhd,hdv,lh->lhv", Q, KV, Z) * L_v


class LoFTREncoderLayer(nn.Module):
    d_model: int
    nhead: int

    @nn.compact
    def __call__(self, x, source):
        d, h = self.d_model, self.nhead
        dim = d // h
        q = nn.Dense(d, use_bias=False, name="q_proj")(x).reshape(-1, h, dim)
        k = nn.Dense(d, use_bias=False, name="k_proj")(source).reshape(-1, h, dim)
        v = nn.Dense(d, use_bias=False, name="v_proj")(source).reshape(-1, h, dim)
        m = _linear_attention(q, k, v).reshape(-1, d)
        m = nn.Dense(d, use_bias=False, name="merge")(m)
        m = nn.LayerNorm(epsilon=1e-5, name="norm1")(m)
        m2 = jnp.concatenate([x, m], axis=-1)
        m2 = nn.Dense(2 * d, use_bias=False, name="mlp_0")(m2)
        m2 = nn.relu(m2)
        m2 = nn.Dense(d, use_bias=False, name="mlp_2")(m2)
        m2 = nn.LayerNorm(epsilon=1e-5, name="norm2")(m2)
        return x + m2


class LocalFeatureTransformer(nn.Module):
    d_model: int
    nhead: int
    layer_names: Sequence[str]

    @nn.compact
    def __call__(self, feat0, feat1):
        for i, nm in enumerate(self.layer_names):
            layer = LoFTREncoderLayer(self.d_model, self.nhead, name=f"layer{i}")
            if nm == "self":
                feat0, feat1 = layer(feat0, feat0), layer(feat1, feat1)
            else:
                feat0, feat1 = layer(feat0, feat1), layer(feat1, feat0)
        return feat0, feat1


# ---------------------------------------------------------------------------
# full net
# ---------------------------------------------------------------------------


class LoFTRNet(nn.Module):
    opts: LoFTROptions

    def setup(self):
        o = self.opts
        self.backbone = ResNetFPN_8_2(o)
        self.loftr_coarse = LocalFeatureTransformer(
            o.d_coarse, o.nhead, o.coarse_layer_names
        )
        if o.fine_concat_coarse_feat:
            self.fine_preprocess_down_proj = nn.Dense(o.d_fine)
            self.fine_preprocess_merge_feat = nn.Dense(o.d_fine)
        self.loftr_fine = nn.vmap(
            LocalFeatureTransformer,
            in_axes=(0, 0), out_axes=0,
            variable_axes={"params": None}, split_rngs={"params": False},
        )(o.d_fine, o.nhead, o.fine_layer_names)

    def coarse_forward(self, img0, img1):
        """Backbone + positional encoding + coarse transformer + dual-
        softmax confidences (also the stage probe for the exactness test).
        Returns (fc0, ff0, fc1, ff1, t0, t1, conf)."""
        o = self.opts
        fc0, ff0 = self.backbone(img0[..., None])
        fc1, ff1 = self.backbone(img1[..., None])
        hc, wc, dc = fc0.shape
        pe = jnp.asarray(position_encoding_sine(hc, wc, dc, o.temp_bug_fix))
        t0 = (fc0 + pe).reshape(hc * wc, dc)
        t1 = (fc1 + pe).reshape(hc * wc, dc)
        t0, t1 = self.loftr_coarse(t0, t1)
        s0 = t0 / dc**0.5
        s1 = t1 / dc**0.5
        sim = jnp.einsum("lc,sc->ls", s0, s1) / o.dual_softmax_temperature
        conf = jax.nn.softmax(sim, axis=0) * jax.nn.softmax(sim, axis=1)
        return fc0, ff0, fc1, ff1, t0, t1, conf

    def fine_forward(self, ff0, ff1, t0, t1, i_ids, j_ids, wc):
        """5x5 fine-window refinement for given coarse match ids; returns
        normalized [-1, 1] expectation offsets (M, 2)."""
        o = self.opts
        hf, wf, df = ff0.shape
        W = o.fine_window_size
        rad = W // 2
        M = i_ids.shape[0]

        def windows(feat, ids):
            cy = (ids // wc) * 4
            cx = (ids % wc) * 4
            oy, ox = jnp.meshgrid(jnp.arange(-rad, rad + 1), jnp.arange(-rad, rad + 1),
                                  indexing="ij")
            yy = cy[:, None] + oy.reshape(-1)[None, :]  # (M, W*W)
            xx = cx[:, None] + ox.reshape(-1)[None, :]
            inb = (yy >= 0) & (yy < hf) & (xx >= 0) & (xx < wf)
            g = feat[jnp.clip(yy, 0, hf - 1), jnp.clip(xx, 0, wf - 1)]
            return jnp.where(inb[..., None], g, 0.0)

        w0 = windows(ff0, i_ids)
        w1 = windows(ff1, j_ids)
        if o.fine_concat_coarse_feat:
            c_win = jnp.concatenate([t0[i_ids], t1[j_ids]], axis=0)  # (2M, dc)
            c_win = self.fine_preprocess_down_proj(c_win)
            f_cat = jnp.concatenate([w0, w1], axis=0)  # (2M, WW, df)
            f_cat = jnp.concatenate(
                [f_cat, jnp.broadcast_to(c_win[:, None, :], f_cat.shape)], axis=-1
            )
            f_cat = self.fine_preprocess_merge_feat(f_cat)
            w0, w1 = f_cat[:M], f_cat[M:]
        w0, w1 = self.loftr_fine(w0, w1)
        WW = W * W
        center = w0[:, WW // 2, :]  # (M, df)
        sim_f = jnp.einsum("mc,mrc->mr", center, w1) / df**0.5
        heat = jax.nn.softmax(sim_f, axis=1)
        grid = jnp.linspace(-1.0, 1.0, W)
        gx, gy = jnp.meshgrid(grid, grid, indexing="xy")
        ex = jnp.sum(heat * gx.reshape(-1)[None, :], axis=1)
        ey = jnp.sum(heat * gy.reshape(-1)[None, :], axis=1)
        return jnp.stack([ex, ey], axis=-1)

    def __call__(self, img0, img1):
        """img: (H, W) grayscale in [0, 1]; H, W divisible by 8. Returns
        (uv0 (M, 2), uv1 (M, 2) sub-pixel refined, conf (M,), mask (M,))."""
        o = self.opts
        fc0, ff0, fc1, ff1, t0, t1, conf = self.coarse_forward(img0, img1)
        hc, wc, dc = fc0.shape
        # border removal on both grids
        b = o.border_rm

        def interior(h, w):
            r = jnp.arange(h * w) // w
            c = jnp.arange(h * w) % w
            return (r >= b) & (r < h - b) & (c >= b) & (c < w - b)

        ok = interior(hc, wc)[:, None] & interior(hc, wc)[None, :]
        conf = jnp.where(ok, conf, 0.0)
        mutual = (conf == jnp.max(conf, axis=1, keepdims=True)) & (
            conf == jnp.max(conf, axis=0, keepdims=True)
        )
        cmask = mutual & (conf > o.match_threshold)
        score = jnp.where(cmask, conf, 0.0)
        row_best = jnp.max(score, axis=1)
        row_idx = jnp.argmax(score, axis=1)

        M = min(o.max_matches, hc * wc)
        msel_score, i_ids = jax.lax.top_k(row_best, M)
        j_ids = row_idx[i_ids]
        mmask = msel_score > 0

        # coarse pixel coordinates (scale 8, grid-corner anchored as LoFTR)
        x0c = (i_ids % wc).astype(jnp.float32) * 8.0
        y0c = (i_ids // wc).astype(jnp.float32) * 8.0
        x1c = (j_ids % wc).astype(jnp.float32) * 8.0
        y1c = (j_ids // wc).astype(jnp.float32) * 8.0

        # ---- fine refinement over 5x5 windows ------------------------
        off = self.fine_forward(ff0, ff1, t0, t1, i_ids, j_ids, wc)
        rad = o.fine_window_size // 2
        # fine scale: window step = 1 fine px = 2 image px; span rad cells
        x1f = x1c + off[:, 0] * rad * 2.0
        y1f = y1c + off[:, 1] * rad * 2.0

        uv0 = jnp.stack([x0c, y0c], axis=-1)
        uv1 = jnp.stack([x1f, y1f], axis=-1)
        return uv0, uv1, msel_score, mmask


class LoFTRMatcher:
    """DenseImageMatcher contract: match_images(img1, img2) ->
    (uv1 (M, 2), uv2 (M, 2), scores (M,), mask (M,)) in pixels."""

    def __init__(self, options: LoFTROptions = LoFTROptions(), params=None,
                 example_hw=(64, 64)):
        self.options = options
        self.net = LoFTRNet(options)
        if params is None:
            # jitted init: one compiled program instead of hundreds of
            # per-op dispatches (dominant over a remote-device tunnel)
            params = jax.jit(self.net.init)(
                jax.random.PRNGKey(0),
                jnp.zeros(example_hw), jnp.zeros(example_hw),
            )["params"]
        self.params = params
        self._fwd = jax.jit(lambda p, a, b: self.net.apply({"params": p}, a, b))

    def match_images(self, img1: jnp.ndarray, img2: jnp.ndarray):
        h = (img1.shape[0] // 8) * 8
        w = (img1.shape[1] // 8) * 8
        scale = 1.0
        if img1.max() > 2.0:  # uint8-range input
            scale = 1.0 / 255.0
        return self._fwd(self.params, img1[:h, :w] * scale, img2[:h, :w] * scale)


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------


def _to_np(v):
    return (
        v.detach().cpu().numpy().astype(np.float32)
        if hasattr(v, "detach")
        else np.asarray(v, np.float32)
    )


def convert_torch_state_dict(sd: dict, opts: LoFTROptions = LoFTROptions()) -> dict:
    """Official LoFTR checkpoint state_dict -> Flax params. Accepts the raw
    training checkpoints' "matcher." prefix (kornia strips it too)."""
    if any(k.startswith("matcher.") for k in sd):
        sd = {k[len("matcher."):]: v for k, v in sd.items() if k.startswith("matcher.")}

    def conv(key):
        return {"kernel": jnp.asarray(_to_np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0))}

    def bn(key, eps=1e-5):
        wv = _to_np(sd[f"{key}.weight"])
        bv = _to_np(sd[f"{key}.bias"])
        mean = _to_np(sd[f"{key}.running_mean"])
        var = _to_np(sd[f"{key}.running_var"])
        scale = wv / np.sqrt(var + eps)
        return {"scale": jnp.asarray(scale), "shift": jnp.asarray(bv - mean * scale)}

    def dense(key, bias=True):
        out = {"kernel": jnp.asarray(_to_np(sd[f"{key}.weight"]).T)}
        if bias:
            out["bias"] = jnp.asarray(_to_np(sd[f"{key}.bias"]))
        return out

    def ln(key):
        return {
            "scale": jnp.asarray(_to_np(sd[f"{key}.weight"])),
            "bias": jnp.asarray(_to_np(sd[f"{key}.bias"])),
        }

    def block(prefix, has_down):
        out = {
            "conv1": conv(f"{prefix}.conv1"),
            "bn1": bn(f"{prefix}.bn1"),
            "conv2": conv(f"{prefix}.conv2"),
            "bn2": bn(f"{prefix}.bn2"),
        }
        if has_down:
            out["down_conv"] = conv(f"{prefix}.downsample.0")
            out["down_bn"] = bn(f"{prefix}.downsample.1")
        return out

    backbone = {
        "conv1": conv("backbone.conv1"),
        "bn1": bn("backbone.bn1"),
        "layer1_0": block("backbone.layer1.0", False),
        "layer1_1": block("backbone.layer1.1", False),
        "layer2_0": block("backbone.layer2.0", True),
        "layer2_1": block("backbone.layer2.1", False),
        "layer3_0": block("backbone.layer3.0", True),
        "layer3_1": block("backbone.layer3.1", False),
        "layer3_outconv": conv("backbone.layer3_outconv"),
        "layer2_outconv": conv("backbone.layer2_outconv"),
        "layer2_outconv2_0": conv("backbone.layer2_outconv2.0"),
        "layer2_outconv2_1": bn("backbone.layer2_outconv2.1"),
        "layer2_outconv2_3": conv("backbone.layer2_outconv2.3"),
        "layer1_outconv": conv("backbone.layer1_outconv"),
        "layer1_outconv2_0": conv("backbone.layer1_outconv2.0"),
        "layer1_outconv2_1": bn("backbone.layer1_outconv2.1"),
        "layer1_outconv2_3": conv("backbone.layer1_outconv2.3"),
    }

    def encoder_layer(prefix):
        return {
            "q_proj": dense(f"{prefix}.q_proj", bias=False),
            "k_proj": dense(f"{prefix}.k_proj", bias=False),
            "v_proj": dense(f"{prefix}.v_proj", bias=False),
            "merge": dense(f"{prefix}.merge", bias=False),
            "mlp_0": dense(f"{prefix}.mlp.0", bias=False),
            "mlp_2": dense(f"{prefix}.mlp.2", bias=False),
            "norm1": ln(f"{prefix}.norm1"),
            "norm2": ln(f"{prefix}.norm2"),
        }

    params = {
        "backbone": backbone,
        "loftr_coarse": {
            f"layer{i}": encoder_layer(f"loftr_coarse.layers.{i}")
            for i in range(len(opts.coarse_layer_names))
        },
        "loftr_fine": {
            f"layer{i}": encoder_layer(f"loftr_fine.layers.{i}")
            for i in range(len(opts.fine_layer_names))
        },
    }
    if opts.fine_concat_coarse_feat:
        params["fine_preprocess_down_proj"] = dense("fine_preprocess.down_proj")
        params["fine_preprocess_merge_feat"] = dense("fine_preprocess.merge_feat")
    return {"params": params}


def load_torch_weights(path: str, opts: LoFTROptions = LoFTROptions()) -> dict:
    """Load outdoor_ds.ckpt / indoor_ds_new.ckpt -> Flax params."""
    from gtsfm_tpu.utils.torch_io import load_torch_checkpoint

    ckpt = load_torch_checkpoint(path)
    sd = ckpt.get("state_dict", ckpt)
    return convert_torch_state_dict(sd, opts)
