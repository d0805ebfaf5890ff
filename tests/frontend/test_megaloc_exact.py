"""Layer-for-layer exactness of the JAX MegaLoc port against a torch
reference with the reference state_dict layout (reduced dims, random
weights — the zero-egress methodology used for NetVLAD / D2-Net / DISK).

The torch reference reimplements thirdparty/megaloc/megaloc.py:25-257
(DINOv2 backbone + SALAD + linear) with dinov2's exact block structure and
key names, so the public megaloc.torch converts through the same path.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from gtsfm_tpu.frontend.global_descriptors.megaloc import (
    MegaLocDescriptor,
    MegaLocOptions,
    interpolate_pos_embed,
    load_torch_weights,
    megaloc_forward,
)

D, HEADS, DEPTH, PATCH, M = 32, 2, 2, 14, 5  # pretrain img 70x70
CLUSTERS, CDIM, TDIM, MLPD, FEAT = 8, 16, 16, 32, 64


class _Block(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = nn.LayerNorm(D, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(D, 3 * D)
        self.attn.proj = nn.Linear(D, D)
        self.ls1 = nn.Module()
        self.ls1.gamma = nn.Parameter(torch.randn(D) * 0.1 + 1.0)
        self.norm2 = nn.LayerNorm(D, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(D, 4 * D)
        self.mlp.fc2 = nn.Linear(4 * D, D)
        self.ls2 = nn.Module()
        self.ls2.gamma = nn.Parameter(torch.randn(D) * 0.1 + 1.0)

    def _attention(self, x):
        B, N, _ = x.shape
        qkv = self.attn.qkv(x).reshape(B, N, 3, HEADS, D // HEADS)
        q, k, v = qkv.unbind(2)
        att = torch.einsum("bnhd,bmhd->bhnm", q * (D // HEADS) ** -0.5, k)
        att = att.softmax(-1)
        y = torch.einsum("bhnm,bmhd->bnhd", att, v).reshape(B, N, D)
        return self.attn.proj(y)

    def forward(self, x):
        x = x + self.ls1.gamma * self._attention(self.norm1(x))
        x = x + self.ls2.gamma * self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x


class _DinoViT(nn.Module):
    """Mini dinov2_vitb14 with the hub module's key layout."""

    def __init__(self):
        super().__init__()
        self.cls_token = nn.Parameter(torch.randn(1, 1, D) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, 1 + M * M, D) * 0.02)
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, D, PATCH, stride=PATCH)
        self.blocks = nn.ModuleList([_Block() for _ in range(DEPTH)])
        self.norm = nn.LayerNorm(D, eps=1e-6)

    def interpolate_pos_encoding(self, npatch, w, h):
        N = self.pos_embed.shape[1] - 1
        if npatch == N and w == h:
            return self.pos_embed[:, :1], self.pos_embed[:, 1:]
        pe = self.pos_embed[:, 1:]
        w0, h0 = w // PATCH, h // PATCH
        sx = float(w0 + 0.1) / M
        sy = float(h0 + 0.1) / M
        pe = F.interpolate(
            pe.reshape(1, M, M, D).permute(0, 3, 1, 2),
            scale_factor=(sy, sx),
            mode="bicubic",
            antialias=False,
        )
        assert pe.shape[-2:] == (h0, w0)
        pe = pe.permute(0, 2, 3, 1).reshape(1, -1, D)
        return self.pos_embed[:, :1], pe

    def forward_features(self, x):
        B, _, H, W = x.shape
        y = self.patch_embed.proj(x).flatten(2).transpose(1, 2)  # (B, N, D)
        cls_pe, patch_pe = self.interpolate_pos_encoding(y.shape[1], W, H)
        cls = (self.cls_token + cls_pe).expand(B, -1, -1)
        y = torch.cat([cls, y + patch_pe], dim=1)
        for blk in self.blocks:
            y = blk(y)
        y = self.norm(y)
        return {"x_norm_clstoken": y[:, 0], "x_norm_patchtokens": y[:, 1:]}


class _Backbone(nn.Module):
    def __init__(self):
        super().__init__()
        self.model = _DinoViT()

    def forward(self, images):
        B, C, H, W = images.shape
        out = self.model.forward_features(images)
        feats = out["x_norm_patchtokens"].reshape(B, H // PATCH, W // PATCH, D)
        return feats.permute(0, 3, 1, 2), out["x_norm_clstoken"]


def _log_otp_solver(log_a, log_b, Mx, num_iters=3):
    u, v = torch.zeros_like(log_a), torch.zeros_like(log_b)
    for _ in range(num_iters):
        u = log_a - torch.logsumexp(Mx + v.unsqueeze(1), dim=2)
        v = log_b - torch.logsumexp(Mx + u.unsqueeze(2), dim=1)
    return Mx + u.unsqueeze(2) + v.unsqueeze(1)


def _get_matching_probs(S, dustbin_score, num_iters=3):
    B, m, n = S.size()
    S_aug = torch.cat([S, dustbin_score.expand(B, 1, n)], dim=1)
    norm = -torch.tensor(math.log(n + m))
    log_a = norm.expand(m + 1).contiguous().clone()
    log_a[-1] = log_a[-1] + math.log(n - m)
    log_b = norm.expand(n)
    log_P = _log_otp_solver(
        log_a.expand(B, -1), log_b.expand(B, -1), S_aug, num_iters=num_iters
    )
    return log_P - norm


class _SALAD(nn.Module):
    def __init__(self):
        super().__init__()
        self.token_features = nn.Sequential(
            nn.Linear(D, MLPD), nn.ReLU(), nn.Linear(MLPD, TDIM)
        )
        self.cluster_features = nn.Sequential(
            nn.Conv2d(D, MLPD, 1), nn.Identity(), nn.ReLU(), nn.Conv2d(MLPD, CDIM, 1)
        )
        self.score = nn.Sequential(
            nn.Conv2d(D, MLPD, 1), nn.Identity(), nn.ReLU(), nn.Conv2d(MLPD, CLUSTERS, 1)
        )
        self.dust_bin = nn.Parameter(torch.tensor(1.0))

    def forward(self, x):
        x, t = x
        f = self.cluster_features(x).flatten(2)
        p = self.score(x).flatten(2)
        t = self.token_features(t)
        p = torch.exp(_get_matching_probs(p, self.dust_bin, 3))[:, :-1, :]
        p = p.unsqueeze(1).repeat(1, CDIM, 1, 1)
        f = f.unsqueeze(2).repeat(1, 1, CLUSTERS, 1)
        f = torch.cat(
            [
                F.normalize(t, p=2, dim=-1),
                F.normalize((f * p).sum(dim=-1), p=2, dim=1).flatten(1),
            ],
            dim=-1,
        )
        return F.normalize(f, p=2, dim=-1)


class _TorchMegaLoc(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = _Backbone()
        self.aggregator = nn.Module()
        self.aggregator.agg = _SALAD()
        self.aggregator.linear = nn.Linear(CLUSTERS * CDIM + TDIM, FEAT)

    def forward(self, images):
        feats = self.aggregator.agg(self.backbone(images))
        return F.normalize(self.aggregator.linear(feats), p=2, dim=1)


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    torch.manual_seed(0)
    ref = _TorchMegaLoc().eval()
    path = tmp_path_factory.mktemp("w") / "megaloc.torch"
    torch.save(ref.state_dict(), path)
    params, opts = load_torch_weights(str(path), MegaLocOptions(num_heads=HEADS))
    return ref, params, opts


def test_megaloc_exact_native_grid(converted):
    """70x70 input: pos-embed used verbatim (5x5 grid)."""
    ref, params, opts = converted
    x = np.random.default_rng(0).normal(size=(2, 3, 70, 70)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(megaloc_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)), opts))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_megaloc_exact_interpolated_grid(converted):
    """42x42 input: bicubic pos-embed interpolation 5x5 -> 3x3 must match
    torch's F.interpolate(mode='bicubic', scale-factor semantics)."""
    ref, params, opts = converted
    cls_pe, pe = interpolate_pos_embed(params["backbone"]["pos_embed"], 3, 3)
    with torch.no_grad():
        _, want_pe = ref.backbone.model.interpolate_pos_encoding(9, 42, 42)
    np.testing.assert_allclose(np.asarray(pe), want_pe.numpy(), rtol=1e-4, atol=1e-5)

    x = np.random.default_rng(1).normal(size=(1, 3, 42, 42)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(megaloc_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)), opts))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_megaloc_descriptor_component():
    desc = MegaLocDescriptor(test_small=True)
    images = np.random.default_rng(2).uniform(0, 1, (3, 48, 64)).astype(np.float32)
    out = desc.describe_batch(images)
    assert out.shape == (3, 64)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_megaloc_registry_build():
    from gtsfm_tpu.frontend.registry import build_global_descriptor

    d = build_global_descriptor(
        {"name": "megaloc", "embed_dim": 32, "depth": 1, "num_heads": 2,
         "pretrain_grid": 5, "num_clusters": 8, "cluster_dim": 16,
         "token_dim": 16, "mlp_dim": 32, "feat_dim": 64, "image_size": 70}
    )
    out = d.describe_batch(np.zeros((2, 70, 70), np.float32))
    assert out.shape == (2, 64)
