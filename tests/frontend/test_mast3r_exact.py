"""Layer-for-layer exactness of the JAX MASt3R port against a torch
reference (reduced dims, random weights, exact AsymmetricMASt3R state_dict
naming — the zero-egress methodology used across the learned front-end).

The torch reference reimplements the croco-v2 pieces the correspondence
path uses: RoPE100 2D rotary attention, asymmetric CroCo decoder blocks,
and the mast3r head_local_features MLP + pixel-shuffle descriptor head.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from gtsfm_tpu.frontend.mast3r import (
    MASt3ROptions,
    Mast3rCorrespondenceGenerator,
    init_params,
    load_torch_weights,
    reciprocal_nn,
    symmetric_inference,
)

DE, DD, HEADS, N_ENC, N_DEC, LFD = 32, 24, 2, 2, 2, 4
PATCH = 16


# ---- torch RoPE2D (croco pos_embed.RoPE2D, base=100) ----------------------


def _rope_cos_sin(pos, dim_half, base=100.0):
    freqs = 1.0 / (base ** (torch.arange(0, dim_half, 2).float() / dim_half))
    ang = pos.float()[:, None] * freqs[None]
    ang = torch.cat([ang, ang], -1)
    return ang.cos(), ang.sin()


def _rotate_half(x):
    x1, x2 = x.chunk(2, -1)
    return torch.cat([-x2, x1], -1)


def apply_rope2d(tok, positions, base=100.0):
    D = tok.shape[-1]
    dh = D // 2
    ty, tx = tok[..., :dh], tok[..., dh:]
    cy, sy = _rope_cos_sin(positions[:, 0], dh, base)
    cx, sx = _rope_cos_sin(positions[:, 1], dh, base)
    ty = ty * cy + _rotate_half(ty) * sy
    tx = tx * cx + _rotate_half(tx) * sx
    return torch.cat([ty, tx], -1)


class _Attn(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.qkv = nn.Linear(d, 3 * d)
        self.proj = nn.Linear(d, d)
        self.h = heads

    def forward(self, x, pos):
        B, N, D = x.shape
        q, k, v = self.qkv(x).chunk(3, -1)
        sh = (B, N, self.h, D // self.h)
        q, k, v = [t.reshape(sh).transpose(1, 2) for t in (q, k, v)]
        q, k = apply_rope2d(q, pos), apply_rope2d(k, pos)
        a = (q @ k.transpose(-2, -1) * (D // self.h) ** -0.5).softmax(-1)
        return self.proj((a @ v).transpose(1, 2).reshape(B, N, D))


class _CrossAttn(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.projq = nn.Linear(d, d)
        self.projk = nn.Linear(d, d)
        self.projv = nn.Linear(d, d)
        self.proj = nn.Linear(d, d)
        self.h = heads

    def forward(self, x, y, xpos, ypos):
        B, N, D = x.shape
        M = y.shape[1]
        q = self.projq(x).reshape(B, N, self.h, D // self.h).transpose(1, 2)
        k = self.projk(y).reshape(B, M, self.h, D // self.h).transpose(1, 2)
        v = self.projv(y).reshape(B, M, self.h, D // self.h).transpose(1, 2)
        q, k = apply_rope2d(q, xpos), apply_rope2d(k, ypos)
        a = (q @ k.transpose(-2, -1) * (D // self.h) ** -0.5).softmax(-1)
        return self.proj((a @ v).transpose(1, 2).reshape(B, N, D))


class _Mlp(nn.Module):
    def __init__(self, d, out=None):
        super().__init__()
        self.fc1 = nn.Linear(d, 4 * d)
        self.fc2 = nn.Linear(4 * d, out or d)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class _EncBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = nn.LayerNorm(DE, eps=1e-6)
        self.attn = _Attn(DE, HEADS)
        self.norm2 = nn.LayerNorm(DE, eps=1e-6)
        self.mlp = _Mlp(DE)

    def forward(self, x, pos):
        x = x + self.attn(self.norm1(x), pos)
        return x + self.mlp(self.norm2(x))


class _DecBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = nn.LayerNorm(DD, eps=1e-6)
        self.attn = _Attn(DD, HEADS)
        self.norm2 = nn.LayerNorm(DD, eps=1e-6)
        self.cross_attn = _CrossAttn(DD, HEADS)
        self.norm_y = nn.LayerNorm(DD, eps=1e-6)
        self.norm3 = nn.LayerNorm(DD, eps=1e-6)
        self.mlp = _Mlp(DD)

    def forward(self, x, y, xpos, ypos):
        x = x + self.attn(self.norm1(x), xpos)
        y_ = self.norm_y(y)
        x = x + self.cross_attn(self.norm2(x), y_, xpos, ypos)
        return x + self.mlp(self.norm3(x))


class _LocalFeatHead(nn.Module):
    def __init__(self):
        super().__init__()
        cat_d = DE + DD
        self.proj = nn.Sequential(
            nn.Linear(cat_d, 4 * cat_d), nn.GELU(),
            nn.Linear(4 * cat_d, (LFD + 1) * PATCH * PATCH),
        )


class _TorchMast3r(nn.Module):
    def __init__(self):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, DE, PATCH, stride=PATCH)
        self.enc_blocks = nn.ModuleList([_EncBlock() for _ in range(N_ENC)])
        self.enc_norm = nn.LayerNorm(DE, eps=1e-6)
        self.decoder_embed = nn.Linear(DE, DD)
        self.dec_blocks = nn.ModuleList([_DecBlock() for _ in range(N_DEC)])
        self.dec_blocks2 = nn.ModuleList([_DecBlock() for _ in range(N_DEC)])
        self.dec_norm = nn.LayerNorm(DD, eps=1e-6)
        self.downstream_head1 = nn.Module()
        self.downstream_head1.head_local_features = _LocalFeatHead()

    def _grid(self, gh, gw):
        yy, xx = torch.meshgrid(torch.arange(gh), torch.arange(gw), indexing="ij")
        return torch.stack([yy.reshape(-1), xx.reshape(-1)], -1)

    def encode(self, img):
        B, _, H, W = img.shape
        x = self.patch_embed.proj(img).flatten(2).transpose(1, 2)
        pos = self._grid(H // PATCH, W // PATCH)
        for blk in self.enc_blocks:
            x = blk(x, pos)
        return self.enc_norm(x), pos

    def decode(self, f1, f2, pos1, pos2):
        x1, x2 = self.decoder_embed(f1), self.decoder_embed(f2)
        for b1, b2 in zip(self.dec_blocks, self.dec_blocks2):
            x1n = b1(x1, x2, pos1, pos2)
            x2n = b2(x2, x1, pos2, pos1)
            x1, x2 = x1n, x2n
        return self.dec_norm(x1), self.dec_norm(x2)

    def local_features(self, enc, dec, gh, gw):
        B = enc.shape[0]
        y = self.downstream_head1.head_local_features.proj(torch.cat([enc, dec], -1))
        y = y.transpose(1, 2).reshape(B, (LFD + 1) * PATCH * PATCH, gh, gw)
        y = F.pixel_shuffle(y, PATCH)  # (B, LFD+1, H, W)
        desc = F.normalize(y[:, :LFD], p=2, dim=1, eps=1e-8)
        conf = 1.0 + torch.expm1(F.relu(y[:, LFD]))
        return desc, conf

    def symmetric(self, img1, img2):
        f1, p1 = self.encode(img1)
        f2, p2 = self.encode(img2)
        d11, d21 = self.decode(f1, f2, p1, p2)
        d22, d12 = self.decode(f2, f1, p2, p1)
        gh, gw = img1.shape[-2] // PATCH, img1.shape[-1] // PATCH
        return (
            self.local_features(f1, d11, gh, gw),
            self.local_features(f2, d21, gh, gw),
            self.local_features(f2, d22, gh, gw),
            self.local_features(f1, d12, gh, gw),
        )


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    torch.manual_seed(0)
    ref = _TorchMast3r().eval()
    path = tmp_path_factory.mktemp("w") / "mast3r.pth"
    torch.save({"model": ref.state_dict()}, path)
    params, opts = load_torch_weights(
        str(path), MASt3ROptions(enc_heads=HEADS, dec_heads=HEADS)
    )
    assert opts.enc_dim == DE and opts.dec_dim == DD
    assert opts.local_feat_dim == LFD
    return ref, params, opts


def test_mast3r_symmetric_exact(converted):
    ref, params, opts = converted
    rng = np.random.default_rng(0)
    x1 = rng.normal(size=(1, 3, 48, 64)).astype(np.float32)
    x2 = rng.normal(size=(1, 3, 48, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref.symmetric(torch.from_numpy(x1), torch.from_numpy(x2))
    descs, confs = symmetric_inference(
        params, jnp.asarray(x1.transpose(0, 2, 3, 1)), jnp.asarray(x2.transpose(0, 2, 3, 1)), opts
    )
    for (wd, wc), gd, gc in zip(want, descs, confs):
        np.testing.assert_allclose(
            np.asarray(gd).transpose(0, 3, 1, 2), wd.numpy(), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(np.asarray(gc), wc.numpy(), rtol=2e-4, atol=2e-4)


def test_reciprocal_nn_finds_identity():
    """Identical descriptor maps: every seed's mutual NN is itself."""
    rng = np.random.default_rng(1)
    d = rng.normal(size=(32, 32, 8)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ia, ib, ok = reciprocal_nn(jnp.asarray(d), jnp.asarray(d), 8, 4)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))


def test_generator_end_to_end_shapes():
    opts = MASt3ROptions(
        enc_dim=DE, dec_dim=DD, enc_heads=HEADS, dec_heads=HEADS,
        enc_depth=1, dec_depth=1, local_feat_dim=LFD, long_edge=64,
        subsample=8, max_correspondences=64,
    )
    gen = Mast3rCorrespondenceGenerator(opts)
    rng = np.random.default_rng(2)
    images = [rng.uniform(0, 1, (60, 80)).astype(np.float32) for _ in range(3)]
    corrs = gen.generate(images, np.array([[0, 1], [1, 2]]))
    assert set(corrs) == {(0, 1), (1, 2)}
    uv1, uv2 = corrs[(0, 1)]
    assert uv1.shape == uv2.shape and uv1.shape[1] == 2
    assert len(uv1) <= 64
    # coordinates mapped back to original pixel space
    if len(uv1):
        assert uv1[:, 0].max() <= 80 and uv1[:, 1].max() <= 60
