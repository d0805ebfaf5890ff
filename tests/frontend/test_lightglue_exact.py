"""Exactness of the Flax LightGlue port against a torch reference.

Methodology (same as test_netvlad_exact): build the official architecture
in torch with RANDOM weights, export its state_dict through
convert_torch_state_dict, and require the Flax forward to match the torch
forward numerically. This validates the converter + architecture layout so
a real public checkpoint (superpoint_lightglue.pth) loads correctly in
egress-enabled environments.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from gtsfm_tpu.frontend.matchers.lightglue import (  # noqa: E402
    LightGlueMatcher,
    LightGlueOptions,
    convert_torch_state_dict,
    normalize_keypoints,
)

# ---------------------------------------------------------------------------
# torch reference (official LightGlue architecture, random weights)
# ---------------------------------------------------------------------------


def rotate_half(x):
    x = x.unflatten(-1, (-1, 2))
    x1, x2 = x.unbind(dim=-1)
    return torch.stack((-x2, x1), dim=-1).flatten(start_dim=-2)


def apply_cached_rotary_emb(freqs, t):
    return t * freqs[0] + rotate_half(t) * freqs[1]


class TorchPosEnc(nn.Module):
    def __init__(self, M, dim):
        super().__init__()
        self.Wr = nn.Linear(M, dim // 2, bias=False)

    def forward(self, x):
        projected = self.Wr(x)
        cosines, sines = torch.cos(projected), torch.sin(projected)
        emb = torch.stack([cosines, sines], 0).unsqueeze(-3)
        return emb.repeat_interleave(2, dim=-1)


class TorchSelfBlock(nn.Module):
    def __init__(self, embed_dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.Wqkv = nn.Linear(embed_dim, 3 * embed_dim)
        self.out_proj = nn.Linear(embed_dim, embed_dim)
        self.ffn = nn.Sequential(
            nn.Linear(2 * embed_dim, 2 * embed_dim),
            nn.LayerNorm(2 * embed_dim, elementwise_affine=True),
            nn.GELU(),
            nn.Linear(2 * embed_dim, embed_dim),
        )

    def forward(self, x, encoding):
        qkv = self.Wqkv(x)
        qkv = qkv.unflatten(-1, (self.num_heads, -1, 3)).transpose(1, 2)
        q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
        q = apply_cached_rotary_emb(encoding, q)
        k = apply_cached_rotary_emb(encoding, k)
        context = F.scaled_dot_product_attention(q, k, v)
        message = self.out_proj(context.transpose(1, 2).flatten(start_dim=-2))
        return x + self.ffn(torch.cat([x, message], -1))


class TorchCrossBlock(nn.Module):
    def __init__(self, embed_dim, num_heads):
        super().__init__()
        self.heads = num_heads
        dim_head = embed_dim // num_heads
        self.scale = dim_head**-0.5
        self.to_qk = nn.Linear(embed_dim, embed_dim)
        self.to_v = nn.Linear(embed_dim, embed_dim)
        self.to_out = nn.Linear(embed_dim, embed_dim)
        self.ffn = nn.Sequential(
            nn.Linear(2 * embed_dim, 2 * embed_dim),
            nn.LayerNorm(2 * embed_dim, elementwise_affine=True),
            nn.GELU(),
            nn.Linear(2 * embed_dim, embed_dim),
        )

    def map_(self, fn, x0, x1):
        return fn(x0), fn(x1)

    def forward(self, x0, x1):
        qk0, qk1 = self.map_(self.to_qk, x0, x1)
        v0, v1 = self.map_(self.to_v, x0, x1)
        qk0, qk1, v0, v1 = (
            t.unflatten(-1, (self.heads, -1)).transpose(1, 2) for t in (qk0, qk1, v0, v1)
        )
        m0 = F.scaled_dot_product_attention(qk0, qk1, v1)
        m1 = F.scaled_dot_product_attention(qk1, qk0, v0)
        m0, m1 = self.map_(lambda t: t.transpose(1, 2).flatten(start_dim=-2), m0, m1)
        m0, m1 = self.map_(self.to_out, m0, m1)
        x0 = x0 + self.ffn(torch.cat([x0, m0], -1))
        x1 = x1 + self.ffn(torch.cat([x1, m1], -1))
        return x0, x1


class TorchTransformerLayer(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.self_attn = TorchSelfBlock(dim, heads)
        self.cross_attn = TorchCrossBlock(dim, heads)

    def forward(self, x0, x1, enc0, enc1):
        x0 = self.self_attn(x0, enc0)
        x1 = self.self_attn(x1, enc1)
        return self.cross_attn(x0, x1)


def sigmoid_log_double_softmax(sim, z0, z1):
    b, m, n = sim.shape
    certainties = F.logsigmoid(z0) + F.logsigmoid(z1).transpose(1, 2)
    scores0 = F.log_softmax(sim, 2)
    scores1 = F.log_softmax(sim.transpose(-1, -2).contiguous(), 2).transpose(-1, -2)
    scores = sim.new_full((b, m + 1, n + 1), 0)
    scores[:, :m, :n] = scores0 + scores1 + certainties
    scores[:, :-1, -1] = F.logsigmoid(-z0.squeeze(-1))
    scores[:, -1, :-1] = F.logsigmoid(-z1.squeeze(-1))
    return scores


class TorchMatchAssignment(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.matchability = nn.Linear(dim, 1)
        self.final_proj = nn.Linear(dim, dim)

    def forward(self, desc0, desc1):
        mdesc0, mdesc1 = self.final_proj(desc0), self.final_proj(desc1)
        _, _, d = mdesc0.shape
        mdesc0, mdesc1 = mdesc0 / d**0.25, mdesc1 / d**0.25
        sim = torch.einsum("bmd,bnd->bmn", mdesc0, mdesc1)
        z0 = self.matchability(desc0)
        z1 = self.matchability(desc1)
        return sigmoid_log_double_softmax(sim, z0, z1)


class TorchLightGlue(nn.Module):
    def __init__(self, input_dim=64, dim=64, heads=4, n_layers=2):
        super().__init__()
        self.n_layers = n_layers
        self.input_proj = nn.Linear(input_dim, dim)
        head_dim = dim // heads
        self.posenc = TorchPosEnc(2, head_dim)
        self.transformers = nn.ModuleList(
            TorchTransformerLayer(dim, heads) for _ in range(n_layers)
        )
        self.log_assignment = nn.ModuleList(
            TorchMatchAssignment(dim) for _ in range(n_layers)
        )

    def forward(self, d0, d1, c0, c1):
        x0 = self.input_proj(d0)
        x1 = self.input_proj(d1)
        enc0 = self.posenc(c0)
        enc1 = self.posenc(c1)
        for layer in self.transformers:
            x0, x1 = layer(x0, x1, enc0, enc1)
        return self.log_assignment[-1](x0, x1)


# ---------------------------------------------------------------------------


def test_lightglue_matches_torch_reference():
    torch.manual_seed(0)
    D_in, dim, heads, L, K = 64, 64, 4, 2, 24
    tmodel = TorchLightGlue(D_in, dim, heads, L).eval()

    rng = np.random.default_rng(0)
    d0 = rng.normal(size=(K, D_in)).astype(np.float32)
    d1 = rng.normal(size=(K, D_in)).astype(np.float32)
    c0 = rng.uniform(-1, 1, size=(K, 2)).astype(np.float32)
    c1 = rng.uniform(-1, 1, size=(K, 2)).astype(np.float32)

    with torch.no_grad():
        z_t = tmodel(
            torch.from_numpy(d0)[None], torch.from_numpy(d1)[None],
            torch.from_numpy(c0)[None], torch.from_numpy(c1)[None],
        )[0].numpy()

    opts = LightGlueOptions(dim=dim, num_layers=L, num_heads=heads, input_dim=D_in, mixed_precision=False)
    params = convert_torch_state_dict(tmodel.state_dict(), opts)
    matcher = LightGlueMatcher(opts, params=params)

    import jax.numpy as jnp

    z_j, _m0, _m1 = matcher._fwd(
        matcher.params,
        jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(c0), jnp.asarray(c1),
        jnp.ones(K, bool), jnp.ones(K, bool),
    )
    z_j = np.asarray(z_j)
    assert z_j.shape == z_t.shape == (K + 1, K + 1)
    np.testing.assert_allclose(z_j, z_t, atol=2e-4, rtol=2e-4)


def test_normalize_keypoints_matches_official():
    import jax.numpy as jnp

    kpts = np.array([[0.0, 0.0], [640.0, 480.0], [320.0, 240.0]], np.float32)
    out = np.asarray(normalize_keypoints(jnp.asarray(kpts), (640, 480)))
    # official: shift = size/2, scale = max(size)/2
    expected = (kpts - np.array([320.0, 240.0])) / 320.0
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_load_torch_weights_roundtrip(tmp_path):
    """Full load path: save a random official-layout state_dict, load via
    load_torch_weights, match the torch forward."""
    torch.manual_seed(1)
    tmodel = TorchLightGlue(32, 32, 2, 2).eval()
    p = tmp_path / "lightglue_random.pth"
    torch.save(tmodel.state_dict(), str(p))

    from gtsfm_tpu.frontend.matchers.lightglue import load_torch_weights

    params, opts = load_torch_weights(str(p))
    assert opts.num_layers == 2 and opts.dim == 32 and opts.input_dim == 32
    matcher = LightGlueMatcher(opts._replace(mixed_precision=False), params=params)

    rng = np.random.default_rng(1)
    K = 12
    d0 = rng.normal(size=(K, 32)).astype(np.float32)
    d1 = rng.normal(size=(K, 32)).astype(np.float32)
    c0 = rng.uniform(-1, 1, size=(K, 2)).astype(np.float32)
    c1 = rng.uniform(-1, 1, size=(K, 2)).astype(np.float32)
    with torch.no_grad():
        z_t = tmodel(
            torch.from_numpy(d0)[None], torch.from_numpy(d1)[None],
            torch.from_numpy(c0)[None], torch.from_numpy(c1)[None],
        )[0].numpy()
    import jax.numpy as jnp

    z_j, _, _ = matcher._fwd(
        matcher.params, jnp.asarray(d0), jnp.asarray(d1),
        jnp.asarray(c0), jnp.asarray(c1), jnp.ones(K, bool), jnp.ones(K, bool),
    )
    np.testing.assert_allclose(np.asarray(z_j), z_t, atol=2e-4, rtol=2e-4)


def test_match_contract():
    """match() returns the (idx, mask, score) contract and respects masks."""
    import jax.numpy as jnp

    opts = LightGlueOptions(dim=32, num_layers=1, num_heads=2, input_dim=32, mixed_precision=False)
    matcher = LightGlueMatcher(opts)
    rng = np.random.default_rng(2)
    K = 16
    d = rng.normal(size=(K, 32)).astype(np.float32)
    xy = rng.uniform(0, 100, size=(K, 2)).astype(np.float32)
    mask = np.ones(K, bool)
    mask[10:] = False
    idx, ok, score = matcher.match(
        jnp.asarray(d), jnp.asarray(d), jnp.asarray(xy), jnp.asarray(xy),
        jnp.asarray(mask), jnp.asarray(mask), (100, 100),
    )
    assert idx.shape == (K,) and ok.shape == (K,) and score.shape == (K,)
    assert not bool(np.asarray(ok)[10:].any())  # masked keypoints never match
