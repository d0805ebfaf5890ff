"""Exactness of the JAX VGGT port against a torch mirror.

Methodology (same as test_mast3r_exact / test_loftr_exact): build the
public VGGT architecture in torch at REDUCED dims with the official
module naming (facebookresearch/vggt state_dict keys: aggregator.*,
camera_head.*, depth_head.*), export state_dict through
convert_torch_state_dict, and require the JAX forward to match at every
stage — DINO patch embed, alternating frame/global aggregator with
qk-norm + 2D RoPE, AdaLN iterative camera head, and the DPT depth head
end-to-end."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402
from torch import nn  # noqa: E402

from gtsfm_tpu.frontend.vggt import (  # noqa: E402
    VGGTOptions,
    aggregator_forward,
    camera_head_forward,
    convert_torch_state_dict,
    dpt_head_forward,
)

# ---- torch RoPE2D (croco formulation, base 100) ----------------------------


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


# ---- torch blocks (DINOv2/vggt layer naming) -------------------------------


class LayerScale(nn.Module):
    def __init__(self, dim, init=0.01):
        super().__init__()
        self.gamma = nn.Parameter(init * torch.ones(dim))

    def forward(self, x):
        return x * self.gamma


class Attention(nn.Module):
    def __init__(self, dim, num_heads, qk_norm=False, rope=False):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim, bias=True)
        self.q_norm = nn.LayerNorm(self.head_dim) if qk_norm else nn.Identity()
        self.k_norm = nn.LayerNorm(self.head_dim) if qk_norm else nn.Identity()
        self.rope = rope

    def forward(self, x, pos=None):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, self.head_dim)
        q, k, v = qkv.unbind(2)  # (B, N, h, dh)
        q = self.q_norm(q)
        k = self.k_norm(k)
        if self.rope and pos is not None:
            q = apply_rope2d(q.permute(0, 2, 1, 3), pos).permute(0, 2, 1, 3)
            k = apply_rope2d(k.permute(0, 2, 1, 3), pos).permute(0, 2, 1, 3)
        att = torch.einsum("bnhd,bmhd->bhnm", q * self.head_dim**-0.5, k)
        att = att.softmax(-1)
        y = torch.einsum("bhnm,bmhd->bnhd", att, v).reshape(B, N, C)
        return self.proj(y)


class Mlp(nn.Module):
    def __init__(self, dim, hidden, out=None):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, out or dim)

    def forward(self, x):
        return self.fc2(TF.gelu(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4, qk_norm=False, rope=False,
                 ls=True):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = Attention(dim, num_heads, qk_norm, rope)
        self.ls1 = LayerScale(dim) if ls else nn.Identity()
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, mlp_ratio * dim)
        self.ls2 = LayerScale(dim) if ls else nn.Identity()

    def forward(self, x, pos=None):
        x = x + self.ls1(self.attn(self.norm1(x), pos))
        x = x + self.ls2(self.mlp(self.norm2(x)))
        return x


class PatchEmbed(nn.Module):
    def __init__(self, patch_size, dim):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, kernel_size=patch_size, stride=patch_size)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class DinoViT(nn.Module):
    """DINOv2-with-registers forward_features -> x_norm_patchtokens."""

    def __init__(self, o: VGGTOptions):
        super().__init__()
        C = o.embed_dim
        g = o.dino_pretrain_grid
        self.patch_embed = PatchEmbed(o.patch_size, C)
        self.cls_token = nn.Parameter(torch.randn(1, 1, C) * 0.02)
        self.register_tokens = nn.Parameter(torch.randn(1, o.num_register_tokens, C) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, 1 + g * g, C) * 0.02)
        self.mask_token = nn.Parameter(torch.zeros(1, C))
        self.blocks = nn.ModuleList(
            [Block(C, o.dino_heads) for _ in range(o.dino_depth)]
        )
        self.norm = nn.LayerNorm(C)
        self.grid = g

    def forward(self, x):
        B = x.shape[0]
        gh = x.shape[2] // 14 if False else None
        h, w = x.shape[2], x.shape[3]
        t = self.patch_embed(x)
        # test grid == pretrain grid -> no pos interpolation needed
        cls = self.cls_token.expand(B, -1, -1) + self.pos_embed[:, :1]
        t = t + self.pos_embed[:, 1:]
        regs = self.register_tokens.expand(B, -1, -1)
        t = torch.cat([cls, regs, t], 1)
        for blk in self.blocks:
            t = blk(t)
        t = self.norm(t)
        return t[:, 1 + self.register_tokens.shape[1]:]


class TorchAggregator(nn.Module):
    def __init__(self, o: VGGTOptions):
        super().__init__()
        C = o.embed_dim
        self.patch_embed = DinoViT(o)
        self.camera_token = nn.Parameter(torch.randn(1, 2, 1, C) * 0.02)
        self.register_token = nn.Parameter(torch.randn(1, 2, o.num_register_tokens, C) * 0.02)
        self.frame_blocks = nn.ModuleList(
            [Block(C, o.num_heads, qk_norm=True, rope=True) for _ in range(o.depth)]
        )
        self.global_blocks = nn.ModuleList(
            [Block(C, o.num_heads, qk_norm=True, rope=True) for _ in range(o.depth)]
        )
        self.o = o

    def forward(self, images):  # (S, 3, H, W) in [0, 1]
        o = self.o
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        S, _, H, W = images.shape
        gh, gw = H // o.patch_size, W // o.patch_size
        patch_tokens = self.patch_embed((images - mean) / std)
        cam = torch.cat(
            [self.camera_token[:, 0:1], self.camera_token[:, 1:2].expand(1, S - 1, -1, -1)], 1
        )[0]
        regs = torch.cat(
            [self.register_token[:, 0:1], self.register_token[:, 1:2].expand(1, S - 1, -1, -1)], 1
        )[0]
        tokens = torch.cat([cam, regs, patch_tokens], 1)  # (S, L, C)
        ps = 1 + regs.shape[1]
        L = tokens.shape[1]
        yy, xx = torch.meshgrid(torch.arange(gh), torch.arange(gw), indexing="ij")
        pos_patch = torch.stack([yy.reshape(-1), xx.reshape(-1)], -1) + 1
        pos = torch.cat([torch.zeros(ps, 2, dtype=torch.long), pos_patch])
        pos_g = pos.repeat(S, 1)
        outs = []
        for i in range(o.depth):
            tokens = self.frame_blocks[i](tokens, pos)
            frame_out = tokens
            flat = tokens.reshape(1, S * L, -1)
            flat = self.global_blocks[i](flat, pos_g)
            tokens = flat.reshape(S, L, -1)
            outs.append(torch.cat([frame_out, tokens], -1))
        return outs, ps


class TorchCameraHead(nn.Module):
    def __init__(self, o: VGGTOptions):
        super().__init__()
        C2 = 2 * o.embed_dim
        self.token_norm = nn.LayerNorm(C2)
        self.trunk = nn.Sequential(
            *[Block(C2, o.num_heads, qk_norm=True) for _ in range(o.camera_trunk_depth)]
        )
        self.trunk_norm = nn.LayerNorm(C2)
        self.empty_pose_tokens = nn.Parameter(torch.zeros(1, 1, o.pose_dim))
        self.embed_pose = nn.Linear(o.pose_dim, C2)
        self.poseLN_modulation = nn.Sequential(nn.SiLU(), nn.Linear(C2, 3 * C2))
        self.adaln_norm = nn.LayerNorm(C2, elementwise_affine=False)
        self.pose_branch = Mlp(C2, C2 // 2, o.pose_dim)
        self.o = o

    def forward(self, outs):
        o = self.o
        tokens = outs[-1][:, 0][None]  # (1, S, 2C)
        tokens = self.token_norm(tokens)
        pred = None
        for _ in range(o.camera_iterations):
            if pred is None:
                inp = self.embed_pose(self.empty_pose_tokens.expand(1, tokens.shape[1], -1))
            else:
                inp = self.embed_pose(pred.detach())
            shift, scale, gate = self.poseLN_modulation(inp).chunk(3, -1)
            t = gate * (self.adaln_norm(tokens) * (1 + scale) + shift) + tokens
            t = self.trunk(t[0][:, None])[:, 0][None] if False else self._trunk(t)
            delta = self.pose_branch(self.trunk_norm(t))
            pred = delta if pred is None else pred + delta
        return pred[0]

    def _trunk(self, t):
        for blk in self.trunk:
            t = blk(t)
        return t


def _make_scratch_convs(oc, F):
    return nn.ModuleDict(
        {f"layer{i + 1}_rn": nn.Conv2d(oc[i], F, 3, 1, 1, bias=False) for i in range(4)}
    )


class ResidualConvUnit(nn.Module):
    def __init__(self, F):
        super().__init__()
        self.conv1 = nn.Conv2d(F, F, 3, 1, 1)
        self.conv2 = nn.Conv2d(F, F, 3, 1, 1)

    def forward(self, x):
        y = TF.relu(x)
        y = self.conv1(y)
        y = TF.relu(y)
        y = self.conv2(y)
        return x + y


class FeatureFusionBlock(nn.Module):
    def __init__(self, F):
        super().__init__()
        self.resConfUnit1 = ResidualConvUnit(F)
        self.resConfUnit2 = ResidualConvUnit(F)
        self.out_conv = nn.Conv2d(F, F, 1)

    def forward(self, x, skip=None, size=None):
        out = x
        if skip is not None:
            out = out + self.resConfUnit1(skip)
        out = self.resConfUnit2(out)
        if size is None:
            size = (2 * out.shape[2], 2 * out.shape[3])
        out = TF.interpolate(out, size=size, mode="bilinear", align_corners=True)
        return self.out_conv(out)


class TorchDPTHead(nn.Module):
    def __init__(self, o: VGGTOptions):
        super().__init__()
        C2 = 2 * o.embed_dim
        oc = o.dpt_out_channels
        F = o.dpt_features
        self.norm = nn.LayerNorm(C2)
        self.projects = nn.ModuleList([nn.Conv2d(C2, c, 1) for c in oc])
        self.resize_layers = nn.ModuleList(
            [
                nn.ConvTranspose2d(oc[0], oc[0], 4, 4),
                nn.ConvTranspose2d(oc[1], oc[1], 2, 2),
                nn.Identity(),
                nn.Conv2d(oc[3], oc[3], 3, 2, 1),
            ]
        )
        self.scratch = nn.Module()
        for i in range(4):
            setattr(self.scratch, f"layer{i + 1}_rn",
                    nn.Conv2d(oc[i], F, 3, 1, 1, bias=False))
        for i in range(1, 5):
            setattr(self.scratch, f"refinenet{i}", FeatureFusionBlock(F))
        self.scratch.output_conv1 = nn.Conv2d(F, F // 2, 3, 1, 1)
        self.scratch.output_conv2 = nn.Sequential(
            nn.Conv2d(F // 2, 32, 3, 1, 1), nn.ReLU(True), nn.Conv2d(32, 2, 1)
        )
        self.o = o

    def forward(self, outs, patch_start, hw):
        o = self.o
        H, W = hw
        gh, gw = H // o.patch_size, W // o.patch_size
        feats = []
        for k, li in enumerate(o.intermediate_layer_idx):
            t = outs[li][:, patch_start:]
            t = self.norm(t)
            x = t.transpose(1, 2).reshape(t.shape[0], -1, gh, gw)
            x = self.projects[k](x)
            x = self.resize_layers[k](x)
            x = getattr(self.scratch, f"layer{k + 1}_rn")(x)
            feats.append(x)
        l1, l2, l3, l4 = feats
        p4 = self.scratch.refinenet4(l4, size=l3.shape[2:])
        p3 = self.scratch.refinenet3(p4, l3, size=l2.shape[2:])
        p2 = self.scratch.refinenet2(p3, l2, size=l1.shape[2:])
        p1 = self.scratch.refinenet1(p2, l1)
        out = self.scratch.output_conv1(p1)
        out = TF.interpolate(out, size=(gh * o.patch_size, gw * o.patch_size),
                             mode="bilinear", align_corners=True)
        out = self.scratch.output_conv2(out)
        depth = torch.exp(out[:, :1])
        conf = 1.0 + torch.exp(out[:, 1])
        return depth[:, 0], conf


class TorchVGGT(nn.Module):
    def __init__(self, o: VGGTOptions):
        super().__init__()
        self.aggregator = TorchAggregator(o)
        self.camera_head = TorchCameraHead(o)
        self.depth_head = TorchDPTHead(o)


_OPTS = VGGTOptions(
    embed_dim=64, depth=2, num_heads=4, dino_depth=2, dino_heads=4,
    dino_pretrain_grid=4, num_register_tokens=4, camera_trunk_depth=2,
    camera_iterations=2, dpt_features=32, dpt_out_channels=(16, 32, 64, 64),
    intermediate_layer_idx=(0, 0, 1, 1),
)


def test_vggt_exact_forward():
    torch.manual_seed(0)
    o = _OPTS
    tmodel = TorchVGGT(o).eval()

    S, H, W = 2, 56, 56  # grid 4x4 == pretrain grid (no pos interpolation)
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (S, H, W, 3)).astype(np.float32)
    timg = torch.from_numpy(imgs.transpose(0, 3, 1, 2))

    with torch.no_grad():
        outs_t, ps_t = tmodel.aggregator(timg)
        pose_t = tmodel.camera_head(outs_t).numpy()
        depth_t, conf_t = tmodel.depth_head(outs_t, ps_t, (H, W))

    import jax.numpy as jnp

    params, opts = convert_torch_state_dict(tmodel.state_dict(), opts=o)
    outs_j, ps_j = aggregator_forward(params["aggregator"], jnp.asarray(imgs), opts)
    assert ps_j == ps_t == 1 + o.num_register_tokens

    for li in range(len(outs_j)):
        err = np.abs(np.asarray(outs_j[li]) - outs_t[li].numpy()).max()
        assert err < 2e-4, f"aggregator layer {li} |d| = {err}"

    pose_j = np.asarray(camera_head_forward(params["camera_head"], outs_j, opts))
    err_pose = np.abs(pose_j - pose_t).max()
    assert err_pose < 2e-4, f"camera head |d| = {err_pose}"

    depth_j, conf_j = dpt_head_forward(
        params["depth_head"], outs_j, ps_j, (H, W), opts, activation="exp"
    )
    err_d = np.abs(np.asarray(depth_j[..., 0]) - depth_t.numpy()).max()
    err_c = np.abs(np.asarray(conf_j) - conf_t.numpy()).max()
    assert err_d < 5e-4, f"depth |d| = {err_d}"
    assert err_c < 5e-4, f"conf |d| = {err_c}"


def test_vggt_pose_encoding_convention():
    from gtsfm_tpu.frontend.vggt import pose_encoding_to_extri_intri

    import jax.numpy as jnp

    enc = jnp.asarray(
        np.array([[0.1, -0.2, 0.3, 0, 0, 0, 1.0, 0.8, 0.9]], np.float32)
    )  # identity quat (real-last), fov_h=0.8, fov_w=0.9
    ex, K = pose_encoding_to_extri_intri(enc, (100, 200))
    np.testing.assert_allclose(np.asarray(ex[0, :, :3]), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ex[0, :, 3]), [0.1, -0.2, 0.3], atol=1e-6)
    assert abs(float(K[0, 0, 0]) - 200 / 2 / math.tan(0.45)) < 1e-3
    assert abs(float(K[0, 1, 1]) - 100 / 2 / math.tan(0.40)) < 1e-3
