"""Exactness of the JAX VGGT track head against a torch mirror.

Methodology (same as test_vggt_exact): build the public VGGT track head
in torch at REDUCED dims with the official module naming
(track_head.feature_extractor.* DPT in feature_only mode,
track_head.tracker.* BaseTrackerPredictor with corr pyramid +
EfficientUpdateFormer using nn.MultiheadAttention), export state_dict
through convert_torch_track_state_dict, and require the JAX forward to
match at every stage — feature maps, correlation sampling, one update
iteration, and the final (tracks, visibility, confidence)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402
from torch import nn  # noqa: E402

from gtsfm_tpu.frontend.vggt import VGGTOptions, convert_torch_state_dict  # noqa: E402
from gtsfm_tpu.frontend.vggt_track import (  # noqa: E402
    TrackOptions,
    convert_torch_track_state_dict,
    track_head_forward,
)
from tests.frontend.test_vggt_exact import (  # noqa: E402
    TorchAggregator,
    TorchDPTHead,
    _OPTS,
)


# ---- torch track modules (vggt/heads/track_modules naming) -----------------


def bilinear_sampler(input, coords, align_corners=True, padding_mode="border"):
    sizes = input.shape[2:]
    assert len(sizes) == 2
    if align_corners:
        scale = torch.tensor(
            [2 / max(size - 1, 1) for size in reversed(sizes)], device=coords.device
        )
    else:
        scale = torch.tensor([2 / size for size in reversed(sizes)], device=coords.device)
    coords = coords * scale - 1
    return TF.grid_sample(
        input, coords, align_corners=align_corners, padding_mode=padding_mode
    )


def sample_features4d(input, coords):
    B, _, _, _ = input.shape
    coords = coords.unsqueeze(2)  # B N 1 2
    feats = bilinear_sampler(input, coords)
    return feats.permute(0, 2, 1, 3).view(B, -1, feats.shape[1] * feats.shape[3])


def get_2d_embedding(xy, C, cat_coords=True):
    B, N, D = xy.shape
    assert D == 2
    x = xy[:, :, 0:1]
    y = xy[:, :, 1:2]
    div_term = (
        torch.arange(0, C, 2, device=xy.device, dtype=torch.float32) * (1000.0 / C)
    ).reshape(1, 1, int(C / 2))
    pe_x = torch.zeros(B, N, C, device=xy.device, dtype=torch.float32)
    pe_x[:, :, 0::2] = torch.sin(x * div_term)
    pe_x[:, :, 1::2] = torch.cos(x * div_term)
    pe_y = torch.zeros(B, N, C, device=xy.device, dtype=torch.float32)
    pe_y[:, :, 0::2] = torch.sin(y * div_term)
    pe_y[:, :, 1::2] = torch.cos(y * div_term)
    pe = torch.cat([pe_x, pe_y], dim=2)
    if cat_coords:
        pe = torch.cat([xy, pe], dim=2)
    return pe


class CorrBlock:
    def __init__(self, fmaps, num_levels=4, radius=4, padding_mode="zeros"):
        B, S, C, H, W = fmaps.shape
        self.S, self.C, self.H, self.W = S, C, H, W
        self.num_levels = num_levels
        self.radius = radius
        self.padding_mode = padding_mode
        self.fmaps_pyramid = [fmaps]
        for _ in range(self.num_levels - 1):
            fmaps_ = fmaps.reshape(B * S, C, H, W)
            fmaps_ = TF.avg_pool2d(fmaps_, 2, stride=2)
            _, _, H, W = fmaps_.shape
            fmaps = fmaps_.reshape(B, S, C, H, W)
            self.fmaps_pyramid.append(fmaps)

    def corr(self, targets):
        B, S, N, C = targets.shape
        self.corrs_pyramid = []
        for fmaps in self.fmaps_pyramid:
            *_, H, W = fmaps.shape
            fmap2s = fmaps.view(B, S, C, H * W)
            corrs = torch.matmul(targets, fmap2s)
            corrs = corrs.view(B, S, N, H, W)
            corrs = corrs / torch.sqrt(torch.tensor(C).float())
            self.corrs_pyramid.append(corrs)

    def sample(self, coords):
        r = self.radius
        B, S, N, D = coords.shape
        out_pyramid = []
        for i in range(self.num_levels):
            corrs = self.corrs_pyramid[i]
            *_, H, W = corrs.shape
            dx = torch.linspace(-r, r, 2 * r + 1, device=coords.device)
            dy = torch.linspace(-r, r, 2 * r + 1, device=coords.device)
            delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), axis=-1)
            centroid_lvl = coords.reshape(B * S * N, 1, 1, 2) / (2**i)
            coords_lvl = centroid_lvl + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
            s = bilinear_sampler(
                corrs.reshape(B * S * N, 1, H, W), coords_lvl,
                padding_mode=self.padding_mode,
            )
            out_pyramid.append(s.view(B, S, N, -1))
        return torch.cat(out_pyramid, dim=-1)


class Mlp(nn.Module):
    def __init__(self, in_features, hidden_features, out_features):
        super().__init__()
        self.fc1 = nn.Linear(in_features, hidden_features)
        self.act = nn.GELU(approximate="tanh")
        self.fc2 = nn.Linear(hidden_features, out_features)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class AttnBlock(nn.Module):
    def __init__(self, hidden_size, num_heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(hidden_size, eps=1e-6)
        self.attn = nn.MultiheadAttention(hidden_size, num_heads, batch_first=True)
        self.norm2 = nn.LayerNorm(hidden_size, eps=1e-6)
        self.mlp = Mlp(hidden_size, int(hidden_size * mlp_ratio), hidden_size)

    def forward(self, x):
        y = self.norm1(x)
        x = x + self.attn(y, y, y, need_weights=False)[0]
        x = x + self.mlp(self.norm2(x))
        return x


class CrossAttnBlock(nn.Module):
    def __init__(self, hidden_size, context_dim, num_heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(hidden_size, eps=1e-6)
        self.norm_context = nn.LayerNorm(hidden_size)
        self.cross_attn = nn.MultiheadAttention(hidden_size, num_heads, batch_first=True)
        self.norm2 = nn.LayerNorm(hidden_size, eps=1e-6)
        self.mlp = Mlp(hidden_size, int(hidden_size * mlp_ratio), hidden_size)

    def forward(self, x, context):
        q = self.norm1(x)
        kv = self.norm_context(context)
        x = x + self.cross_attn(q, kv, kv, need_weights=False)[0]
        x = x + self.mlp(self.norm2(x))
        return x


class EfficientUpdateFormer(nn.Module):
    def __init__(self, space_depth, time_depth, input_dim, hidden_size, num_heads,
                 output_dim, mlp_ratio=4.0, num_virtual_tracks=8):
        super().__init__()
        self.num_heads = num_heads
        self.num_virtual_tracks = num_virtual_tracks
        self.input_transform = nn.Linear(input_dim, hidden_size)
        self.flow_head = nn.Linear(hidden_size, output_dim)
        self.virual_tracks = nn.Parameter(
            torch.randn(1, num_virtual_tracks, 1, hidden_size)
        )
        self.time_blocks = nn.ModuleList(
            [AttnBlock(hidden_size, num_heads, mlp_ratio) for _ in range(time_depth)]
        )
        self.space_virtual_blocks = nn.ModuleList(
            [AttnBlock(hidden_size, num_heads, mlp_ratio) for _ in range(space_depth)]
        )
        self.space_point2virtual_blocks = nn.ModuleList(
            [CrossAttnBlock(hidden_size, hidden_size, num_heads, mlp_ratio)
             for _ in range(space_depth)]
        )
        self.space_virtual2point_blocks = nn.ModuleList(
            [CrossAttnBlock(hidden_size, hidden_size, num_heads, mlp_ratio)
             for _ in range(space_depth)]
        )

    def forward(self, input_tensor):
        tokens = self.input_transform(input_tensor)
        init_tokens = tokens
        B, _, T, _ = tokens.shape
        virtual_tokens = self.virual_tracks.repeat(B, 1, T, 1)
        tokens = torch.cat([tokens, virtual_tokens], dim=1)
        _, N, _, _ = tokens.shape
        j = 0
        n_space = len(self.space_virtual_blocks)
        for i in range(len(self.time_blocks)):
            time_tokens = tokens.contiguous().view(B * N, T, -1)
            time_tokens = self.time_blocks[i](time_tokens)
            tokens = time_tokens.view(B, N, T, -1)
            if n_space and j < n_space and (
                i % (len(self.time_blocks) // n_space) == 0
            ):
                space_tokens = tokens.permute(0, 2, 1, 3).contiguous().view(B * T, N, -1)
                point_tokens = space_tokens[:, : N - self.num_virtual_tracks]
                virtual = space_tokens[:, N - self.num_virtual_tracks :]
                virtual = self.space_virtual2point_blocks[j](virtual, point_tokens)
                virtual = self.space_virtual_blocks[j](virtual)
                point_tokens = self.space_point2virtual_blocks[j](point_tokens, virtual)
                space_tokens = torch.cat([point_tokens, virtual], dim=1)
                tokens = space_tokens.view(B, T, N, -1).permute(0, 2, 1, 3)
                j += 1
        tokens = tokens[:, : N - self.num_virtual_tracks]
        tokens = tokens + init_tokens
        return self.flow_head(tokens)


class BaseTrackerPredictor(nn.Module):
    def __init__(self, stride=2, corr_levels=3, corr_radius=2, latent_dim=32,
                 hidden_size=48, depth=2, max_scale=518, num_heads=4,
                 num_virtual_tracks=8, predict_conf=True):
        super().__init__()
        self.stride = stride
        self.latent_dim = latent_dim
        self.corr_levels = corr_levels
        self.corr_radius = corr_radius
        self.max_scale = max_scale
        self.predict_conf = predict_conf
        self.flows_emb_dim = latent_dim // 2
        self.corr_mlp = Mlp(corr_levels * (2 * corr_radius + 1) ** 2,
                            hidden_size, latent_dim)
        self.transformer_dim = 3 * latent_dim + 4
        self.updateformer = EfficientUpdateFormer(
            space_depth=depth, time_depth=depth, input_dim=self.transformer_dim,
            hidden_size=hidden_size, num_heads=num_heads,
            output_dim=latent_dim + 2, num_virtual_tracks=num_virtual_tracks,
        )
        self.fmap_norm = nn.LayerNorm(latent_dim)
        self.ffeat_norm = nn.GroupNorm(1, latent_dim)
        self.ffeat_updater = nn.Sequential(nn.Linear(latent_dim, latent_dim), nn.GELU())
        self.vis_predictor = nn.Sequential(nn.Linear(latent_dim, 1))
        if predict_conf:
            self.conf_predictor = nn.Sequential(nn.Linear(latent_dim, 1))

    def forward(self, query_points, fmaps, iters=2):
        B, N, D = query_points.shape
        B, S, C, HH, WW = fmaps.shape
        fmaps = self.fmap_norm(fmaps.permute(0, 1, 3, 4, 2)).permute(0, 1, 4, 2, 3)
        query_points = query_points / float(self.stride)
        query_track_feat = sample_features4d(fmaps[:, 0], query_points)
        coords = query_points.clone().reshape(B, 1, N, 2).repeat(1, S, 1, 1)
        track_feats = query_track_feat.unsqueeze(1).repeat(1, S, 1, 1)
        fcorr_fn = CorrBlock(fmaps, num_levels=self.corr_levels, radius=self.corr_radius)
        coord_preds = []
        for _ in range(iters):
            coords = coords.detach()
            fcorr_fn.corr(track_feats)
            fcorrs = fcorr_fn.sample(coords)
            corrdim = fcorrs.shape[3]
            fcorrs_ = fcorrs.permute(0, 2, 1, 3).reshape(B * N, S, corrdim)
            fcorrs_ = self.corr_mlp(fcorrs_)
            flows = (coords - coords[:, 0:1]).permute(0, 2, 1, 3).reshape(B * N, S, 2)
            flows_emb = get_2d_embedding(flows, self.flows_emb_dim, cat_coords=False)
            flows_emb = torch.cat(
                [flows_emb, flows / self.max_scale, flows / self.max_scale], dim=-1
            )
            track_feats_ = track_feats.permute(0, 2, 1, 3).reshape(
                B * N, S, self.latent_dim
            )
            x = torch.cat([flows_emb, fcorrs_, track_feats_], dim=2)
            x = x.view(B, N, S, self.transformer_dim)
            delta = self.updateformer(x)
            delta = delta.reshape(B * N * S, self.latent_dim + 2)
            delta_coords_ = delta[:, :2]
            delta_feats_ = delta[:, 2:]
            track_feats_flat = track_feats_.reshape(B * N * S, self.latent_dim)
            track_feats_flat = track_feats_flat + self.ffeat_updater(
                self.ffeat_norm(delta_feats_)
            )
            track_feats = track_feats_flat.reshape(B, N, S, self.latent_dim).permute(
                0, 2, 1, 3
            )
            coords = coords + delta_coords_.reshape(B, N, S, 2).permute(0, 2, 1, 3)
            coord_preds.append(coords * self.stride)
        vis_e = torch.sigmoid(
            self.vis_predictor(
                track_feats.reshape(B * S * N, self.latent_dim)
            ).reshape(B, S, N)
        )
        conf_e = torch.sigmoid(
            self.conf_predictor(
                track_feats.reshape(B * S * N, self.latent_dim)
            ).reshape(B, S, N)
        )
        return coord_preds, vis_e, conf_e


class TorchFeatureDPT(TorchDPTHead):
    """The DPT head in feature_only mode: output_conv1 maps to `features`
    channels, no output_conv2, bilinear resize to (H, W) / down_ratio."""

    def __init__(self, o, features, down_ratio=2):
        super().__init__(o)
        F = o.dpt_features
        self.scratch.output_conv1 = nn.Conv2d(F, features, 3, 1, 1)
        del self.scratch.output_conv2
        self.down_ratio = down_ratio

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
        out = TF.interpolate(
            out,
            size=(gh * o.patch_size // self.down_ratio,
                  gw * o.patch_size // self.down_ratio),
            mode="bilinear", align_corners=True,
        )
        return out


class TorchTrackHead(nn.Module):
    def __init__(self, o, features=32):
        super().__init__()
        self.feature_extractor = TorchFeatureDPT(o, features, down_ratio=2)
        self.tracker = BaseTrackerPredictor(latent_dim=features)

    def forward(self, outs, patch_start, hw, query_points, iters=2):
        fmaps = self.feature_extractor(outs, patch_start, hw)
        return self.tracker(query_points[None], fmaps[None], iters=iters)


def test_vggt_track_head_exact():
    torch.manual_seed(0)
    o = _OPTS
    agg = TorchAggregator(o).eval()
    head = TorchTrackHead(o, features=32).eval()

    S, H, W = 2, 56, 56
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (S, H, W, 3)).astype(np.float32)
    timg = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
    N = 7
    qp = rng.uniform(2, 50, (N, 2)).astype(np.float32)

    with torch.no_grad():
        outs_t, ps_t = agg(timg)
        tracks_t, vis_t, conf_t = head(outs_t, ps_t, (H, W), torch.from_numpy(qp))

    import jax.numpy as jnp

    from gtsfm_tpu.frontend.vggt import aggregator_forward

    params_full, opts = convert_torch_state_dict(
        {**{f"aggregator.{k}": v for k, v in agg.state_dict().items()},
         **_fake_heads_sd(o)},
        opts=o,
    )
    sd_track = {f"track_head.{k}": v for k, v in head.state_dict().items()}
    tparams, topts = convert_torch_track_state_dict(sd_track)
    assert topts.latent_dim == 32 and topts.num_virtual_tracks == 8
    topts = topts._replace(num_heads=4, depth=2, iters=2)

    outs_j, ps_j = aggregator_forward(params_full["aggregator"], jnp.asarray(imgs), opts)
    coord_preds, vis_j, conf_j = track_head_forward(
        tparams, outs_j, ps_j, (H, W), jnp.asarray(qp), opts, topts, iters=2
    )

    err_track = np.abs(np.asarray(coord_preds[-1]) - tracks_t[-1][0].numpy()).max()
    err_vis = np.abs(np.asarray(vis_j) - vis_t[0].numpy()).max()
    err_conf = np.abs(np.asarray(conf_j) - conf_t[0].numpy()).max()
    assert err_track < 5e-3, f"tracks |d| = {err_track}"
    assert err_vis < 1e-4, f"vis |d| = {err_vis}"
    assert err_conf < 1e-4, f"conf |d| = {err_conf}"


def _fake_heads_sd(o):
    """Minimal camera/depth head tensors so the full converter parses."""
    torch.manual_seed(1)
    from tests.frontend.test_vggt_exact import TorchCameraHead, TorchDPTHead

    cam = TorchCameraHead(o)
    dpt = TorchDPTHead(o)
    return {
        **{f"camera_head.{k}": v for k, v in cam.state_dict().items()},
        **{f"depth_head.{k}": v for k, v in dpt.state_dict().items()},
    }
