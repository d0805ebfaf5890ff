"""Exactness of the Flax LoFTR port against a torch reference.

Methodology (same as test_superglue_exact / test_mast3r_exact): build the
public LoFTR ds architecture in torch with RANDOM weights using the
official module naming (ZJU LoFTR / kornia.feature.loftr state_dict
keys), export state_dict through convert_torch_state_dict, and require
the Flax forward to match numerically at every stage — backbone FPN,
positional encoding, coarse linear-attention transformer, dual-softmax
confidences, and the fine window refinement end-to-end."""

import math
from copy import deepcopy

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from gtsfm_tpu.frontend.matchers.loftr import (  # noqa: E402
    LoFTRNet,
    LoFTROptions,
    convert_torch_state_dict,
    position_encoding_sine,
)

# ---------------------------------------------------------------------------
# torch reference (public LoFTR-ds architecture, official module names)
# ---------------------------------------------------------------------------


def conv1x1(in_p, out_p, stride=1):
    return nn.Conv2d(in_p, out_p, kernel_size=1, stride=stride, padding=0, bias=False)


def conv3x3(in_p, out_p, stride=1):
    return nn.Conv2d(in_p, out_p, kernel_size=3, stride=stride, padding=1, bias=False)


class BasicBlock(nn.Module):
    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = conv3x3(in_planes, planes, stride)
        self.conv2 = conv3x3(planes, planes)
        self.bn1 = nn.BatchNorm2d(planes)
        self.bn2 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        if stride == 1:
            self.downsample = None
        else:
            self.downsample = nn.Sequential(
                conv1x1(in_planes, planes, stride=stride), nn.BatchNorm2d(planes)
            )

    def forward(self, x):
        y = x
        y = self.relu(self.bn1(self.conv1(y)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            x = self.downsample(x)
        return self.relu(x + y)


class ResNetFPN_8_2(nn.Module):
    def __init__(self, initial_dim=128, block_dims=(128, 196, 256)):
        super().__init__()
        self.in_planes = initial_dim
        self.conv1 = nn.Conv2d(1, initial_dim, kernel_size=7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(initial_dim)
        self.relu = nn.ReLU(inplace=True)
        self.layer1 = self._make_layer(block_dims[0], stride=1)
        self.layer2 = self._make_layer(block_dims[1], stride=2)
        self.layer3 = self._make_layer(block_dims[2], stride=2)
        self.layer3_outconv = conv1x1(block_dims[2], block_dims[2])
        self.layer2_outconv = conv1x1(block_dims[1], block_dims[2])
        self.layer2_outconv2 = nn.Sequential(
            conv3x3(block_dims[2], block_dims[2]),
            nn.BatchNorm2d(block_dims[2]),
            nn.LeakyReLU(),
            conv3x3(block_dims[2], block_dims[1]),
        )
        self.layer1_outconv = conv1x1(block_dims[0], block_dims[1])
        self.layer1_outconv2 = nn.Sequential(
            conv3x3(block_dims[1], block_dims[1]),
            nn.BatchNorm2d(block_dims[1]),
            nn.LeakyReLU(),
            conv3x3(block_dims[1], block_dims[0]),
        )

    def _make_layer(self, dim, stride=1):
        l1 = BasicBlock(self.in_planes, dim, stride=stride)
        l2 = BasicBlock(dim, dim, stride=1)
        self.in_planes = dim
        return nn.Sequential(l1, l2)

    def forward(self, x):
        x0 = self.relu(self.bn1(self.conv1(x)))
        x1 = self.layer1(x0)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x3_out = self.layer3_outconv(x3)
        x3_out_2x = F.interpolate(x3_out, scale_factor=2.0, mode="bilinear", align_corners=True)
        x2_out = self.layer2_outconv(x2)
        x2_out = self.layer2_outconv2(x2_out + x3_out_2x)
        x2_out_2x = F.interpolate(x2_out, scale_factor=2.0, mode="bilinear", align_corners=True)
        x1_out = self.layer1_outconv(x1)
        x1_out = self.layer1_outconv2(x1_out + x2_out_2x)
        return x3_out, x1_out


class LinearAttention(nn.Module):
    def __init__(self, eps=1e-6):
        super().__init__()
        self.eps = eps

    def forward(self, queries, keys, values):
        Q = F.elu(queries) + 1
        K = F.elu(keys) + 1
        v_length = values.size(1)
        values = values / v_length
        KV = torch.einsum("nshd,nshv->nhdv", K, values)
        Z = 1 / (torch.einsum("nlhd,nhd->nlh", Q, K.sum(dim=1)) + self.eps)
        out = torch.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * v_length
        return out.contiguous()


class LoFTREncoderLayer(nn.Module):
    def __init__(self, d_model, nhead):
        super().__init__()
        self.dim = d_model // nhead
        self.nhead = nhead
        self.q_proj = nn.Linear(d_model, d_model, bias=False)
        self.k_proj = nn.Linear(d_model, d_model, bias=False)
        self.v_proj = nn.Linear(d_model, d_model, bias=False)
        self.attention = LinearAttention()
        self.merge = nn.Linear(d_model, d_model, bias=False)
        self.mlp = nn.Sequential(
            nn.Linear(d_model * 2, d_model * 2, bias=False),
            nn.ReLU(True),
            nn.Linear(d_model * 2, d_model, bias=False),
        )
        self.norm1 = nn.LayerNorm(d_model)
        self.norm2 = nn.LayerNorm(d_model)

    def forward(self, x, source):
        bs = x.size(0)
        q = self.q_proj(x).view(bs, -1, self.nhead, self.dim)
        k = self.k_proj(source).view(bs, -1, self.nhead, self.dim)
        v = self.v_proj(source).view(bs, -1, self.nhead, self.dim)
        m = self.attention(q, k, v)
        m = self.merge(m.view(bs, -1, self.nhead * self.dim))
        m = self.norm1(m)
        m2 = self.mlp(torch.cat([x, m], dim=2))
        m2 = self.norm2(m2)
        return x + m2


class LocalFeatureTransformer(nn.Module):
    def __init__(self, d_model, nhead, layer_names):
        super().__init__()
        encoder_layer = LoFTREncoderLayer(d_model, nhead)
        self.layers = nn.ModuleList(
            [deepcopy(encoder_layer) for _ in range(len(layer_names))]
        )
        self.names = list(layer_names)

    def forward(self, feat0, feat1):
        for layer, name in zip(self.layers, self.names):
            if name == "self":
                feat0, feat1 = layer(feat0, feat0), layer(feat1, feat1)
            else:
                feat0, feat1 = layer(feat0, feat1), layer(feat1, feat0)
        return feat0, feat1


class TorchLoFTR(nn.Module):
    def __init__(self, opts: LoFTROptions):
        super().__init__()
        self.opts = opts
        self.backbone = ResNetFPN_8_2(opts.initial_dim, opts.block_dims)
        self.loftr_coarse = LocalFeatureTransformer(
            opts.d_coarse, opts.nhead, opts.coarse_layer_names
        )
        self.fine_preprocess = nn.Module()
        self.fine_preprocess.down_proj = nn.Linear(opts.d_coarse, opts.d_fine, bias=True)
        self.fine_preprocess.merge_feat = nn.Linear(2 * opts.d_fine, opts.d_fine, bias=True)
        self.loftr_fine = LocalFeatureTransformer(
            opts.d_fine, opts.nhead, opts.fine_layer_names
        )

    def coarse_forward(self, img0, img1, pe):
        fc0, ff0 = self.backbone(img0)
        fc1, ff1 = self.backbone(img1)
        n, c, hc, wc = fc0.shape
        t0 = (fc0 + pe[:, :, :hc, :wc]).flatten(2).transpose(1, 2)
        t1 = (fc1 + pe[:, :, :hc, :wc]).flatten(2).transpose(1, 2)
        t0, t1 = self.loftr_coarse(t0, t1)
        s0 = t0 / self.opts.d_coarse**0.5
        s1 = t1 / self.opts.d_coarse**0.5
        sim = torch.einsum("nlc,nsc->nls", s0, s1) / self.opts.dual_softmax_temperature
        conf = F.softmax(sim, 1) * F.softmax(sim, 2)
        return fc0, ff0, fc1, ff1, t0, t1, conf

    def fine_forward(self, ff0, ff1, t0, t1, i_ids, j_ids, wc):
        o = self.opts
        W = o.fine_window_size
        stride = 4
        # unfold with zero padding (official FinePreprocess)
        u0 = F.unfold(ff0, kernel_size=(W, W), stride=stride, padding=W // 2)
        u1 = F.unfold(ff1, kernel_size=(W, W), stride=stride, padding=W // 2)
        # (n, cf*W*W, l) -> (n, l, W*W, cf)
        cf = ff0.shape[1]
        u0 = u0.view(1, cf, W * W, -1).permute(0, 3, 2, 1)
        u1 = u1.view(1, cf, W * W, -1).permute(0, 3, 2, 1)
        w0 = u0[0, i_ids]  # (M, WW, cf)
        w1 = u1[0, j_ids]
        c_win = self.fine_preprocess.down_proj(
            torch.cat([t0[0, i_ids], t1[0, j_ids]], 0)
        )  # (2M, cf)
        f_cat = torch.cat([w0, w1], 0)
        f_cat = self.fine_preprocess.merge_feat(
            torch.cat([f_cat, c_win.unsqueeze(1).repeat(1, W * W, 1)], -1)
        )
        M = len(i_ids)
        w0, w1 = f_cat[:M], f_cat[M:]
        w0, w1 = self.loftr_fine(w0, w1)
        # fine matching
        WW = W * W
        center = w0[:, WW // 2, :]
        sim = torch.einsum("mc,mrc->mr", center, w1) / cf**0.5
        heat = F.softmax(sim, dim=1).view(-1, W, W)
        # dsnt spatial expectation over normalized [-1, 1] grid
        grid = torch.linspace(-1.0, 1.0, W)
        gy, gx = torch.meshgrid(grid, grid, indexing="ij")
        ex = (heat * gx[None]).sum(dim=(1, 2))
        ey = (heat * gy[None]).sum(dim=(1, 2))
        return torch.stack([ex, ey], -1)


def _randomize_bn(model):
    for mod in model.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.uniform_(-0.3, 0.3)
            mod.running_var.uniform_(0.5, 2.0)


def _rename_state_dict(model: TorchLoFTR):
    """Torch module names -> official checkpoint key names (only the
    unfold-window size difference of 'layerN.M' vs 'layerN_M' paths is
    handled by the converter; nothing to rename here)."""
    return model.state_dict()


def test_loftr_exact_forward():
    torch.manual_seed(0)
    opts = LoFTROptions(max_matches=16, match_threshold=0.0)
    tmodel = TorchLoFTR(opts).eval()
    _randomize_bn(tmodel)

    H = Wd = 64
    rng = np.random.default_rng(0)
    im0 = rng.uniform(0, 1, (H, Wd)).astype(np.float32)
    im1 = rng.uniform(0, 1, (H, Wd)).astype(np.float32)
    pe_np = position_encoding_sine(H // 8, Wd // 8, opts.d_coarse, opts.temp_bug_fix)
    pe_t = torch.from_numpy(pe_np.transpose(2, 0, 1))[None]

    with torch.no_grad():
        fc0, ff0, fc1, ff1, t0, t1, conf_t = tmodel.coarse_forward(
            torch.from_numpy(im0)[None, None], torch.from_numpy(im1)[None, None], pe_t
        )

    import jax
    import jax.numpy as jnp

    variables = convert_torch_state_dict(_rename_state_dict(tmodel), opts)
    net = LoFTRNet(opts)

    # stage probes via the net's own coarse/fine methods
    out = net.apply(variables, jnp.asarray(im0), jnp.asarray(im1),
                    method="coarse_forward")
    fc0_j, ff0_j, fc1_j, ff1_j, t0_j, t1_j, conf_j = out

    # backbone: NCHW -> NHWC
    err_fc = np.abs(np.asarray(fc0_j) - fc0[0].permute(1, 2, 0).numpy()).max()
    err_ff = np.abs(np.asarray(ff0_j) - ff0[0].permute(1, 2, 0).numpy()).max()
    assert err_fc < 5e-4, f"coarse backbone |d| = {err_fc}"
    assert err_ff < 5e-4, f"fine backbone |d| = {err_ff}"

    err_t0 = np.abs(np.asarray(t0_j) - t0[0].numpy()).max()
    err_t1 = np.abs(np.asarray(t1_j) - t1[0].numpy()).max()
    assert err_t0 < 5e-3, f"coarse transformer |d| = {err_t0}"
    assert err_t1 < 5e-3, f"coarse transformer |d| = {err_t1}"

    err_conf = np.abs(np.asarray(conf_j) - conf_t[0].numpy()).max()
    assert err_conf < 1e-4, f"dual-softmax conf |d| = {err_conf}"

    # ---- fine stage on a fixed match set --------------------------------
    L = conf_j.shape[0]
    rng2 = np.random.default_rng(1)
    i_ids = rng2.choice(L, 8, replace=False).astype(np.int64)
    j_ids = rng2.choice(L, 8, replace=False).astype(np.int64)
    with torch.no_grad():
        off_t = tmodel.fine_forward(
            ff0, ff1, t0, t1, torch.from_numpy(i_ids), torch.from_numpy(j_ids), Wd // 8
        ).numpy()

    off_j = np.asarray(
        net.apply(
            variables, ff0_j, ff1_j, t0_j, t1_j,
            jnp.asarray(i_ids), jnp.asarray(j_ids), Wd // 8,
            method="fine_forward",
        )
    )
    err_off = np.abs(off_j - off_t).max()
    assert err_off < 5e-3, f"fine expectation |d| = {err_off}"


def test_loftr_matcher_contract():
    """LoFTRMatcher follows the DenseImageMatcher contract and is
    config-selectable as the exact LoFTR."""
    import jax.numpy as jnp

    from gtsfm_tpu.frontend.matchers.loftr import LoFTRMatcher

    m = LoFTRMatcher(LoFTROptions(max_matches=64, match_threshold=0.0),
                     example_hw=(64, 64))
    rng = np.random.default_rng(0)
    uv0, uv1, sc, ok = m.match_images(
        jnp.asarray(rng.uniform(size=(64, 64)).astype(np.float32)),
        jnp.asarray(rng.uniform(size=(64, 64)).astype(np.float32)),
    )
    assert uv0.shape == (64, 2) and uv1.shape == (64, 2)
    o = np.asarray(ok)
    if o.any():
        assert np.asarray(uv0)[o].min() >= 0
        assert np.asarray(uv0)[o].max() < 64
