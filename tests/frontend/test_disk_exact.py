"""Layer-for-layer exactness of the JAX DISK port against a torch reference.

Methodology (same as the NetVLAD / D2-Net / LightGlue exactness suites):
build the torch architecture with RANDOM weights in the documented
state_dict layout, convert via load_torch_weights, and require the dense
U-Net outputs to agree. A real cvlab-epfl/disk checkpoint then converts
through the identical path (zero-egress image: no weights bundled).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from gtsfm_tpu.frontend.detectors.disk import (
    DISK,
    DISKOptions,
    load_torch_weights,
    unet_forward,
)


class _NoOp(nn.Module):
    def forward(self, x):
        return x


class _Down(nn.Module):
    def forward(self, x):
        return F.avg_pool2d(x, 2)


class _Up(nn.Module):
    def forward(self, x):
        return F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)


def _conv_block(cin, cout):
    return nn.Sequential(
        nn.InstanceNorm2d(cin), nn.PReLU(cin), nn.Conv2d(cin, cout, 5, padding=2)
    )


class _UpBlock(nn.Module):
    def __init__(self, bottom, horizontal, cout):
        super().__init__()
        self.upsample = _Up()
        self.conv = _conv_block(bottom + horizontal, cout)

    def forward(self, bot, hor):
        return self.conv(torch.cat([self.upsample(bot), hor], dim=1))


class _Unet(nn.Module):
    """Thin-setup DISK U-Net: down=[16,32,64,64,64], up=[64,64,64,129]."""

    def __init__(self, in_features=3, down=(16, 32, 64, 64, 64), up=(64, 64, 64, 129)):
        super().__init__()
        dims = [in_features] + list(down)
        blocks = [nn.Sequential(_NoOp(), nn.Sequential(nn.Conv2d(dims[0], dims[1], 5, padding=2)))]
        for cin, cout in zip(dims[1:-1], dims[2:]):
            blocks.append(nn.Sequential(_Down(), _conv_block(cin, cout)))
        self.path_down = nn.ModuleList(blocks)
        bot = [down[-1]] + list(up[:-1])
        hor = dims[-2::-1]
        self.path_up = nn.ModuleList(
            [_UpBlock(b, h, c) for b, h, c in zip(bot, hor, up)]
        )

    def forward(self, x):
        feats = []
        y = x
        for blk in self.path_down:
            y = blk(y)
            feats.append(y)
        y = feats[-1]
        for blk, skip in zip(self.path_up, feats[-2::-1]):
            y = blk(y, skip)
        return y


class _TorchDISK(nn.Module):
    def __init__(self):
        super().__init__()
        self.unet = _Unet()


def test_disk_unet_exact(tmp_path):
    torch.manual_seed(0)
    ref = _TorchDISK().eval()
    path = tmp_path / "disk.pth"
    torch.save(ref.state_dict(), path)

    params = load_torch_weights(str(path))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 64, 80)).astype(np.float32)
    with torch.no_grad():
        want = ref.unet(torch.from_numpy(x)).numpy()  # (B, 129, H, W)
    got = np.asarray(unet_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=2e-4, atol=2e-4)


def test_disk_detect_shapes():
    det = DISK(DISKOptions(max_keypoints=256))
    images = np.random.default_rng(1).uniform(0, 1, (2, 64, 64)).astype(np.float32)
    kps, desc = det(jnp.asarray(images))
    assert kps.coordinates.shape == (2, 256, 2)
    assert desc.shape == (2, 256, 128)
    assert np.all(np.asarray(kps.coordinates) >= 0)
    norms = np.linalg.norm(np.asarray(desc), axis=-1)
    np.testing.assert_allclose(norms[np.asarray(kps.mask)], 1.0, atol=1e-5)


def test_disk_registry_build():
    from gtsfm_tpu.frontend.registry import build_detector

    adapter = build_detector({"name": "disk", "max_keypoints": 128})
    images = np.random.default_rng(2).uniform(0, 1, (1, 50, 70)).astype(np.float32)
    kp_xy, kp_mask, descs = adapter.detect_batch(images)
    assert kp_xy.shape == (1, 128, 2)
    assert descs.shape == (1, 128, 128)
