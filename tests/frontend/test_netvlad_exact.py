"""Exact VGG16-NetVLAD port: numerical parity with the hloc architecture.

The torch reference is built from the published layer spec with RANDOM
weights (torchvision-free), validating that convert_hloc_netvlad_state_dict
maps the public checkpoint layout onto the Flax module exactly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gtsfm_tpu.frontend.global_descriptors.descriptors import (  # noqa: E402
    NetVLADVGG16,
    convert_hloc_netvlad_state_dict,
)


def _torch_reference():
    import torch.nn as tnn
    import torch.nn.functional as F

    convs = [(3, 64), (64, 64), "M", (64, 128), (128, 128), "M",
             (128, 256), (256, 256), (256, 256), "M",
             (256, 512), (512, 512), (512, 512), "M",
             (512, 512), (512, 512), (512, 512)]
    layers = []
    for k, spec in enumerate(convs):
        if spec == "M":
            layers.append(tnn.MaxPool2d(2, stride=2))
        else:
            layers.append(tnn.Conv2d(spec[0], spec[1], 3, padding=1))
            layers.append(tnn.ReLU())
    layers = layers[:-1]  # hloc removes the final ReLU (and the last pool)

    class NetVLADLayer(tnn.Module):
        def __init__(self, input_dim=512, K=64):
            super().__init__()
            self.score_proj = tnn.Conv1d(input_dim, K, kernel_size=1, bias=False)
            self.centers = tnn.Parameter(torch.randn(input_dim, K) * 0.05)

        def forward(self, x):  # (B, D, N)
            b = x.size(0)
            scores = torch.softmax(self.score_proj(x), dim=1)  # (B, K, N)
            diff = x.unsqueeze(2) - self.centers.unsqueeze(0).unsqueeze(-1)
            desc = (scores.unsqueeze(1) * diff).sum(dim=-1)  # (B, D, K)
            desc = F.normalize(desc, dim=1)
            desc = desc.view(b, -1)
            return F.normalize(desc, dim=1)

    class Ref(tnn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = tnn.Sequential(*layers)
            self.netvlad = NetVLADLayer()
            self.whiten = tnn.Linear(512 * 64, 4096)

        def forward(self, image):  # (B, 3, H, W) in [0, 1]
            mean = torch.tensor([123.68, 116.779, 103.939]).view(1, -1, 1, 1)
            x = torch.clamp(image * 255.0, 0.0, 255.0) - mean
            d = self.backbone(x)
            b, c, _, _ = d.size()
            d = d.view(b, c, -1)
            d = torch.nn.functional.normalize(d, dim=1)
            desc = self.netvlad(d)
            desc = self.whiten(desc)
            return torch.nn.functional.normalize(desc, dim=1)

    torch.manual_seed(0)
    return Ref()


def test_netvlad_matches_hloc_reference():
    model = _torch_reference().eval()
    params = convert_hloc_netvlad_state_dict(model.state_dict())
    x = np.random.default_rng(0).uniform(size=(2, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    net = NetVLADVGG16()
    out = np.asarray(net.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert out.shape == (2, 4096)
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)
    # descriptor geometry: unit norm (random weights give near-identical
    # descriptors for noise inputs, so no separation assertion here)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_hloc_descriptor_interface():
    from gtsfm_tpu.frontend.global_descriptors.descriptors import HlocNetVLADDescriptor

    d = HlocNetVLADDescriptor()
    imgs = np.random.default_rng(1).uniform(size=(2, 64, 64)).astype(np.float32)
    out = d.describe_batch(imgs)
    assert out.shape == (2, 4096)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-4)
