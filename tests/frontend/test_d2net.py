"""D2-Net Flax port: numerical parity with the published torch architecture.

The torch reference below is constructed from the published layer spec
(truncated VGG-16 with dilated conv4 block) with RANDOM weights — it
validates that convert_torch_state_dict maps the public state_dict layout
onto the Flax module with exact numerics, without needing the pretrained
checkpoint (zero-egress image).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gtsfm_tpu.frontend.detectors.d2net import (  # noqa: E402
    D2Net,
    D2NetOptions,
    D2NetTrunk,
    convert_torch_state_dict,
    hard_detection,
    handcrafted_localization,
)


def _torch_trunk():
    import torch.nn as tnn

    class Wrapper(tnn.Module):
        def __init__(self):
            super().__init__()
            self.dense_feature_extraction = tnn.Module()
            self.dense_feature_extraction.model = tnn.Sequential(
                tnn.Conv2d(3, 64, 3, padding=1), tnn.ReLU(),
                tnn.Conv2d(64, 64, 3, padding=1), tnn.ReLU(),
                tnn.MaxPool2d(2, stride=2),
                tnn.Conv2d(64, 128, 3, padding=1), tnn.ReLU(),
                tnn.Conv2d(128, 128, 3, padding=1), tnn.ReLU(),
                tnn.MaxPool2d(2, stride=2),
                tnn.Conv2d(128, 256, 3, padding=1), tnn.ReLU(),
                tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(),
                tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(),
                tnn.AvgPool2d(2, stride=1),
                tnn.Conv2d(256, 512, 3, padding=2, dilation=2), tnn.ReLU(),
                tnn.Conv2d(512, 512, 3, padding=2, dilation=2), tnn.ReLU(),
                tnn.Conv2d(512, 512, 3, padding=2, dilation=2),
            )

        def forward(self, x):
            return torch.relu(self.dense_feature_extraction.model(x))

    torch.manual_seed(0)
    return Wrapper()


def test_trunk_matches_torch_reference():
    model = _torch_trunk().eval()
    params = convert_torch_state_dict(model.state_dict())
    x = np.random.default_rng(0).uniform(size=(1, 3, 32, 40)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()  # (1, 512, h, w)
    net = D2NetTrunk(use_relu=True)
    out = np.asarray(net.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert out.shape == (1, ref.shape[2], ref.shape[3], 512)
    np.testing.assert_allclose(out, ref.transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3)


def test_hard_detection_matches_torch_reference():
    """The jnp stencil detection/localization must match the published
    torch modules on the same feature map."""
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    f = rng.uniform(size=(1, 8, 12, 16)).astype(np.float32)  # (B, h, w, C)
    ft = torch.from_numpy(f.transpose(0, 3, 1, 2))  # (B, C, h, w)

    # torch hard detection (published filters)
    b, c, h, w = ft.shape
    depth_max = ft == ft.max(dim=1, keepdim=True)[0]
    local_max = ft == F.max_pool2d(ft, 3, stride=1, padding=1)
    dii_f = torch.tensor([[0, 1.0, 0], [0, -2.0, 0], [0, 1.0, 0]]).view(1, 1, 3, 3)
    dij_f = 0.25 * torch.tensor([[1.0, 0, -1.0], [0, 0.0, 0], [-1.0, 0, 1.0]]).view(1, 1, 3, 3)
    djj_f = torch.tensor([[0, 0, 0], [1.0, -2.0, 1.0], [0, 0, 0]]).view(1, 1, 3, 3)
    dii = F.conv2d(ft.reshape(-1, 1, h, w), dii_f, padding=1).view(b, c, h, w)
    dij = F.conv2d(ft.reshape(-1, 1, h, w), dij_f, padding=1).view(b, c, h, w)
    djj = F.conv2d(ft.reshape(-1, 1, h, w), djj_f, padding=1).view(b, c, h, w)
    det = dii * djj - dij * dij
    tr = dii + djj
    thr = (5.0 + 1) ** 2 / 5.0
    not_edge = (tr * tr / det <= thr) & (det > 0)
    ref = (depth_max & local_max & not_edge).numpy().transpose(0, 2, 3, 1)

    ours = np.asarray(hard_detection(jnp.asarray(f), 5.0))
    np.testing.assert_array_equal(ours, ref)

    # localization parity
    di_f = torch.tensor([[0, -0.5, 0], [0, 0, 0], [0, 0.5, 0]]).view(1, 1, 3, 3)
    dj_f = torch.tensor([[0, 0, 0], [-0.5, 0, 0.5], [0, 0, 0]]).view(1, 1, 3, 3)
    di = F.conv2d(ft.reshape(-1, 1, h, w), di_f, padding=1).view(b, c, h, w)
    dj = F.conv2d(ft.reshape(-1, 1, h, w), dj_f, padding=1).view(b, c, h, w)
    inv00, inv01, inv11 = djj / det, -dij / det, dii / det
    step_i = -(inv00 * di + inv01 * dj)
    step_j = -(inv01 * di + inv11 * dj)
    ref_disp = torch.stack([step_i, step_j], dim=-1).numpy().transpose(0, 2, 3, 1, 4)
    ours_disp = np.asarray(handcrafted_localization(jnp.asarray(f)))
    np.testing.assert_allclose(ours_disp, ref_disp, atol=1e-4, rtol=1e-3)


def test_d2net_component_interface():
    det = D2Net(D2NetOptions(max_keypoints=128))
    imgs = jnp.asarray(np.random.default_rng(2).uniform(size=(2, 64, 64)), jnp.float32)
    kps, descs = det(imgs)
    assert kps.coordinates.shape == (2, 128, 2)
    assert descs.shape == (2, 128, 512)
    # descriptors are unit-norm where valid
    m = np.asarray(kps.mask)
    n = np.linalg.norm(np.asarray(descs), axis=-1)
    assert np.allclose(n[m], 1.0, atol=1e-4)
    # keypoints land inside the image
    uv = np.asarray(kps.coordinates)[m]
    assert (uv >= 0).all() and (uv[:, 0] < 64).all() and (uv[:, 1] < 64).all()
