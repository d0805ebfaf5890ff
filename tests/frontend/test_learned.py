"""Shape/behavior tests for the learned front-end (random init — public
checkpoints convert via the load_torch_weights converters)."""

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.frontend.detectors.superpoint import (
    SuperPoint,
    SuperPointNet,
    SuperPointOptions,
)
from gtsfm_tpu.frontend.global_descriptors.descriptors import (
    NetVLADDescriptor,
    NetVLADOptions,
    TinyImageDescriptor,
)
from gtsfm_tpu.frontend.matchers.lightglue import LightGlueMatcher, LightGlueOptions


def test_superpoint_shapes_and_masks():
    sp = SuperPoint(SuperPointOptions(max_keypoints=256, detection_threshold=1e-6))
    imgs = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 64, 96)).astype(np.float32))
    kps, desc = sp(imgs)
    assert kps.coordinates.shape == (2, 256, 2)
    assert desc.shape == (2, 256, 256)
    c = np.asarray(kps.coordinates)
    m = np.asarray(kps.mask)
    assert m.any()
    assert (c[m][:, 0] < 96).all() and (c[m][:, 1] < 64).all()
    d = np.asarray(desc)[m]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)


def test_superpoint_torch_weight_conversion_roundtrip(tmp_path):
    torch = __import__("torch")
    # fabricate a state dict with the MagicLeap layer names/shapes
    shapes = {
        "conv1a": (64, 1, 3, 3), "conv1b": (64, 64, 3, 3),
        "conv2a": (64, 64, 3, 3), "conv2b": (64, 64, 3, 3),
        "conv3a": (128, 64, 3, 3), "conv3b": (128, 128, 3, 3),
        "conv4a": (128, 128, 3, 3), "conv4b": (128, 128, 3, 3),
        "convPa": (256, 128, 3, 3), "convPb": (65, 256, 1, 1),
        "convDa": (256, 128, 3, 3), "convDb": (256, 256, 1, 1),
    }
    sd = {}
    g = torch.Generator().manual_seed(0)
    for n, s in shapes.items():
        sd[f"{n}.weight"] = torch.randn(s, generator=g)
        sd[f"{n}.bias"] = torch.randn(s[0], generator=g)
    p = tmp_path / "sp.pth"
    torch.save(sd, p)
    from gtsfm_tpu.frontend.detectors.superpoint import load_torch_weights

    params = load_torch_weights(str(p))
    sp = SuperPoint(SuperPointOptions(max_keypoints=64), params=params)
    kps, desc = sp(jnp.zeros((1, 64, 64)) + 0.5)
    assert not np.any(np.isnan(np.asarray(desc)))
    # cross-check one layer against torch conv on the same input
    x = np.random.default_rng(1).uniform(size=(1, 1, 16, 16)).astype(np.float32)
    conv_t = torch.nn.Conv2d(1, 64, 3, padding=1)
    conv_t.weight.data = sd["conv1a.weight"]
    conv_t.bias.data = sd["conv1a.bias"]
    out_t = conv_t(torch.from_numpy(x)).detach().numpy()
    net = SuperPointNet()
    out_j = jax.nn.relu(
        jax.lax.conv_general_dilated(
            jnp.asarray(x).transpose(0, 2, 3, 1),
            params["conv1a"]["kernel"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params["conv1a"]["bias"]
    )
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), np.maximum(out_t, 0), atol=1e-4
    )


def test_lightglue_matches_identical_descriptors():
    opts = LightGlueOptions(dim=64, num_layers=2, num_heads=2, match_threshold=0.0)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(32, 64)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    coords = rng.uniform(0, 100, (32, 2)).astype(np.float32)
    m = LightGlueMatcher(opts, example_dim=64)
    idx, ok, score = m.match(
        jnp.asarray(d), jnp.asarray(d), jnp.asarray(coords), jnp.asarray(coords),
        jnp.ones(32, bool), jnp.ones(32, bool), (100, 100),
    )
    # identical inputs through a symmetric net: each kp should match itself
    agree = (np.asarray(idx) == np.arange(32)) & np.asarray(ok)
    assert agree.mean() > 0.9


def test_lightglue_respects_masks():
    opts = LightGlueOptions(dim=64, num_layers=1, num_heads=2, match_threshold=0.0)
    rng = np.random.default_rng(1)
    d = rng.normal(size=(16, 64)).astype(np.float32)
    coords = rng.uniform(0, 50, (16, 2)).astype(np.float32)
    m = LightGlueMatcher(opts, example_dim=64)
    mask1 = np.ones(16, bool)
    mask1[5] = False
    idx, ok, _ = m.match(
        jnp.asarray(d), jnp.asarray(d), jnp.asarray(coords), jnp.asarray(coords),
        jnp.ones(16, bool), jnp.asarray(mask1), (50, 50),
    )
    assert not np.any(np.asarray(idx)[np.asarray(ok)] == 5)


def test_netvlad_descriptor_shapes():
    nv = NetVLADDescriptor(NetVLADOptions(num_clusters=8, encoder_dim=32, output_dim=128))
    imgs = np.random.default_rng(0).uniform(size=(3, 64, 64)).astype(np.float32)
    v = nv.describe_batch(imgs)
    assert v.shape == (3, 128)
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-4)


def test_tiny_image_descriptor_similarity():
    rng = np.random.default_rng(2)
    base = rng.uniform(size=(64, 64)).astype(np.float32)
    sim = base + 0.05 * rng.uniform(size=(64, 64)).astype(np.float32)
    diff = rng.uniform(size=(64, 64)).astype(np.float32)
    td = TinyImageDescriptor(res=16)
    v = td.describe_batch(np.stack([base, sim, diff]))
    s_sim = float(v[0] @ v[1])
    s_diff = float(v[0] @ v[2])
    assert s_sim > 0.9 and s_sim > s_diff + 0.3
