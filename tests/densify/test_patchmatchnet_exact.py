"""Exactness of the JAX PatchmatchNet port vs the reference torch model.

Methodology: run the PUBLIC torch implementation (mounted read-only at
/root/reference/thirdparty/patchmatchnet) with random weights and compare
the JAX forward numerically — layout-level verification so the official
model_000007.ckpt loads correctly. Skips when torch or the reference
checkout is unavailable.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_REF = "/root/reference"
if not os.path.isdir(os.path.join(_REF, "thirdparty", "patchmatchnet")):
    pytest.skip("reference patchmatchnet not available", allow_module_level=True)
sys.path.append(_REF)
try:
    from thirdparty.patchmatchnet.models.net import PatchmatchNet as TorchPMNet  # noqa: E402
finally:
    # the reference's regular 'tests' package would otherwise shadow this
    # repo's namespace 'tests' package
    sys.path.remove(_REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gtsfm_tpu.densify.patchmatchnet import (  # noqa: E402
    convert_torch_state_dict,
    feature_net,
    patchmatchnet_forward,
)


def _make_inputs(V=3, H=64, W=80, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.uniform(0, 1, (1, V, 3, H, W)).astype(np.float32)
    # simple camera set: identity ref, slightly translated sources
    projs = {}
    for k, scale in (("stage_0", 1.0), ("stage_1", 0.5), ("stage_2", 0.25), ("stage_3", 0.125)):
        K = np.array([
            [W * scale, 0, W * scale / 2],
            [0, W * scale, H * scale / 2],
            [0, 0, 1],
        ], np.float32)
        mats = []
        for v in range(V):
            E = np.eye(4, dtype=np.float32)
            E[0, 3] = 0.08 * v  # baseline
            P = np.eye(4, dtype=np.float32)
            P[:3, :4] = K @ E[:3, :4]
            mats.append(P)
        projs[k] = np.stack(mats)[None]
    dmin = np.array([1.0], np.float32)
    dmax = np.array([4.0], np.float32)
    return imgs, projs, dmin, dmax


def test_feature_net_exact():
    torch.manual_seed(0)
    tnet = TorchPMNet().eval()
    for mod in tnet.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.uniform_(-0.2, 0.2)
            mod.running_var.uniform_(0.5, 2.0)
    params = convert_torch_state_dict(tnet.state_dict())
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (64, 80, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tnet.feature(torch.from_numpy(img.transpose(2, 0, 1)[None]))
    j_out = feature_net(params["feature"], jnp.asarray(img))
    for stage in (1, 2, 3):
        tv = t_out[f"stage_{stage}"].numpy()[0].transpose(1, 2, 0)
        jv = np.asarray(j_out[stage])
        err = np.abs(tv - jv).max()
        scale = np.abs(tv).max()
        assert err < 2e-4 * max(scale, 1.0), f"stage {stage}: {err} vs {scale}"


def test_patchmatchnet_full_forward_close():
    """Full forward A/B. The stage-3 random depth initialization differs
    between frameworks, so we fix it: run torch, capture its depth range
    behaviour via a fixed uniform seed is impossible — instead both runs
    use a DETERMINISTIC initialization by monkeypatching torch's rand and
    jax's uniform to the same low-discrepancy values."""
    torch.manual_seed(0)
    tnet = TorchPMNet().eval()
    for mod in tnet.modules():
        if isinstance(mod, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
            mod.running_mean.uniform_(-0.2, 0.2)
            mod.running_var.uniform_(0.5, 2.0)
    params = convert_torch_state_dict(tnet.state_dict())

    imgs, projs, dmin, dmax = _make_inputs()

    # deterministic 0.5 "random" for both implementations
    real_rand = torch.rand

    def fake_rand(*args, **kwargs):
        size = kwargs.get("size")
        if size is None and args and isinstance(args[0], (tuple, torch.Size)):
            size = args[0]
        if size is None:
            return real_rand(*args, **kwargs)
        return torch.full(size, 0.5, device=kwargs.get("device"))

    torch.rand = fake_rand
    try:
        with torch.no_grad():
            t_out = tnet(
                {k: torch.from_numpy(imgs * s if False else _scaled(imgs, k)) for k, s in
                 (("stage_0", 1), ("stage_1", 1), ("stage_2", 1), ("stage_3", 1))},
                {k: torch.from_numpy(v) for k, v in projs.items()},
                torch.from_numpy(dmin), torch.from_numpy(dmax),
            )
    finally:
        torch.rand = real_rand
    t_depth = t_out["refined_depth"]["stage_0"].numpy()[0, 0]
    t_conf = t_out["photometric_confidence"].numpy()[0]

    import gtsfm_tpu.densify.patchmatchnet as pm

    real_uniform = jax.random.uniform
    try:
        jax.random.uniform = lambda key, shape, **kw: jnp.full(shape, 0.5)
        j_out = pm.patchmatchnet_forward.__wrapped__(
            params,
            jnp.asarray(imgs[0].transpose(0, 2, 3, 1)),
            jnp.asarray(projs["stage_1"][0]),
            jnp.asarray(projs["stage_2"][0]),
            jnp.asarray(projs["stage_3"][0]),
            jnp.float32(dmin[0]), jnp.float32(dmax[0]),
            jax.random.PRNGKey(0),
        )
    finally:
        jax.random.uniform = real_uniform

    j_depth = np.asarray(j_out.depth)
    j_conf = np.asarray(j_out.confidence)
    rel = np.abs(j_depth - t_depth) / np.maximum(t_depth, 1e-3)
    assert np.median(rel) < 5e-3, float(np.median(rel))
    assert np.mean(np.abs(j_conf - t_conf)) < 2e-2


def _scaled(imgs, key):
    """Torch model reads per-stage image pyramids; build them by
    average-pool downsampling like the reference dataset adapter."""
    import torch.nn.functional as F

    t = torch.from_numpy(imgs)  # (1, V, 3, H, W)
    factor = {"stage_0": 1, "stage_1": 2, "stage_2": 4, "stage_3": 8}[key]
    if factor == 1:
        return imgs
    B, V, C, H, W = t.shape
    out = F.interpolate(
        t.view(B * V, C, H, W), scale_factor=1.0 / factor, mode="bilinear",
        align_corners=False,
    )
    return out.view(B, V, C, H // factor, W // factor).numpy()


def test_patchmatchnet_mvs_backend():
    """PatchmatchNetMVS runs the full MVS contract (depths + fusion) on a
    small synthetic scene with converted (random) weights."""
    torch.manual_seed(1)
    tnet = TorchPMNet().eval()
    params = convert_torch_state_dict(tnet.state_dict())

    from gtsfm_tpu.densify.mvs import MVSOptions
    from gtsfm_tpu.densify.patchmatchnet import PatchmatchNetMVS
    from tests.common.test_sfm_data import make_synthetic_scene

    data = make_synthetic_scene(n_cams=4, n_tracks=60)
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (4, 48, 64)).astype(np.float32)
    mvs = PatchmatchNetMVS(MVSOptions(num_source_views=2), params=params)
    pts, cols, metrics = mvs.run(data, images)
    assert metrics["num_views_with_depth"] >= 2
    assert pts.shape[1] == 3 if len(pts) else True
