"""AnySplat-class feed-forward gaussian predictor (explicit re-design over
the exact VGGT backbone — the public AnySplat source is not vendored in
the reference, so checkpoint exactness is not verifiable here; see
frontend/anysplat.py docstring)."""

import numpy as np

import jax
import jax.numpy as jnp

from gtsfm_tpu.frontend.anysplat import (
    AnySplatModel,
    AnySplatOptions,
    gaussian_means_as_tracks,
)
from gtsfm_tpu.frontend.vggt import VGGTOptions

_SMALL = VGGTOptions(
    embed_dim=64, depth=2, num_heads=4, dino_depth=2, dino_heads=4,
    dino_pretrain_grid=4, camera_trunk_depth=2, camera_iterations=2,
    dpt_features=32, dpt_out_channels=(16, 32, 64, 64),
    intermediate_layer_idx=(0, 0, 1, 1),
)


def test_anysplat_forward_produces_gaussian_field():
    rng = np.random.default_rng(0)
    model = AnySplatModel(
        _SMALL, splat_options=AnySplatOptions(max_gaussians=500, conf_threshold=0.0)
    )
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 56, 56, 3)).astype(np.float32))
    out = model.run(imgs)
    assert out["extrinsic"].shape == (2, 3, 4)
    assert out["intrinsic"].shape == (2, 3, 3)
    assert out["depth"].shape == (2, 56, 56)
    gs = out["gaussians"]
    n = gs.max_gaussians
    assert 1 <= n <= 500
    assert bool(jnp.all(jnp.isfinite(gs.means)))
    assert bool(jnp.all(jnp.isfinite(gs.log_scales)))
    # quats normalized
    q = np.asarray(gs.quats)
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
    # the gaussian field renders
    from gtsfm_tpu.geometry import SE3
    from gtsfm_tpu.splat.rendering import render_tiled

    K = jnp.asarray([[100.0, 0, 28], [0, 100.0, 28], [0, 0, 1]])
    img, alpha = render_tiled(gs, SE3.identity(()), K, 56, 56)
    assert bool(jnp.all(jnp.isfinite(img)))


def test_anysplat_shares_vggt_backbone():
    from gtsfm_tpu.frontend.vggt import VGGTModel

    vggt = VGGTModel(_SMALL, seed=3)
    model = AnySplatModel.from_vggt(vggt)
    # backbone params are the SAME objects (shared, not re-initialized)
    assert model.params["aggregator"] is vggt.params["aggregator"]
    assert "gaussian_head" in model.params
    assert "gaussian_head" not in vggt.params  # source model untouched


def test_gaussian_means_as_tracks_export():
    rng = np.random.default_rng(1)
    model = AnySplatModel(
        _SMALL, splat_options=AnySplatOptions(max_gaussians=200, conf_threshold=0.0)
    )
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 56, 56, 3)).astype(np.float32))
    gs = model.run(imgs)["gaussians"]
    pts, cols = gaussian_means_as_tracks(None, gs, max_points=50)
    assert pts.shape[0] == cols.shape[0] <= 50
    assert pts.dtype == np.float32 and cols.dtype == np.uint8


def test_anysplat_slot_through_scene_optimizer_helper():
    """The anysplat cluster-optimizer slot routes through the per-pixel
    gaussian head when the exact backbone is selected (cluster_anysplat.py
    parity) and through the depth lift otherwise."""
    from gtsfm_tpu.geometry import Cal3Bundler
    from gtsfm_tpu.scene.cluster_feedforward import (
        ClusterFeedforward,
        ClusterFeedforwardOptions,
    )
    from gtsfm_tpu.scene.scene_optimizer import SceneOptimizer

    rng = np.random.default_rng(2)
    B, H, W = 2, 56, 56
    images = rng.uniform(0, 1, (B, H, W)).astype(np.float32)
    cal = Cal3Bundler.create(
        jnp.full(B, 100.0), jnp.zeros(B), jnp.zeros(B),
        jnp.full(B, 28.0), jnp.full(B, 28.0),
    )
    ff_opts = ClusterFeedforwardOptions(
        backbone="vggt_exact", run_post_ba=False, conf_threshold=0.0
    )
    ff = ClusterFeedforward(ff_opts)
    data, _, (poses, depth, conf) = ff.run_raw(images, cal)
    gs = SceneOptimizer._feedforward_splats(
        ff, images, depth, conf, cal, data.poses, ff_opts
    )
    assert gs.max_gaussians >= 1
    assert bool(jnp.all(jnp.isfinite(gs.means)))
    # compact backbone falls back to the depth-unprojection lift
    ff2_opts = ClusterFeedforwardOptions(run_post_ba=False, conf_threshold=0.0)
    ff2 = ClusterFeedforward(ff2_opts)
    data2, _, (poses2, depth2, conf2) = ff2.run_raw(images, cal)
    gs2 = SceneOptimizer._feedforward_splats(
        ff2, images, depth2, conf2, cal, data2.poses, ff2_opts
    )
    assert gs2.max_gaussians >= 1


def test_anysplat_field_seeds_splat_trainer():
    """The feed-forward gaussian field is a valid splat-trainer init
    (cluster_anysplat -> splat refinement, the run_gs tail)."""
    from gtsfm_tpu.geometry import Cal3Bundler
    from gtsfm_tpu.scene.cluster_feedforward import (
        ClusterFeedforward,
        ClusterFeedforwardOptions,
    )
    from gtsfm_tpu.scene.scene_optimizer import SceneOptimizer
    from gtsfm_tpu.splat.gaussian_splatting import GaussianSplatting, GSTrainOptions

    rng = np.random.default_rng(4)
    B, H, W = 2, 56, 56
    images = rng.uniform(0, 1, (B, H, W)).astype(np.float32)
    cal = Cal3Bundler.create(
        jnp.full(B, 100.0), jnp.zeros(B), jnp.zeros(B),
        jnp.full(B, 28.0), jnp.full(B, 28.0),
    )
    ff_opts = ClusterFeedforwardOptions(
        backbone="vggt_exact", run_post_ba=False, conf_threshold=0.0
    )
    ff = ClusterFeedforward(ff_opts)
    data, _, (poses, depth, conf) = ff.run_raw(images, cal)
    gs0 = SceneOptimizer._feedforward_splats(
        ff, images, depth, conf, cal, data.poses, ff_opts
    )
    trainer = GaussianSplatting(GSTrainOptions(iterations=3))
    gs, metrics = trainer.train(data, images, gs_init=gs0)
    assert bool(jnp.all(jnp.isfinite(gs.means)))
    assert np.isfinite(metrics.get("final_loss", metrics.get("loss", 0.0)))
