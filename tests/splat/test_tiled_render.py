"""Tile-binned rasterizer vs the brute-force reference renderer."""

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import SE3
from gtsfm_tpu.splat.gs_data import GSData
from gtsfm_tpu.splat.rendering import render, render_tiled


def _scene(G=400, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-2, 2, (G, 3)).astype(np.float32)
    means[:, 2] += 6
    return GSData(
        means=jnp.asarray(means),
        log_scales=jnp.asarray(
            np.log(rng.uniform(0.02, 0.12, (G, 3))).astype(np.float32)
        ),
        quats=jnp.asarray(np.tile([1, 0, 0, 0.0], (G, 1)).astype(np.float32)),
        colors=jnp.asarray(rng.normal(0, 1, (G, 3)).astype(np.float32)),
        opacity_logit=jnp.asarray(rng.normal(0, 1, G).astype(np.float32)),
        alive=jnp.ones(G, jnp.float32),
    )


_K = jnp.asarray([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]])


def test_tiled_matches_brute():
    gs = _scene()
    wTc = SE3.identity(())
    img_b, a_b = render(gs, wTc, _K, 240, 320)
    # cap >= G and a dup budget covering every footprint: binning is then
    # lossless and the tiled result matches the brute reference exactly
    img_t, a_t = render_tiled(gs, wTc, _K, 240, 320, per_tile_cap=512, max_dup=64)
    assert float(jnp.max(jnp.abs(img_b - img_t))) < 1e-3
    assert float(jnp.max(jnp.abs(a_b - a_t))) < 1e-3
    # the default dup budget truncates only low-alpha halo tails
    img_d, _ = render_tiled(gs, wTc, _K, 240, 320, per_tile_cap=512)
    assert float(jnp.mean(jnp.abs(img_b - img_d))) < 1e-3


def test_tiled_truncation_degrades_gracefully():
    gs = _scene()
    wTc = SE3.identity(())
    img_full, _ = render_tiled(gs, wTc, _K, 240, 320, per_tile_cap=512)
    img_cap, _ = render_tiled(gs, wTc, _K, 240, 320, per_tile_cap=64)
    # capped render keeps the front-most gaussians: mean error stays small
    assert float(jnp.mean(jnp.abs(img_full - img_cap))) < 5e-2


def test_tiled_gradients_finite():
    gs = _scene(G=128)
    wTc = SE3.identity(())

    def loss(means, colors):
        img, _ = render_tiled(
            gs.replace(means=means, colors=colors), wTc, _K, 64, 64,
            per_tile_cap=128,
        )
        return jnp.sum(img**2)

    gm, gc = jax.grad(loss, argnums=(0, 1))(gs.means, gs.colors)
    assert bool(jnp.all(jnp.isfinite(gm))) and bool(jnp.all(jnp.isfinite(gc)))
    assert float(jnp.linalg.norm(gm)) > 0


def test_tiled_nonsquare_and_offsets():
    """Odd image sizes exercise the partial-tile crop path."""
    gs = _scene(G=200, seed=3)
    wTc = SE3.identity(())
    img, alpha = render_tiled(gs, wTc, _K, 233, 317)
    assert img.shape == (233, 317, 3)
    assert alpha.shape == (233, 317)
    assert bool(jnp.all(jnp.isfinite(img)))


def test_pallas_composite_matches_xla():
    """The Pallas per-tile compositing kernel (interpret mode on CPU;
    compiled on real TPU) matches the XLA scan formulation that also backs
    its custom VJP."""
    import jax.numpy as jnp

    from gtsfm_tpu.splat.rendering import (
        _composite_tiles_pallas,
        _composite_tiles_xla,
    )

    rng = np.random.default_rng(0)
    n_tiles, cap, tile = 6, 64, 16
    t_xy = jnp.asarray(rng.uniform(0, 64, (n_tiles, cap, 2)).astype(np.float32))
    t_a = jnp.asarray(rng.uniform(0, 0.9, (n_tiles, cap)).astype(np.float32))
    t_rgb = jnp.asarray(rng.uniform(0, 1, (n_tiles, cap, 3)).astype(np.float32))
    i00 = jnp.asarray(rng.uniform(0.01, 0.3, (n_tiles, cap)).astype(np.float32))
    i01 = jnp.asarray(rng.uniform(-0.05, 0.05, (n_tiles, cap)).astype(np.float32))
    i11 = jnp.asarray(rng.uniform(0.01, 0.3, (n_tiles, cap)).astype(np.float32))
    org = jnp.asarray((rng.integers(0, 3, (n_tiles, 2)) * 16).astype(np.int32))
    c_x, T_x = _composite_tiles_xla(t_xy, t_a, t_rgb, i00, i01, i11, org, tile)
    c_p, T_p = _composite_tiles_pallas(
        t_xy, t_a, t_rgb, i00, i01, i11, org, tile, interpret=True
    )
    # early termination may skip sub-1/255-transmittance tails
    assert float(jnp.abs(c_x - c_p).max()) < 5e-3
    assert float(jnp.abs(T_x - T_p).max()) < 5e-3

