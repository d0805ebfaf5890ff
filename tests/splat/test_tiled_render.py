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
    # the default 3x3 dup window truncates only low-alpha halo tails —
    # this scene's footprints reach 5 tiles across (radius up to ~32 px),
    # far larger than converged-reconstruction gaussians
    img_d, _ = render_tiled(gs, wTc, _K, 240, 320, per_tile_cap=512)
    assert float(jnp.mean(jnp.abs(img_b - img_d))) < 2e-3


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
        _gather_attrs_f32,
    )

    rng = np.random.default_rng(0)
    n_tiles, cap, tile = 6, 64, 16
    G = 300
    packed = jnp.asarray(
        np.stack(
            [
                rng.uniform(0, 64, G),  # x
                rng.uniform(0, 64, G),  # y
                rng.uniform(0, 0.9, G),  # alpha
                rng.uniform(0, 1, G),  # r
                rng.uniform(0, 1, G),  # g
                rng.uniform(0, 1, G),  # b
                rng.uniform(0.01, 0.3, G),  # i00
                rng.uniform(-0.05, 0.05, G),  # i01
                rng.uniform(0.01, 0.3, G),  # i11
            ],
            axis=-1,
        ).astype(np.float32)
    )
    gidx = jnp.asarray(rng.integers(0, G, (n_tiles, cap)).astype(np.int32))
    counts = jnp.asarray(rng.integers(5, cap, n_tiles).astype(np.int32))
    org = jnp.asarray((rng.integers(0, 3, (n_tiles, 2)) * 16).astype(np.int32))
    c_x, T_x = _composite_tiles_xla(
        *_gather_attrs_f32(packed, gidx, counts), org, tile
    )
    c_p, T_p = _composite_tiles_pallas(
        packed, gidx, counts, org, tile, interpret=True
    )
    # the kernel is EXACT vs the XLA scan evaluated on the same
    # bf16-quantized rgb/inv attributes it unpacks
    from gtsfm_tpu.splat.rendering import _pack2, _unpack2

    r, g = _unpack2(_pack2(packed[:, 3], packed[:, 4]))
    b, i00 = _unpack2(_pack2(packed[:, 5], packed[:, 6]))
    i01, i11 = _unpack2(_pack2(packed[:, 7], packed[:, 8]))
    quant = jnp.stack(
        [packed[:, 0], packed[:, 1], packed[:, 2], r, g, b, i00, i01, i11],
        axis=-1,
    )
    c_q, T_q = _composite_tiles_xla(
        *_gather_attrs_f32(quant, gidx, counts), org, tile
    )
    assert float(jnp.abs(c_q - c_p).max()) < 1e-5
    assert float(jnp.abs(T_q - T_p).max()) < 1e-5
    # and the quantization itself stays bounded even on this worst-case
    # scene (up to ~50 random high-alpha gaussians covering every pixel
    # of a tile — far denser overlap than any real reconstruction)
    assert float(jnp.abs(c_x - c_p).max()) < 5e-2
    assert float(jnp.abs(T_x - T_p).max()) < 5e-2


def test_bf16_pair_packing_roundtrip():
    """_pack2/_unpack2 round-trip to bf16 precision incl. negatives."""
    from gtsfm_tpu.splat.rendering import _pack2, _unpack2

    rng = np.random.default_rng(1)
    hi = jnp.asarray(rng.normal(0, 10, 4096).astype(np.float32))
    lo = jnp.asarray(rng.normal(0, 0.1, 4096).astype(np.float32))
    h2, l2 = _unpack2(_pack2(hi, lo))
    np.testing.assert_allclose(np.asarray(h2), np.asarray(hi), rtol=4e-3)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(lo), rtol=4e-3)
    # exact bf16 values survive exactly
    exact = jnp.asarray([1.0, -2.5, 0.0, 0.375], jnp.float32)
    h3, l3 = _unpack2(_pack2(exact, exact))
    np.testing.assert_array_equal(np.asarray(h3), np.asarray(exact))
    np.testing.assert_array_equal(np.asarray(l3), np.asarray(exact))

