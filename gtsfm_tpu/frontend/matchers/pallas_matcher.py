"""Pallas TPU kernel: fused mutual-NN descriptor matching.

The plain matcher (mutual_nn.py) materializes the (K1, K2) similarity
matrix in HBM — 67 MB at K=4096 f32 — then reads it three times (row
argmax, masked second-best, column argmax). This kernel streams the
similarity computation tile-by-tile through VMEM, maintaining per-row
top-2 (value+index) and per-column best (value+index) accumulators, so
HBM traffic drops from O(K^2) to O(K*D + K): the op becomes MXU-bound
instead of HBM-bound. Same contract and semantics as
match_descriptors(..., ratio_test=True).

Mosaic notes: everything is kept 2D (1D vector reshapes/broadcasts do not
lower), masks ride as {0,1} float columns, and dynamic column offsets are
pl.multiple_of-annotated so vector loads prove alignment.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _matcher_kernel(d1_ref, d2_ref, m1_ref, m2_ref,
                    best_ref, second_ref, bidx_ref, colbest_ref, colidx_ref):
    """One row-block of desc1 against all column tiles of desc2.

    d1_ref: (TILE_M, D); d2_ref: (K2, D) resident in VMEM;
    m1_ref: (TILE_M, 1) f32; m2_ref: (K2//TILE_N, 1, TILE_N) f32.
    Outputs: best/second (TILE_M, 1) f32, bidx (TILE_M, 1) i32,
    colbest/colidx (8, K2) (8 identical sublane rows for tiling).
    """
    TILE_M, D = d1_ref.shape
    K2 = d2_ref.shape[0]
    TILE_N = 128

    d1 = d1_ref[:]
    m1 = m1_ref[:]  # (TILE_M, 1) in {0, 1}

    def body(j, carry):
        best, second, bidx = carry  # (TILE_M, 1) each
        off = pl.multiple_of(j * TILE_N, TILE_N)
        d2t = d2_ref[pl.ds(off, TILE_N), :]
        m2t = m2_ref[j]  # (1, TILE_N)
        sim = jnp.dot(d1, d2t.T, preferred_element_type=jnp.float32)  # MXU
        sim = sim + (m1 - 1.0) * 1e9 + (m2t - 1.0) * 1e9

        tmax = jnp.max(sim, axis=1, keepdims=True)  # (TILE_M, 1)
        targ = jnp.argmax(sim, axis=1).reshape(TILE_M, 1).astype(jnp.int32) + j * TILE_N
        col_iota = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1) + j * TILE_N
        sim_wo = jnp.where(col_iota == targ, NEG, sim)
        tsecond = jnp.max(sim_wo, axis=1, keepdims=True)

        new_best = jnp.maximum(best, tmax)
        new_bidx = jnp.where(tmax > best, targ, bidx)
        loser = jnp.minimum(best, tmax)
        new_second = jnp.maximum(jnp.maximum(second, tsecond), loser)

        # column-best for this row-block, accumulated in the output ref
        cmax = jnp.max(sim, axis=0, keepdims=True)  # (1, TILE_N)
        carg = jnp.argmax(sim, axis=0).reshape(1, TILE_N).astype(jnp.int32)
        old_cb = colbest_ref[:, pl.ds(off, TILE_N)]  # (8, TILE_N)
        upd_cb = jnp.maximum(old_cb, cmax)
        upd_ci = jnp.where(
            cmax > old_cb,
            jnp.broadcast_to(carg, old_cb.shape),
            colidx_ref[:, pl.ds(off, TILE_N)],
        )
        colbest_ref[:, pl.ds(off, TILE_N)] = upd_cb
        colidx_ref[:, pl.ds(off, TILE_N)] = upd_ci
        return new_best, new_second, new_bidx

    colbest_ref[:, :] = jnp.full(colbest_ref.shape, NEG, jnp.float32)
    colidx_ref[:, :] = jnp.zeros(colidx_ref.shape, jnp.int32)
    init = (
        jnp.full((TILE_M, 1), NEG, jnp.float32),
        jnp.full((TILE_M, 1), NEG, jnp.float32),
        jnp.zeros((TILE_M, 1), jnp.int32),
    )
    best, second, bidx = jax.lax.fori_loop(0, K2 // TILE_N, body, init)
    best_ref[:, :] = best
    second_ref[:, :] = second
    bidx_ref[:, :] = bidx


@partial(jax.jit, static_argnames=("ratio", "tile_m", "interpret"))
def pallas_match_descriptors(
    desc1: jnp.ndarray,
    desc2: jnp.ndarray,
    mask1: jnp.ndarray,
    mask2: jnp.ndarray,
    ratio: float = 0.8,
    tile_m: int = 256,
    interpret: bool = False,
):
    """Fused mutual-NN + ratio matching. desc1: (K1, D), desc2: (K2, D)
    L2-normalized; K1 % tile_m == 0, K2 % 128 == 0, D % 128 == 0
    (pad to comply — the pipeline's padded shapes already do).

    Returns (match_idx (K1,), match_mask (K1,), best_scores (K1,))."""
    K1, D = desc1.shape
    K2 = desc2.shape[0]
    assert K1 % tile_m == 0 and K2 % 128 == 0, (K1, K2)
    grid = (K1 // tile_m,)
    m1f = mask1.astype(jnp.float32).reshape(K1, 1)
    m2f = mask2.astype(jnp.float32).reshape(K2 // 128, 1, 128)

    best, second, bidx, colbest_blk, colidx_blk = pl.pallas_call(
        _matcher_kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((tile_m, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K2 // 128, 1, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, K2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, K2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K1, 1), jnp.float32),
            jax.ShapeDtypeStruct((K1, 1), jnp.float32),
            jax.ShapeDtypeStruct((K1, 1), jnp.int32),
            jax.ShapeDtypeStruct((grid[0] * 8, K2), jnp.float32),
            jax.ShapeDtypeStruct((grid[0] * 8, K2), jnp.int32),
        ],
    )(desc1, desc2, m1f, m2f)

    best = best[:, 0]
    second = second[:, 0]
    bidx = bidx[:, 0]
    # reduce column accumulators across row-blocks (per-block argmax is a
    # LOCAL row index; convert to global)
    colbest_blk = colbest_blk[::8]
    colidx_blk = colidx_blk[::8]
    blk = jnp.argmax(colbest_blk, axis=0)  # (K2,)
    col_loc = jnp.take_along_axis(colidx_blk, blk[None], axis=0)[0]
    nn21 = blk.astype(jnp.int32) * tile_m + col_loc

    mutual = jnp.arange(K1) == nn21[bidx]
    ok = mask1 & mutual & (best > NEG / 2)
    d2_best = jnp.maximum(2.0 - 2.0 * best, 0.0)
    d2_second = jnp.maximum(2.0 - 2.0 * second, 1e-12)
    ok = ok & (d2_best < (ratio**2) * d2_second)
    return jnp.where(ok, bidx, -1).astype(jnp.int32), ok, best
