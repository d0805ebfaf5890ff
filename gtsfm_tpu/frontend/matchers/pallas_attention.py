"""Fused multi-head attention Pallas kernel for the LightGlue matcher.

The unfused XLA attention materializes the (heads, K, K) score tensor in
HBM twice per attention (write after QK^T, read for softmax(S)V); at
K=1024 that is ~4 MB per head per op x 36 attention ops per LightGlue
forward — the matcher measures HBM-bound at ~3% MFU. This kernel keeps
the whole score tile in VMEM: one program per (head, query-tile) loads a
(TILE_Q, dh) query block plus the full K/V for its head (K=1024, dh=64
-> 256 KB each, far under the 16 MB VMEM budget), computes scores,
softmax, and the value contraction without touching HBM in between.

Used automatically by matchers.lightglue._attend for aligned shapes
(K % TILE_Q == 0) on TPU; unaligned/test shapes fall back to the XLA
path, and `interpret=True` runs the same kernel on CPU for unit tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Q = 128


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref):
    # q: (1, TILE_Q, dh); k, v: (1, Kk, dh); mask: (1, Kk) int32; all VMEM
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    dh = q.shape[-1]
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (1.0 / (dh**0.5))  # (TILE_Q, Kk)
    s = jnp.where(mask_ref[0][None, :] != 0, s, -1e9)
    p = jax.nn.softmax(s, axis=-1)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q, k, v, kv_mask=None, interpret: bool = False):
    """q: (h, Kq, dh), k/v: (h, Kk, dh), kv_mask: (Kk,) bool or None.
    Returns (h, Kq, dh) f32. Requires Kq % TILE_Q == 0."""
    h, Kq, dh = q.shape
    Kk = k.shape[1]
    if kv_mask is None:
        mask = jnp.ones((1, Kk), jnp.int32)
    else:
        mask = kv_mask.astype(jnp.int32)[None, :]
    # widest query tile whose score block still fits VMEM comfortably:
    # per-program bytes ~ TILE_Q*Kk*4 (scores, f32) + 2*Kk*dh*2 (K/V bf16)
    # + TILE_Q*dh*(2+4). Wider tiles amortize the K/V re-load across query
    # rows — at (1024, 1024, 64) one tile per head loads K/V ONCE (8x less
    # HBM than 128-row tiles; attention was the matcher's bandwidth floor).
    tile_q = TILE_Q
    while tile_q * 2 <= Kq and (tile_q * 2) * Kk * 4 <= 6 * 1024 * 1024:
        tile_q *= 2
    grid = (h, Kq // tile_q)
    return pl.pallas_call(
        _attn_kernel,
        out_shape=jax.ShapeDtypeStruct((h, Kq, dh), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_q, dh), lambda hi, qi: (hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kk, dh), lambda hi, qi: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kk, dh), lambda hi, qi: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kk), lambda hi, qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, dh), lambda hi, qi: (hi, qi, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * h * Kq * Kk * dh,
            bytes_accessed=4 * h * (Kq * dh * 2 + 2 * Kk * dh),
            transcendentals=h * Kq * Kk,
        ),
        interpret=interpret,
    )(q, k, v, mask)
