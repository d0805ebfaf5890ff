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
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # cast to the output dtype INSIDE the kernel (VMEM) — emitting bf16
    # halves the HBM write and kills the separate convert pass XLA would
    # otherwise run before the next bf16 matmul (measured ~0.7 ms/iter of
    # pure convert/copy fusions in the LightGlue trace).
    o_ref[0] = o.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q, k, v, kv_mask=None, interpret: bool = False):
    """q: (h, Kq, dh), k/v: (h, Kk, dh), kv_mask: (Kk,) bool or None.
    Returns (h, Kq, dh) in q's dtype (bf16 in -> bf16 out; softmax and both
    matmul accumulations stay f32 in VMEM). Requires Kq % TILE_Q == 0."""
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
        out_shape=jax.ShapeDtypeStruct((h, Kq, dh), q.dtype),
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


def _cross_kernel(qk0_ref, qk1_ref, v0_ref, v1_ref, m0_ref, m1_ref,
                  o0_ref, o1_ref):
    # qk0: (1, K0, dh), qk1: (1, K1, dh), v0: (1, K0, dh), v1: (1, K1, dh)
    qk0 = qk0_ref[0]
    qk1 = qk1_ref[0]
    dh = qk0.shape[-1]
    s = jax.lax.dot_general(
        qk0, qk1,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (1.0 / (dh**0.5))  # (K0, K1) f32, the SHARED similarity matrix
    # direction 0 -> 1: queries are image-0 rows, keys masked by mask1
    p0 = jax.nn.softmax(jnp.where(m1_ref[0][None, :] != 0, s, -1e9), axis=-1)
    o0_ref[0] = jax.lax.dot_general(
        p0.astype(v1_ref.dtype), v1_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o0_ref.dtype)
    # direction 1 -> 0: queries are image-1 COLUMNS of the same s, keys
    # masked by mask0 (rows); softmax down axis 0, contract rows with v0
    p1 = jax.nn.softmax(jnp.where(m0_ref[0][:, None] != 0, s, -1e9), axis=0)
    o1_ref[0] = jax.lax.dot_general(
        p1.astype(v0_ref.dtype), v0_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o1_ref.dtype)


def _attn_kernel_2d(q_ref, k_ref, v_ref, mask_ref, o_ref, *, dh: int):
    # q: (TILE_Q, 2*dh), k/v: (Kk, 2*dh), mask: (1, Kk); one program per
    # (head-PAIR, query-tile) — each program owns a 128-lane COLUMN block
    # of the merged (K, heads*dh) array holding TWO heads (Mosaic requires
    # block widths divisible by 128; dh=64), selected by the BlockSpec
    # index_map, so the (h, K, dh) transpose never materializes in HBM
    # (those transposes measured ~10% of the matcher's device time).
    valid = mask_ref[0][None, :] != 0
    scale = 1.0 / (dh**0.5)
    for sub in range(2):
        sl = slice(sub * dh, (sub + 1) * dh)
        s = jax.lax.dot_general(
            q_ref[:, sl], k_ref[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (TILE_Q, Kk)
        p = jax.nn.softmax(jnp.where(valid, s, -1e9), axis=-1)
        o_ref[:, sl] = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


# NOTE: not jax.jit-wrapped — the callers are always under an outer jit.
def fused_attention_merged(q, k, v, heads: int, kv_mask=None,
                           interpret: bool = False):
    """Multi-head attention on MERGED layout: q (Kq, heads*dh), k/v
    (Kk, heads*dh), heads in column slices (two heads per program to make
    the column block 128 lanes wide). Returns (Kq, heads*dh) in q's dtype
    (softmax and matmul accumulations in f32 in VMEM). Requires
    Kq % TILE_Q == 0, heads even, and 2*dh % 128 == 0."""
    Kq, D = q.shape
    Kk = k.shape[0]
    dh = D // heads
    if kv_mask is None:
        mask = jnp.ones((1, Kk), jnp.int32)
    else:
        mask = kv_mask.astype(jnp.int32)[None, :]
    # moderate tile: the kernel body unrolls two (tile_q, Kk) f32 score
    # softmaxes, and Mosaic compile time grows superlinearly with the
    # per-program vector footprint (a 1024-row 2-head body took >590 s)
    tile_q = TILE_Q
    while tile_q * 2 <= min(Kq, 256) and (tile_q * 2) * Kk * 4 <= 4 * 1024 * 1024:
        tile_q *= 2
    # query-tile is the FASTEST grid dim, so the K/V column blocks (index
    # constant in qi) are DMA'd once per head-pair, not once per tile
    return pl.pallas_call(
        partial(_attn_kernel_2d, dh=dh),
        out_shape=jax.ShapeDtypeStruct((Kq, D), q.dtype),
        grid=(heads // 2, Kq // tile_q),
        in_specs=[
            pl.BlockSpec((tile_q, 2 * dh), lambda gi, qi: (qi, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kk, 2 * dh), lambda gi, qi: (0, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kk, 2 * dh), lambda gi, qi: (0, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kk), lambda gi, qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_q, 2 * dh), lambda gi, qi: (qi, gi),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Kq * Kk * D,
            bytes_accessed=4 * (Kq * D * 2 + 2 * Kk * D),
            transcendentals=heads * Kq * Kk,
        ),
        interpret=interpret,
    )(q, k, v, mask)


@partial(jax.jit, static_argnames=("interpret",))
def fused_cross_attention(qk0, qk1, v0, v1, mask0=None, mask1=None,
                          interpret: bool = False):
    """Bidirectional cross attention sharing ONE score matmul (the official
    LightGlue trick: S10 = S01^T). qk0/v0: (h, K0, dh), qk1/v1: (h, K1, dh).
    Returns (o0 (h, K0, dh), o1 (h, K1, dh)) in the input dtype. One program
    per head holds the full (K0, K1) f32 score tile in VMEM, row-softmaxes
    it for 0->1 and column-softmaxes the SAME tile for 1->0 — one score
    matmul and one K/V load instead of two of each (measured: cross blocks
    are half the matcher's attention time)."""
    h, K0, dh = qk0.shape
    K1 = qk1.shape[1]
    m0 = (jnp.ones((1, K0), jnp.int32) if mask0 is None
          else mask0.astype(jnp.int32)[None, :])
    m1 = (jnp.ones((1, K1), jnp.int32) if mask1 is None
          else mask1.astype(jnp.int32)[None, :])
    return pl.pallas_call(
        _cross_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((h, K0, dh), qk0.dtype),
            jax.ShapeDtypeStruct((h, K1, dh), qk1.dtype),
        ),
        grid=(h,),
        in_specs=[
            pl.BlockSpec((1, K0, dh), lambda hi: (hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K1, dh), lambda hi: (hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K0, dh), lambda hi: (hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K1, dh), lambda hi: (hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K0), lambda hi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K1), lambda hi: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, K0, dh), lambda hi: (hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K1, dh), lambda hi: (hi, 0, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * h * K0 * K1 * dh,
            bytes_accessed=2 * h * dh * (2 * K0 + 2 * K1) + 4 * h * dh * (K0 + K1),
            transcendentals=2 * h * K0 * K1,
        ),
        interpret=interpret,
    )(qk0, qk1, v0, v1, m0, m1)


def fused_cross_attention_merged(qk0, qk1, v0, v1, heads: int,
                                 mask0=None, mask1=None,
                                 interpret: bool = False):
    """Bidirectional cross attention on MERGED layout: qk0/v0 (K0, D),
    qk1/v1 (K1, D), D = heads * dh. Returns (o0 (K0, D), o1 (K1, D)) in
    the input dtype. Two calls of the SAME merged attention kernel — the
    transposed score is recomputed on the MXU (537 MFLOP at K=1024)
    rather than column-softmaxed + axis-0-contracted from a shared tile,
    which Mosaic lowers to VPU shuffles that cost more than the extra
    matmul (measured: shared-tile variant ran at 55 TFLOP/s)."""
    o0 = fused_attention_merged(qk0, qk1, v1, heads, kv_mask=mask1,
                                interpret=interpret)
    o1 = fused_attention_merged(qk1, qk0, v0, heads, kv_mask=mask0,
                                interpret=interpret)
    return o0, o1
