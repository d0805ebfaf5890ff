"""Mutual nearest-neighbor descriptor matching with Lowe ratio test.

Parity: /root/reference/gtsfm/frontend/matcher/twoway_matcher.py (TwoWayMatcher:
OpenCV BFMatcher mutual-NN with optional ratio test).

TPU-first: the whole matcher is one (K1, D) x (D, K2) matmul (MXU) plus
row/col argmax — batched over pairs with vmap. Distances are computed from
dot products of L2-normalized descriptors, so the similarity matmul can run
in bf16 on the MXU with negligible matching-quality impact.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("ratio_test", "use_bf16"))
def match_descriptors(
    desc1: jnp.ndarray,
    desc2: jnp.ndarray,
    mask1: jnp.ndarray,
    mask2: jnp.ndarray,
    ratio: float = 0.8,
    ratio_test: bool = True,
    use_bf16: bool = True,
):
    """Mutual-NN matching.

    desc1: (K1, D), desc2: (K2, D) — assumed L2-normalized (SIFT-style);
    mask1/mask2: validity masks.
    Returns (match_idx int32 (K1,) — index into desc2 or -1,
             match_mask bool (K1,),
             scores f32 (K1,) — similarity of the match).
    """
    if use_bf16:
        sim = jnp.dot(
            desc1.astype(jnp.bfloat16), desc2.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
    else:
        sim = jnp.dot(desc1, desc2.T, precision=jax.lax.Precision.HIGHEST)
    neg = jnp.asarray(-1e9, sim.dtype)
    sim = jnp.where(mask1[:, None] & mask2[None, :], sim, neg)

    nn12 = jnp.argmax(sim, axis=1)  # (K1,)
    nn21 = jnp.argmax(sim, axis=0)  # (K2,)
    mutual = jnp.arange(desc1.shape[0]) == nn21[nn12]

    best = jnp.max(sim, axis=1)
    ok = mask1 & mutual & (best > -1e8)

    if ratio_test:
        # second-best similarity; ratio on L2 distances d^2 = 2 - 2 s
        sim_wo_best = sim.at[jnp.arange(desc1.shape[0]), nn12].set(neg)
        second = jnp.max(sim_wo_best, axis=1)
        d2_best = jnp.maximum(2.0 - 2.0 * best.astype(jnp.float32), 0.0)
        d2_second = jnp.maximum(2.0 - 2.0 * second.astype(jnp.float32), 1e-12)
        ok = ok & (d2_best < (ratio**2) * d2_second)

    match_idx = jnp.where(ok, nn12, -1).astype(jnp.int32)
    return match_idx, ok, best.astype(jnp.float32)


def matches_to_pairs(match_idx, match_mask, max_matches: int):
    """Convert per-keypoint match indices into a padded (M, 2) index pair
    array (i1_kp, i2_kp) + mask, jit-safe with static max_matches."""
    k1 = match_idx.shape[0]
    order = jnp.argsort(~match_mask)  # valid first, stable
    sel = order[:max_matches]
    pairs = jnp.stack([sel, match_idx[sel]], axis=-1)
    mask = match_mask[sel]
    pairs = jnp.where(mask[:, None], pairs, 0)
    return pairs.astype(jnp.int32), mask
