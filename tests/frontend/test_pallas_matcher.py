"""Pallas fused matcher vs the reference XLA matcher (interpret mode on
CPU; the compiled path runs on real TPU — exercised by bench/TPU drives)."""

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.frontend.matchers.mutual_nn import match_descriptors
from gtsfm_tpu.frontend.matchers.pallas_matcher import pallas_match_descriptors


def _normed(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_pallas_matches_reference_impl():
    rng = np.random.default_rng(0)
    K, D = 512, 128
    d1 = _normed(rng.normal(size=(K, D)).astype(np.float32))
    # half of d2 are noisy copies of d1 (real matches), half random
    d2 = np.concatenate([
        _normed(d1[: K // 2] + 0.05 * rng.normal(size=(K // 2, D)).astype(np.float32)),
        _normed(rng.normal(size=(K // 2, D)).astype(np.float32)),
    ])
    perm = rng.permutation(K)
    d2 = d2[perm]
    m1 = np.ones(K, bool)
    m2 = np.ones(K, bool)
    m2[perm[7]] = False  # mask one target

    i_ref, ok_ref, s_ref = match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1), jnp.asarray(m2),
        use_bf16=False,
    )
    i_pl, ok_pl, s_pl = pallas_match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1), jnp.asarray(m2),
        tile_m=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(ok_pl))
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_pl))
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_pl), atol=1e-5)


def test_pallas_all_masked():
    K, D = 256, 128
    d = jnp.zeros((K, D))
    idx, ok, _ = pallas_match_descriptors(
        d, d, jnp.zeros(K, bool), jnp.zeros(K, bool), tile_m=128, interpret=True
    )
    assert not np.asarray(ok).any()


def test_fused_attention_matches_xla_reference():
    """Pallas fused attention (interpret mode on CPU) == the XLA einsum
    attention path, including kv masking."""
    import jax.numpy as jnp
    import numpy as np

    from gtsfm_tpu.frontend.matchers.pallas_attention import fused_attention

    rng = np.random.default_rng(0)
    h, K, dh = 2, 256, 64
    q = jnp.asarray(rng.normal(size=(h, K, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(h, K, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(h, K, dh)).astype(np.float32))
    mask = jnp.asarray(rng.random(K) > 0.3)

    got = np.asarray(fused_attention(q, k, v, kv_mask=mask, interpret=True))

    s = np.einsum("hqd,hkd->hqk", np.asarray(q), np.asarray(k)) / np.sqrt(dh)
    s = np.where(np.asarray(mask)[None, None, :], s, -1e9)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("hqk,hkd->hqd", p, np.asarray(v))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
