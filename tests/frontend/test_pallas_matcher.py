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


def test_fused_cross_attention_matches_two_attends():
    """Bidirectional cross kernel (one shared score matmul) == two
    independent attention passes, including per-image masks."""
    import jax.numpy as jnp
    import numpy as np

    from gtsfm_tpu.frontend.matchers.pallas_attention import fused_cross_attention

    rng = np.random.default_rng(1)
    h, K0, K1, dh = 2, 256, 128, 64
    qk0 = jnp.asarray(rng.normal(size=(h, K0, dh)).astype(np.float32))
    qk1 = jnp.asarray(rng.normal(size=(h, K1, dh)).astype(np.float32))
    v0 = jnp.asarray(rng.normal(size=(h, K0, dh)).astype(np.float32))
    v1 = jnp.asarray(rng.normal(size=(h, K1, dh)).astype(np.float32))
    m0 = jnp.asarray(rng.random(K0) > 0.3)
    m1 = jnp.asarray(rng.random(K1) > 0.3)

    o0, o1 = fused_cross_attention(qk0, qk1, v0, v1, mask0=m0, mask1=m1,
                                   interpret=True)

    def ref_attend(q, k, v, kmask):
        s = np.einsum("hqd,hkd->hqk", np.asarray(q), np.asarray(k)) / np.sqrt(dh)
        s = np.where(np.asarray(kmask)[None, None, :], s, -1e9)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        return np.einsum("hqk,hkd->hqd", p, np.asarray(v))

    np.testing.assert_allclose(np.asarray(o0), ref_attend(qk0, qk1, v1, m1),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(o1), ref_attend(qk1, qk0, v0, m0),
                               rtol=2e-5, atol=2e-5)


def test_xla_cross_attend_matches_two_attends():
    """The shared-score XLA fallback in lightglue._cross_attend == two
    _attend calls."""
    import jax.numpy as jnp
    import numpy as np

    from gtsfm_tpu.frontend.matchers.lightglue import _attend, _cross_attend

    rng = np.random.default_rng(2)
    h, K0, K1, dh = 2, 96, 64, 32
    qk0 = jnp.asarray(rng.normal(size=(h, K0, dh)).astype(np.float32))
    qk1 = jnp.asarray(rng.normal(size=(h, K1, dh)).astype(np.float32))
    v0 = jnp.asarray(rng.normal(size=(h, K0, dh)).astype(np.float32))
    v1 = jnp.asarray(rng.normal(size=(h, K1, dh)).astype(np.float32))
    m0 = jnp.asarray(rng.random(K0) > 0.25)
    m1 = jnp.asarray(rng.random(K1) > 0.25)

    o0, o1 = _cross_attend(qk0, qk1, v0, v1, mask0=m0, mask1=m1)
    w0 = _attend(qk0, qk1, v1, kv_mask=m1)
    w1 = _attend(qk1, qk0, v0, kv_mask=m0)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(w0), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(w1), rtol=2e-5, atol=2e-5)


def test_fused_attention_merged_matches_per_head():
    """Merged-layout kernel (heads in column slices) == per-head reference."""
    import jax.numpy as jnp
    import numpy as np

    from gtsfm_tpu.frontend.matchers.pallas_attention import fused_attention_merged

    rng = np.random.default_rng(3)
    h, Kq, Kk, dh = 4, 256, 128, 16
    D = h * dh
    q = jnp.asarray(rng.normal(size=(Kq, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(Kk, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(Kk, D)).astype(np.float32))
    m = jnp.asarray(rng.random(Kk) > 0.3)

    got = np.asarray(fused_attention_merged(q, k, v, heads=h, kv_mask=m,
                                            interpret=True))
    for hi in range(h):
        sl = slice(hi * dh, (hi + 1) * dh)
        s = np.asarray(q)[:, sl] @ np.asarray(k)[:, sl].T / np.sqrt(dh)
        s = np.where(np.asarray(m)[None, :], s, -1e9)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want = p @ np.asarray(v)[:, sl]
        np.testing.assert_allclose(got[:, sl], want, rtol=2e-5, atol=2e-5)


def test_fused_cross_attention_merged_matches_two_attends():
    """Merged bidirectional cross kernel == two independent attention
    passes on the split-head layout, including per-image masks."""
    import jax.numpy as jnp
    import numpy as np

    from gtsfm_tpu.frontend.matchers.pallas_attention import (
        fused_cross_attention_merged,
    )

    rng = np.random.default_rng(4)
    h, K0, K1, dh = 2, 256, 128, 32
    D = h * dh
    qk0 = jnp.asarray(rng.normal(size=(K0, D)).astype(np.float32))
    qk1 = jnp.asarray(rng.normal(size=(K1, D)).astype(np.float32))
    v0 = jnp.asarray(rng.normal(size=(K0, D)).astype(np.float32))
    v1 = jnp.asarray(rng.normal(size=(K1, D)).astype(np.float32))
    m0 = jnp.asarray(rng.random(K0) > 0.3)
    m1 = jnp.asarray(rng.random(K1) > 0.3)

    o0, o1 = fused_cross_attention_merged(qk0, qk1, v0, v1, heads=h,
                                          mask0=m0, mask1=m1, interpret=True)

    def ref(qa, kb, vb, mb):
        out = np.zeros_like(np.asarray(qa))
        for hi in range(h):
            sl = slice(hi * dh, (hi + 1) * dh)
            s = np.asarray(qa)[:, sl] @ np.asarray(kb)[:, sl].T / np.sqrt(dh)
            s = np.where(np.asarray(mb)[None, :], s, -1e9)
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            out[:, sl] = p @ np.asarray(vb)[:, sl]
        return out

    np.testing.assert_allclose(np.asarray(o0), ref(qk0, qk1, v1, m1),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(o1), ref(qk1, qk0, v0, m0),
                               rtol=2e-5, atol=2e-5)
