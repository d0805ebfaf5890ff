import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.frontend.matchers.mutual_nn import match_descriptors, matches_to_pairs


def _normed(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_identical_descriptors_match():
    rng = np.random.default_rng(0)
    d = _normed(rng.normal(size=(30, 64)).astype(np.float32))
    perm = rng.permutation(30)
    idx, mask, score = match_descriptors(
        jnp.asarray(d), jnp.asarray(d[perm]), jnp.ones(30, bool), jnp.ones(30, bool),
        use_bf16=False,
    )
    idx = np.asarray(idx)
    assert np.asarray(mask).all()
    # matching should invert the permutation
    assert np.all(perm[idx] == np.arange(30))


def test_ratio_test_rejects_ambiguous():
    # query 0 is equidistant between two image-2 descriptors -> ambiguous
    rng = np.random.default_rng(1)
    d1 = _normed(rng.normal(size=(5, 32)).astype(np.float32))
    a = _normed(rng.normal(size=(1, 32)).astype(np.float32))
    b = _normed(rng.normal(size=(1, 32)).astype(np.float32))
    d1[0] = _normed(a + b)[0]  # halfway between a and b
    d2 = _normed(np.concatenate([d1[1:] + 0.01 * rng.normal(size=(4, 32)), a, b]).astype(np.float32))
    idx, mask, _ = match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), jnp.ones(5, bool), jnp.ones(6, bool),
        ratio=0.9, use_bf16=False,
    )
    mask = np.asarray(mask)
    assert not mask[0]  # ambiguous between a and b
    assert mask[1:].all()  # unambiguous near-duplicates match


def test_mask_respected():
    rng = np.random.default_rng(2)
    d = _normed(rng.normal(size=(10, 16)).astype(np.float32))
    m2 = np.ones(10, bool)
    m2[3] = False
    idx, mask, _ = match_descriptors(
        jnp.asarray(d), jnp.asarray(d), jnp.ones(10, bool), jnp.asarray(m2),
        ratio_test=False, use_bf16=False,
    )
    assert not np.asarray(mask)[3] or np.asarray(idx)[3] != 3


def test_matches_to_pairs_padding():
    idx = jnp.asarray([2, -1, 0, 1, -1], jnp.int32)
    mask = jnp.asarray([True, False, True, True, False])
    pairs, pmask = matches_to_pairs(idx, mask, max_matches=4)
    assert pairs.shape == (4, 2)
    assert int(pmask.sum()) == 3
    got = {tuple(p) for p, m in zip(np.asarray(pairs), np.asarray(pmask)) if m}
    assert got == {(0, 2), (2, 0), (3, 1)}


def test_bf16_path_close_to_f32():
    rng = np.random.default_rng(3)
    d1 = _normed(rng.normal(size=(100, 128)).astype(np.float32))
    d2 = _normed(rng.normal(size=(120, 128)).astype(np.float32))
    i32, m32, _ = match_descriptors(jnp.asarray(d1), jnp.asarray(d2), jnp.ones(100, bool), jnp.ones(120, bool), use_bf16=False)
    i16, m16, _ = match_descriptors(jnp.asarray(d1), jnp.asarray(d2), jnp.ones(100, bool), jnp.ones(120, bool), use_bf16=True)
    agree = (np.asarray(i32) == np.asarray(i16)) | (~np.asarray(m32) & ~np.asarray(m16))
    assert agree.mean() > 0.95
