import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.frontend.correspondence import AggregatorOptions, KeypointAggregatorDedup
from gtsfm_tpu.frontend.matchers.dense_matcher import DenseImageMatcher, DenseMatcherOptions


def test_dense_matcher_identical_images():
    """On identical images, coarse cells should match to themselves."""
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(64, 96)).astype(np.float32)
    m = DenseImageMatcher(
        DenseMatcherOptions(dim=64, num_blocks=1, match_threshold=0.0, max_matches=128),
        example_hw=(64, 96),
    )
    uv1, uv2, score, mask = m.match_images(jnp.asarray(img), jnp.asarray(img))
    mk = np.asarray(mask)
    assert mk.sum() > 20
    d = np.linalg.norm(np.asarray(uv1)[mk] - np.asarray(uv2)[mk], axis=-1)
    assert np.median(d) < 1e-3  # self-matches


def test_dense_matcher_feeds_aggregator():
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(64, 64)).astype(np.float32)
    m = DenseImageMatcher(
        DenseMatcherOptions(dim=64, num_blocks=1, match_threshold=0.0, max_matches=64),
        example_hw=(64, 64),
    )
    uv1, uv2, score, mask = m.match_images(jnp.asarray(img), jnp.asarray(img))
    mk = np.asarray(mask)
    pair_corrs = {(0, 1): (np.asarray(uv1)[mk], np.asarray(uv2)[mk])}
    agg = KeypointAggregatorDedup(AggregatorOptions())
    kp, kmask, out = agg.aggregate(2, pair_corrs)
    assert kmask[0].sum() > 10
