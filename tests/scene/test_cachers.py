"""Cacher-family completion (VERDICT r2 #9): matcher, global-descriptor
and whole-cluster caches replay on identical inputs — together with the
detector + two-view caches every expensive stage resumes from disk."""

import numpy as np


class _CountingMatcher:
    def __init__(self):
        self.calls = 0

    def match_batch(self, d0, d1, c0, c1, m0, m1, **kw):
        self.calls += 1
        K = d0.shape[1]
        idx = np.tile(np.arange(K, dtype=np.int32), (d0.shape[0], 1))
        ok = np.asarray(m0) & np.asarray(m1)
        return idx, ok, ok.astype(np.float32)


class _CountingDescriptor:
    def __init__(self):
        self.calls = 0

    def describe_batch(self, images):
        self.calls += 1
        imgs = np.asarray(images)
        return imgs.reshape(imgs.shape[0], -1)[:, :16].astype(np.float32)


def test_matcher_cacher_replays(tmp_path):
    from gtsfm_tpu.frontend.cachers import MatcherCacher

    rng = np.random.default_rng(0)
    inner = _CountingMatcher()
    m = MatcherCacher(inner, root=str(tmp_path))
    d = rng.normal(size=(2, 64, 32)).astype(np.float32)
    c = rng.normal(size=(2, 64, 2)).astype(np.float32)
    msk = np.ones((2, 64), bool)
    out1 = m.match_batch(d, d, c, c, msk, msk, image_size=(64, 64))
    out2 = m.match_batch(d, d, c, c, msk, msk, image_size=(64, 64))
    assert inner.calls == 1
    np.testing.assert_array_equal(out1[0], out2[0])
    # different content -> miss
    m.match_batch(d + 1, d, c, c, msk, msk, image_size=(64, 64))
    assert inner.calls == 2


def test_global_descriptor_cacher_replays(tmp_path):
    from gtsfm_tpu.frontend.cachers import GlobalDescriptorCacher

    rng = np.random.default_rng(1)
    inner = _CountingDescriptor()
    g = GlobalDescriptorCacher(inner, root=str(tmp_path))
    imgs = rng.uniform(size=(3, 32, 32)).astype(np.float32)
    a = g.describe_batch(imgs)
    b = g.describe_batch(imgs)
    assert inner.calls == 1
    np.testing.assert_array_equal(a, b)


def test_cluster_cache_replays(tmp_path):
    """Second hierarchical run replays every leaf from the cluster cache."""
    import jax

    from gtsfm_tpu.frontend.two_view import TwoViewOptions, run_two_view_batch
    from gtsfm_tpu.frontend.verifiers.essential import RansacOptions
    from gtsfm_tpu.scene.hierarchical import (
        HierarchicalOptions,
        HierarchicalReconstruction,
    )
    from gtsfm_tpu.utils.cache import DiskCache
    from tests.frontend.test_two_view import make_pair_batch

    n_cams = 10
    scene, pairs, batch = make_pair_batch(n_cams=n_cams, n_pts=200, desc_noise=0.01, seed=11)
    res = run_two_view_batch(
        **batch, key=jax.random.PRNGKey(0),
        opts=TwoViewOptions(ransac=RansacOptions(num_hypotheses=256)),
    )
    kp_xy = np.zeros((n_cams, 200, 2), np.float32)
    for e, (i, j) in enumerate(pairs):
        kp_xy[i] = np.asarray(batch["kp_xy1"][e])
        kp_xy[j] = np.asarray(batch["kp_xy2"][e])
    tvr = {
        "i2Ri1": np.asarray(res.i2Ri1), "i2Ui1": np.asarray(res.i2Ui1),
        "valid": np.asarray(res.valid), "num_inliers": np.asarray(res.num_inliers),
        "corr_i1": np.asarray(res.corr_i1), "corr_i2": np.asarray(res.corr_i2),
        "corr_mask": np.asarray(res.corr_mask),
    }
    cache = DiskCache("cluster", root=str(tmp_path))
    opts = HierarchicalOptions(max_depth=1, max_cluster_size=4)

    h1 = HierarchicalReconstruction(opts, cluster_cache=cache)
    d1, m1 = h1.run(n_cams, pairs, tvr, kp_xy, scene.cal)
    assert not any(c.get("cache_hit") for c in m1["cluster_metrics"])

    h2 = HierarchicalReconstruction(opts, cluster_cache=cache)
    d2, m2 = h2.run(n_cams, pairs, tvr, kp_xy, scene.cal)
    leaf_hits = [c for c in m2["cluster_metrics"] if c.get("cache_hit")]
    assert len(leaf_hits) == len(m2["cluster_metrics"]) > 0
    assert d2.number_tracks() == d1.number_tracks()
    np.testing.assert_allclose(
        np.asarray(d1.poses.t), np.asarray(d2.poses.t), atol=1e-5
    )
