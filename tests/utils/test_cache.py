import numpy as np

from gtsfm_tpu.utils.cache import DetectorCacher, DiskCache, content_key


def test_content_key_sensitivity():
    a = np.ones((4, 4), np.float32)
    b = np.ones((4, 4), np.float64)
    assert content_key(a) != content_key(b)  # dtype matters
    assert content_key(a) == content_key(a.copy())
    assert content_key(a, "x") != content_key(a, "y")


def test_disk_cache_roundtrip(tmp_path):
    c = DiskCache("test", root=str(tmp_path))
    assert c.get("k") is None
    c.put("k", {"a": np.arange(5)})
    out = c.get("k")
    np.testing.assert_array_equal(out["a"], np.arange(5))
    calls = []
    v = c.get_or_compute("k2", lambda: calls.append(1) or 42)
    v2 = c.get_or_compute("k2", lambda: calls.append(1) or 42)
    assert v == v2 == 42 and len(calls) == 1


def test_detector_cacher(tmp_path):
    import jax.numpy as jnp

    from gtsfm_tpu.frontend.detectors.dog_sift import DoGSift, DoGSiftOptions

    det = DoGSift(DoGSiftOptions(max_keypoints=64, num_octaves=2))
    calls = {"n": 0}
    orig = det.__call__

    class Counting:
        options = det.options

        def __call__(self, img):
            calls["n"] += 1
            return orig(img)

    cached = DetectorCacher(Counting(), root=str(tmp_path))
    img = jnp.asarray(np.random.default_rng(0).uniform(size=(96, 96)).astype(np.float32))
    k1, d1 = cached(img)
    k2, d2 = cached(img)
    assert calls["n"] == 1
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(k1.coordinates), np.asarray(k2.coordinates))


def test_two_view_cacher(tmp_path):
    import numpy as np

    from gtsfm_tpu.frontend.two_view_cacher import TwoViewEstimatorCacher

    calls = {"n": 0}

    def fake_run(pairs, kp_xy, kp_mask, descs, cal):
        calls["n"] += 1
        return {"valid": np.ones(len(pairs), bool)}

    c = TwoViewEstimatorCacher(fake_run, options_repr="test", root=str(tmp_path))
    pairs = np.array([[0, 1]], np.int32)
    kp = np.zeros((2, 8, 2), np.float32)
    km = np.ones((2, 8), bool)
    d = np.zeros((2, 8, 16), np.float32)
    r1 = c.run(pairs, kp, km, d, None)
    r2 = c.run(pairs, kp, km, d, None)
    assert calls["n"] == 1 and r2["valid"].all()
    # different content -> recompute
    c.run(pairs, kp + 1.0, km, d, None)
    assert calls["n"] == 2
