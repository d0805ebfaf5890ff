import numpy as np
import pytest

from gtsfm_tpu.tracks import dsf


def _simple_inputs():
    """3 images, keypoints 0..3 each; matches chain kp0 across all images,
    kp1 between images 0-1 only."""
    pair_indices = np.array([[0, 1], [1, 2], [0, 2]], np.int32)
    M = 4
    corr_i1 = np.zeros((3, M), np.int32)
    corr_i2 = np.zeros((3, M), np.int32)
    corr_mask = np.zeros((3, M), bool)
    # pair (0,1): kp0<->kp0, kp1<->kp1
    corr_i1[0, :2] = [0, 1]
    corr_i2[0, :2] = [0, 1]
    corr_mask[0, :2] = True
    # pair (1,2): kp0<->kp0
    corr_i1[1, 0] = 0
    corr_i2[1, 0] = 0
    corr_mask[1, 0] = True
    # pair (0,2): kp0<->kp0
    corr_i1[2, 0] = 0
    corr_i2[2, 0] = 0
    corr_mask[2, 0] = True
    kxy = np.arange(3 * 4 * 2, dtype=np.float32).reshape(3, 4, 2)
    return pair_indices, corr_i1, corr_i2, corr_mask, kxy


def test_basic_tracks():
    pi, c1, c2, cm, kxy = _simple_inputs()
    cam, kp, uv, mask = dsf.tracks_from_matches(pi, c1, c2, cm, kxy)
    lengths = mask.sum(axis=1)
    assert sorted(lengths.tolist()) == [2, 3]
    # the 3-track must span images {0,1,2} at kp 0
    j3 = int(np.argmax(lengths))
    assert set(cam[j3][mask[j3]].tolist()) == {0, 1, 2}
    assert np.all(kp[j3][mask[j3]] == 0)
    # uv values gathered correctly
    np.testing.assert_array_equal(uv[j3][mask[j3]][0], kxy[cam[j3][mask[j3]][0], 0])


def test_inconsistent_track_dropped():
    # kp0 and kp1 of image 0 both match kp0 of image 1 -> merged track would
    # contain image 0 twice -> dropped
    pair_indices = np.array([[0, 1]], np.int32)
    corr_i1 = np.array([[0, 1]], np.int32)
    corr_i2 = np.array([[0, 0]], np.int32)
    corr_mask = np.ones((1, 2), bool)
    kxy = np.zeros((2, 4, 2), np.float32)
    cam, kp, uv, mask = dsf.tracks_from_matches(pair_indices, corr_i1, corr_i2, corr_mask, kxy)
    assert mask.sum() == 0


def test_min_track_len():
    pi, c1, c2, cm, kxy = _simple_inputs()
    cam, kp, uv, mask = dsf.tracks_from_matches(pi, c1, c2, cm, kxy, min_track_len=3)
    lengths = mask.sum(axis=1)
    assert (lengths[lengths > 0] >= 3).all()


def test_native_matches_numpy():
    rng = np.random.default_rng(0)
    n = 500
    a = rng.integers(0, n, 800)
    b = rng.integers(0, n, 800)
    r_np = dsf._union_find_numpy(a, b, n)
    lib = dsf._native_lib()
    if not lib:
        pytest.skip("native DSF not built")
    r_cc = dsf._union_find(a, b, n)
    # same partition (root labels may differ): compare canonical labeling
    def canon(r):
        _, inv = np.unique(r, return_inverse=True)
        return inv
    # two elements same group in one <=> same in other
    ca, cb = canon(r_np), canon(r_cc)
    import collections
    map_ab = {}
    for x, y in zip(ca, cb):
        assert map_ab.setdefault(x, y) == y


def test_large_random_consistency():
    rng = np.random.default_rng(1)
    N, K, P, M = 10, 100, 15, 40
    pair_indices = np.array(
        [(i, j) for i in range(N) for j in range(i + 1, N)], np.int32
    )[rng.permutation(45)[:P]]
    corr_i1 = rng.integers(0, K, (P, M)).astype(np.int32)
    corr_i2 = rng.integers(0, K, (P, M)).astype(np.int32)
    corr_mask = rng.uniform(size=(P, M)) < 0.5
    kxy = rng.normal(size=(N, K, 2)).astype(np.float32)
    cam, kp, uv, mask = dsf.tracks_from_matches(pair_indices, corr_i1, corr_i2, corr_mask, kxy)
    # every returned track: unique images, len >= 2
    for j in range(cam.shape[0]):
        imgs = cam[j][mask[j]]
        if len(imgs) == 0:
            continue
        assert len(np.unique(imgs)) == len(imgs)
        assert len(imgs) >= 2
