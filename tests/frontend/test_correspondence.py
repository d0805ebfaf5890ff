import numpy as np
import pytest

from gtsfm_tpu.frontend.correspondence import (
    AggregatorOptions,
    ColmapCorrespondenceGenerator,
    KeypointAggregatorDedup,
    KeypointAggregatorUnique,
)


def test_aggregator_unique():
    pair_corrs = {
        (0, 1): (np.array([[10.0, 10], [20, 20]]), np.array([[11.0, 11], [21, 21]])),
        (1, 2): (np.array([[30.0, 30]]), np.array([[31.0, 31]])),
    }
    agg = KeypointAggregatorUnique(AggregatorOptions(max_keypoints_per_image=16))
    kp, mask, out = agg.aggregate(3, pair_corrs)
    assert mask[0].sum() == 2 and mask[1].sum() == 3 and mask[2].sum() == 1
    a, b, keep = out[(0, 1)]
    np.testing.assert_array_equal(kp[0][a], pair_corrs[(0, 1)][0])


def test_aggregator_dedup_merges_nearby():
    # same physical keypoint in image 1 seen from pairs (0,1) and (1,2):
    # within 3px -> must dedup to ONE global keypoint so DSF can chain
    pair_corrs = {
        (0, 1): (np.array([[10.0, 10]]), np.array([[50.0, 50]])),
        (1, 2): (np.array([[50.5, 50.5]]), np.array([[70.0, 70]])),
    }
    agg = KeypointAggregatorDedup(AggregatorOptions(merge_radius_px=3.0))
    kp, mask, out = agg.aggregate(3, pair_corrs)
    assert mask[1].sum() == 1  # deduped
    a1, b1, _ = out[(0, 1)]
    a2, b2, _ = out[(1, 2)]
    assert b1[0] == a2[0]  # same global index in image 1


def test_aggregator_dedup_keeps_distant():
    pair_corrs = {
        (0, 1): (np.array([[10.0, 10]]), np.array([[50.0, 50]])),
        (1, 2): (np.array([[80.0, 80]]), np.array([[70.0, 70]])),
    }
    agg = KeypointAggregatorDedup()
    kp, mask, out = agg.aggregate(3, pair_corrs)
    assert mask[1].sum() == 2


REF = "/root/reference/tests/data/crane_mast_8imgs_colmap_output"


@pytest.mark.skipif(not __import__("os").path.isdir(REF), reason="reference data not mounted")
def test_colmap_correspondence_generator():
    gen = ColmapCorrespondenceGenerator(REF)
    pairs = np.array([[0, 1], [0, 2]], np.int32)
    corrs = gen.generate(pairs)
    assert set(corrs) == {(0, 1), (0, 2)}
    uv1, uv2 = corrs[(0, 1)]
    assert len(uv1) == len(uv2) > 20


def test_combination_detector_descriptor():
    """FAST detector + SIFT descriptor mix-and-match through the registry
    (combination_detector_descriptor.py parity)."""
    import numpy as np

    from gtsfm_tpu.frontend.registry import build_detector

    rng = np.random.default_rng(0)
    img = np.zeros((96, 128), np.float32)
    # corners that FAST can find
    img[20:60, 30:70] = 1.0
    img[50:80, 80:110] = 0.5
    img += rng.uniform(0, 0.05, img.shape).astype(np.float32)

    adapter = build_detector(
        {"name": "combination", "detector": "fast", "descriptor": "root_sift",
         "max_keypoints": 64}
    )
    kp_xy, kp_mask, descs = adapter.detect_batch(img[None])
    assert kp_xy.shape == (1, 64, 2)
    assert kp_mask[0].sum() > 4  # corners found
    d = descs[0][kp_mask[0]]
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
