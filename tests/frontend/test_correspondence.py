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
