"""Hierarchical (partition -> per-cluster MVO -> Sim3 merge) on REAL data.

Parity: the reference exercises partition + merge on real Olsson scenes
(cluster_merging.py via runner configs); only Lund Door (12 images) is
mounted in this image, so max_cluster_size=6 forces a genuine multi-cluster
run (native METIS bisection -> >= 2 leaves -> merge -> parent BA) against
real visibility structure, closing the synthetic-only gap flagged in
round-1 review.
"""

import os

import numpy as np
import pytest

DOOR = "/root/reference/tests/data/set1_lund_door"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(DOOR), reason="reference data not mounted"),
]


def test_hierarchical_runner_lund_door(tmp_path):
    from gtsfm_tpu.frontend.detectors.dog_sift import DoGSiftOptions
    from gtsfm_tpu.loader.olsson import OlssonLoader
    from gtsfm_tpu.retriever.retrievers import ExhaustiveRetriever
    from gtsfm_tpu.scene.scene_optimizer import SceneOptimizer, SceneOptimizerOptions

    loader = OlssonLoader(DOOR, max_resolution=480)
    so = SceneOptimizer(
        SceneOptimizerOptions(
            detector=DoGSiftOptions(max_keypoints=1200, contrast_threshold=0.008),
            output_root=str(tmp_path),
            hierarchical=True,
            max_cluster_size=6,
        ),
        retriever=ExhaustiveRetriever(),
    )
    data, groups = so.run(loader)

    assert data.number_images() == 12
    assert int(np.sum(np.asarray(data.pose_mask))) >= 10
    assert data.number_tracks() > 200

    names = {g.name: g for g in groups}
    assert "ba_pose_metrics" in names
    d = names["ba_pose_metrics"].to_dict()["ba_pose_metrics"]
    rot = d["rotation_error_deg"]["summary"]
    trans = d["translation_error"]["summary"]
    # merged multi-cluster result must still clear the reference's e2e gate
    # (trans atol 1.0, test_gtsfm_runner_olssonloader.py:44)
    assert rot["max"] < 5.0, rot
    assert trans["max"] < 1.0, trans
