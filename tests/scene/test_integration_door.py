"""Full-runner integration test on Lund Door.

Parity: /root/reference/tests/test_gtsfm_runner_olssonloader.py:22-44
(recovered poses within trans atol 1.0 / rtol 0.1 of GT, marked slow).
"""

import os

import numpy as np
import pytest

DOOR = "/root/reference/tests/data/set1_lund_door"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(DOOR), reason="reference data not mounted"),
]


def test_runner_lund_door(tmp_path):
    from gtsfm_tpu.frontend.detectors.dog_sift import DoGSiftOptions
    from gtsfm_tpu.loader.olsson import OlssonLoader
    from gtsfm_tpu.retriever.retrievers import ExhaustiveRetriever
    from gtsfm_tpu.scene.scene_optimizer import SceneOptimizer, SceneOptimizerOptions

    loader = OlssonLoader(DOOR, max_resolution=480)
    so = SceneOptimizer(
        SceneOptimizerOptions(
            detector=DoGSiftOptions(max_keypoints=1200, contrast_threshold=0.008),
            output_root=str(tmp_path),
        ),
        retriever=ExhaustiveRetriever(),
    )
    data, groups = so.run(loader)

    assert data.number_images() == 12
    assert data.number_tracks() > 300

    names = {g.name: g for g in groups}
    assert "ba_pose_metrics" in names
    d = names["ba_pose_metrics"].to_dict()["ba_pose_metrics"]
    rot = d["rotation_error_deg"]["summary"]
    trans = d["translation_error"]["summary"]
    # reference gate: translations within atol 1.0; we hold a much tighter bar
    assert rot["max"] < 2.0, rot
    assert trans["max"] < 1.0, trans
    # exports exist
    assert os.path.exists(tmp_path / "results" / "ba_output" / "cameras.txt")
    assert os.path.exists(tmp_path / "results" / "metrics" / "ba_pose_metrics.json")
