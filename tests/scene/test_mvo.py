"""End-to-end back-end test: synthetic correspondences -> two-view batch ->
MultiViewOptimizer -> aligned pose comparison. The noise-free strategy
mirrors the reference's SyntheticCorrespondenceGenerator back-end testing
(/root/reference/gtsfm/frontend/correspondence_generator/synthetic_correspondence_generator.py:36)."""

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.frontend.two_view import TwoViewOptions, run_two_view_batch
from gtsfm_tpu.frontend.verifiers.essential import RansacOptions
from gtsfm_tpu.geometry import SE3, so3
from gtsfm_tpu.geometry.sim3 import align_poses_sim3
from gtsfm_tpu.scene.mvo import MVOOptions, MultiViewOptimizer
from tests.frontend.test_two_view import make_pair_batch


def test_mvo_end_to_end_synthetic():
    n_cams = 6
    scene, pairs, batch = make_pair_batch(n_cams=n_cams, n_pts=150, desc_noise=0.01, seed=7)
    res = run_two_view_batch(
        **batch, key=jax.random.PRNGKey(0),
        opts=TwoViewOptions(ransac=RansacOptions(num_hypotheses=256)),
    )
    assert np.asarray(res.valid).sum() >= len(pairs) - 2

    # keypoints per image: same array used to build the batch
    kp_xy = np.zeros((n_cams, 150, 2), np.float32)
    # reconstruct per-image keypoints from the batch (pairs share images)
    for e, (i, j) in enumerate(pairs):
        kp_xy[i] = np.asarray(batch["kp_xy1"][e])
        kp_xy[j] = np.asarray(batch["kp_xy2"][e])

    mvo = MultiViewOptimizer(MVOOptions())
    data, metrics = mvo.run(
        num_images=n_cams,
        pairs=pairs,
        i2Ri1=np.asarray(res.i2Ri1),
        i2Ui1=np.asarray(res.i2Ui1),
        pair_valid=np.asarray(res.valid),
        num_inliers=np.asarray(res.num_inliers),
        corr_i1=np.asarray(res.corr_i1),
        corr_i2=np.asarray(res.corr_i2),
        corr_mask=np.asarray(res.corr_mask),
        keypoints_xy=kp_xy,
        cal=scene.cal,
    )
    assert not metrics.get("failed"), metrics
    assert metrics["num_cameras_estimated"] == n_cams
    assert data.number_tracks() > 60, metrics

    # align to GT and compare poses
    est_mask = np.asarray(data.pose_mask)
    sim = align_poses_sim3(data.poses, scene.poses, mask=jnp.asarray(est_mask))
    aligned = sim.transform_pose(data.poses)
    r_err = np.asarray(so3.relative_angle_deg(aligned.R, scene.poses.R))[est_mask]
    t_err = np.linalg.norm(np.asarray(aligned.t) - np.asarray(scene.poses.t), axis=-1)[est_mask]
    scene_scale = np.abs(np.asarray(scene.poses.t)).max()
    assert r_err.max() < 1.0, f"rotation errors {r_err}"
    assert t_err.max() < 0.05 * scene_scale, f"translation errors {t_err}"
    assert metrics["reproj_error_median_px"] < 1.5
