"""Hierarchical reconstruction test: synthetic ring of cameras, partitioned
into clusters, merged back, compared to GT."""

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.frontend.two_view import TwoViewOptions, run_two_view_batch
from gtsfm_tpu.frontend.verifiers.essential import RansacOptions
from gtsfm_tpu.geometry import so3
from gtsfm_tpu.geometry.sim3 import align_poses_sim3
from gtsfm_tpu.scene.hierarchical import HierarchicalOptions, HierarchicalReconstruction
from tests.frontend.test_two_view import make_pair_batch


def test_hierarchical_end_to_end():
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
    hier = HierarchicalReconstruction(
        HierarchicalOptions(max_depth=1, max_cluster_size=4)
    )
    data, metrics = hier.run(n_cams, pairs, tvr, kp_xy, scene.cal)
    assert not metrics.get("failed"), metrics
    assert metrics["num_clusters"] >= 2, metrics
    assert data.number_images() >= n_cams - 1, metrics

    est_mask = np.asarray(data.pose_mask)
    sim = align_poses_sim3(data.poses, scene.poses, mask=jnp.asarray(est_mask))
    aligned = sim.transform_pose(data.poses)
    r_err = np.asarray(so3.relative_angle_deg(aligned.R, scene.poses.R))[est_mask]
    t_err = np.linalg.norm(np.asarray(aligned.t) - np.asarray(scene.poses.t), axis=-1)[est_mask]
    assert r_err.max() < 2.0, r_err
    assert t_err.max() < 0.3, t_err


def test_hierarchical_node_results_and_scene_tree_export(tmp_path):
    """The fold records per-node merged results; SceneTree writes them as
    the nested results/C_1/C_1_2/... layout (products/scene_tree.py +
    common/outputs.py:27-55 parity) and reads them back."""
    import os

    from gtsfm_tpu.products.scene_tree import SceneTree

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
    hier = HierarchicalReconstruction(
        HierarchicalOptions(max_depth=1, max_cluster_size=4)
    )
    data, metrics = hier.run(n_cams, pairs, tvr, kp_xy, scene.cal)
    assert not metrics.get("failed")
    # per-node results were recorded, root last (postorder)
    assert len(hier.node_results) >= 3
    assert hier.node_results[-1][0] == ()
    leaf_paths = [p for p, _ in hier.node_results if p]
    assert leaf_paths

    # write through SceneTree and read the tree back
    for path, node_data in hier.node_results:
        if not path:
            continue
        d = os.path.join(
            str(tmp_path), *[f"C_{'_'.join(map(str, path[: k + 1]))}"
                             for k in range(len(path))]
        )
        SceneTree(directory=d, scene=node_data).write()
    back = SceneTree.read(str(tmp_path))
    scenes = back.all_scenes()
    assert len(scenes) == len(leaf_paths)
    assert all(s.number_images() > 0 for s in scenes)
