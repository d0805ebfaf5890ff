"""Scale demonstration: 100-camera synthetic scene through the partitioned
hierarchical back-end (slow marker)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsfm_tpu.frontend.synthetic import SyntheticCorrespondenceGenerator, SyntheticOptions
from gtsfm_tpu.geometry import SE3, Cal3Bundler, so3
from gtsfm_tpu.geometry.sim3 import align_poses_sim3
from gtsfm_tpu.retriever.retrievers import sequential_pairs
from gtsfm_tpu.scene.hierarchical import HierarchicalOptions, HierarchicalReconstruction

pytestmark = pytest.mark.slow


def test_hundred_camera_hierarchical():
    n = 100
    rng = np.random.default_rng(0)
    # cameras along a loop looking inward
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    centers = np.stack([20 * np.cos(ang), 20 * np.sin(ang), rng.normal(0, 0.5, n)], 1).astype(np.float32)
    Rs = []
    for c in centers:
        z = -c / np.linalg.norm(c)
        x = np.cross([0, 0, 1.0], z)
        x /= np.linalg.norm(x)
        Rs.append(np.stack([x, np.cross(z, x), z], 1))
    poses = SE3(R=jnp.asarray(np.stack(Rs), jnp.float32), t=jnp.asarray(centers))
    cal = Cal3Bundler.create(
        jnp.full(n, 600.0), jnp.zeros(n), jnp.zeros(n), jnp.full(n, 320.0), jnp.full(n, 240.0)
    )
    pairs = sequential_pairs(n, 6)
    surface = rng.uniform(-6, 6, (800, 3)).astype(np.float32)
    gen = SyntheticCorrespondenceGenerator(SyntheticOptions(num_points=800, noise_px=0.3, seed=1))
    out = gen.generate(poses, cal, pairs, [(640, 480)] * n, surface_points=surface)
    assert out["valid"].sum() > len(pairs) * 0.9

    tvr = {
        "i2Ri1": out["i2Ri1"], "i2Ui1": out["i2Ui1"], "valid": out["valid"],
        "num_inliers": out["num_inliers"], "corr_i1": out["corr_i1"],
        "corr_i2": out["corr_i2"], "corr_mask": out["corr_mask"],
    }
    hier = HierarchicalReconstruction(HierarchicalOptions(max_depth=2, max_cluster_size=30))
    data, metrics = hier.run(n, pairs, tvr, out["keypoints_xy"], cal)
    assert not metrics.get("failed"), metrics
    assert metrics["num_clusters"] >= 2
    assert data.number_images() >= n * 0.9, metrics

    est_mask = np.asarray(data.pose_mask)
    sim = align_poses_sim3(data.poses, poses, mask=jnp.asarray(est_mask))
    aligned = sim.transform_pose(data.poses)
    r_err = np.asarray(so3.relative_angle_deg(aligned.R, poses.R))[est_mask]
    t_err = np.linalg.norm(np.asarray(aligned.t) - centers, axis=-1)[est_mask]
    assert np.median(r_err) < 1.0, (np.median(r_err), r_err.max())
    assert np.median(t_err) < 0.5, (np.median(t_err), t_err.max())
