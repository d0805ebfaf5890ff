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


def test_lawnmower_sweep_hierarchical():
    """Skydio-class aerial lawnmower sweep (2 rows x 120 cameras) through
    partition -> compacted per-cluster MVO -> tree merge. Exercises the
    pow2 shape bucketing (clusters share executables), the compacted
    merge BA, and cross-row retrieval pairs (sequential index pairs alone
    leave sweep rows disconnected — the classic aerial failure mode)."""
    n, rows, cols = 240, 2, 120
    rng = np.random.default_rng(0)
    ix = np.arange(n)
    r_i, c_i = ix // cols, ix % cols
    centers = np.stack([
        c_i * 1.0 + rng.normal(0, 0.05, n),
        r_i * 8.0 + rng.normal(0, 0.05, n),
        30.0 + rng.normal(0, 0.2, n),
    ], 1).astype(np.float32)
    Rs = []
    for _ in range(n):
        z = np.array([0.1, 0.05, -1.0]); z /= np.linalg.norm(z)
        x = np.array([1.0, 0, 0]); x = x - z * (x @ z); x /= np.linalg.norm(x)
        Rs.append(np.stack([x, np.cross(z, x), z], 1))
    poses = SE3(R=jnp.asarray(np.stack(Rs), jnp.float32), t=jnp.asarray(centers))
    cal = Cal3Bundler.create(
        jnp.full(n, 600.0), jnp.zeros(n), jnp.zeros(n),
        jnp.full(n, 320.0), jnp.full(n, 240.0),
    )
    seq = np.asarray(sequential_pairs(n, 8))
    cross = [
        (i, i + cols + dj)
        for i in range(n)
        for dj in (-1, 0, 1)
        if i < i + cols + dj < n
    ]
    pairs = np.unique(np.concatenate([seq, np.asarray(cross, seq.dtype)]), axis=0)
    surface = np.stack([
        rng.uniform(-5, cols + 5, 2500),
        rng.uniform(-5, rows * 8 + 5, 2500),
        rng.uniform(-1, 1, 2500),
    ], 1).astype(np.float32)
    gen = SyntheticCorrespondenceGenerator(
        SyntheticOptions(num_points=2500, noise_px=0.3, seed=1)
    )
    out = gen.generate(poses, cal, pairs, [(640, 480)] * n, surface_points=surface)
    tvr = {
        "i2Ri1": out["i2Ri1"], "i2Ui1": out["i2Ui1"], "valid": out["valid"],
        "num_inliers": out["num_inliers"], "corr_i1": out["corr_i1"],
        "corr_i2": out["corr_i2"], "corr_mask": out["corr_mask"],
    }
    hier = HierarchicalReconstruction(
        HierarchicalOptions(max_depth=4, max_cluster_size=48)
    )
    data, metrics = hier.run(n, pairs, tvr, out["keypoints_xy"], cal)
    assert not metrics.get("failed"), metrics
    assert metrics["num_clusters"] >= 4
    assert not metrics.get("merge_failures"), metrics.get("merge_failure_reasons")
    est_mask = np.asarray(data.pose_mask)
    assert est_mask.sum() >= n * 0.95, est_mask.sum()
    sim = align_poses_sim3(data.poses, poses, mask=jnp.asarray(est_mask))
    aligned = sim.transform_pose(data.poses)
    r_err = np.asarray(so3.relative_angle_deg(aligned.R, poses.R))[est_mask]
    t_err = np.linalg.norm(np.asarray(aligned.t) - centers, axis=-1)[est_mask]
    assert np.median(r_err) < 0.5, (np.median(r_err), r_err.max())
    assert np.median(t_err) < 0.3, (np.median(t_err), t_err.max())
