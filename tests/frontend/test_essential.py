import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.frontend.verifiers.essential import (
    RansacOptions,
    ransac_essential,
    ransac_essential_pixels,
    recover_pose_from_essential,
    _eight_point,
    _sampson_error,
)
from gtsfm_tpu.geometry import SE3, Cal3Bundler, so3


def _make_two_view(n=100, outlier_frac=0.0, noise=0.0, seed=0):
    """GT relative pose i2Ti1; normalized correspondences."""
    rng = np.random.default_rng(seed)
    R = np.asarray(so3.expmap(jnp.asarray([0.1, -0.25, 0.05])))
    t = np.array([1.0, 0.2, -0.1], np.float32)
    t /= np.linalg.norm(t)
    # points in camera-1 frame
    X1 = rng.uniform([-2, -2, 3], [2, 2, 10], size=(n, 3)).astype(np.float32)
    X2 = X1 @ R.T + t
    x1 = X1[:, :2] / X1[:, 2:3]
    x2 = X2[:, :2] / X2[:, 2:3]
    if noise > 0:
        x1 += rng.normal(0, noise, x1.shape).astype(np.float32)
        x2 += rng.normal(0, noise, x2.shape).astype(np.float32)
    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        x2[idx] = rng.uniform(-0.5, 0.5, size=(n_out, 2)).astype(np.float32)
    outlier_mask = np.zeros(n, bool)
    if n_out:
        outlier_mask[idx] = True
    return R, t, x1.astype(np.float32), x2.astype(np.float32), outlier_mask


def test_eight_point_noise_free():
    R, t, x1, x2, _ = _make_two_view(n=50)
    w = jnp.ones(50)
    E = _eight_point(jnp.asarray(x1), jnp.asarray(x2), w)
    err = np.asarray(_sampson_error(E, jnp.asarray(x1), jnp.asarray(x2)))
    assert np.max(err) < 1e-8


def test_recover_pose():
    R, t, x1, x2, _ = _make_two_view(n=50, seed=1)
    E_true = np.asarray(so3.hat(jnp.asarray(t))) @ R
    R_rec, t_rec = recover_pose_from_essential(
        jnp.asarray(E_true, jnp.float32), jnp.asarray(x1), jnp.asarray(x2), jnp.ones(50)
    )
    assert float(so3.relative_angle_deg(jnp.asarray(R), R_rec)) < 0.1
    assert np.abs(np.asarray(t_rec) - t).max() < 1e-3


def test_ransac_with_outliers():
    R, t, x1, x2, outliers = _make_two_view(n=200, outlier_frac=0.4, noise=5e-4, seed=2)
    out = ransac_essential(
        jnp.asarray(x1), jnp.asarray(x2), jnp.ones(200, bool), jax.random.PRNGKey(0),
        threshold=3e-3, opts=RansacOptions(num_hypotheses=256),
    )
    assert bool(out["success"])
    inl = np.asarray(out["inliers"])
    # nearly all true inliers kept, outliers rejected (tiny leakage allowed);
    # the strict quality gate is the pose accuracy below
    assert inl[~outliers].mean() > 0.9
    assert inl[outliers].mean() < 0.05
    assert float(so3.relative_angle_deg(jnp.asarray(R), out["i2Ri1"])) < 0.5
    t_err_deg = np.degrees(
        np.arccos(np.clip(np.abs(np.dot(np.asarray(out["i2Ui1"]), t)), -1, 1))
    )
    assert t_err_deg < 1.0


def test_ransac_pixel_wrapper():
    R, t, x1, x2, _ = _make_two_view(n=120, outlier_frac=0.2, seed=3)
    cal = Cal3Bundler.create(500.0, 0.0, 0.0, 320.0, 240.0)
    uv1 = np.asarray(cal.uncalibrate(jnp.asarray(x1)))
    uv2 = np.asarray(cal.uncalibrate(jnp.asarray(x2)))
    out = ransac_essential_pixels(
        jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(120, bool), cal, cal,
        jax.random.PRNGKey(1), threshold_px=2.0, opts=RansacOptions(num_hypotheses=256),
    )
    assert bool(out["success"])
    assert float(so3.relative_angle_deg(jnp.asarray(R), out["i2Ri1"])) < 0.5


def test_ransac_degenerate_too_few_points():
    x = jnp.zeros((20, 2))
    mask = jnp.zeros(20, bool).at[:5].set(True)
    out = ransac_essential(x, x, mask, jax.random.PRNGKey(0))
    assert not bool(out["success"])


def test_ransac_masked_padding_ignored():
    R, t, x1, x2, _ = _make_two_view(n=80, seed=4)
    # append garbage padding
    pad = np.full((40, 2), 7.5, np.float32)
    x1p = np.concatenate([x1, pad])
    x2p = np.concatenate([x2, -pad])
    mask = np.concatenate([np.ones(80, bool), np.zeros(40, bool)])
    out = ransac_essential(
        jnp.asarray(x1p), jnp.asarray(x2p), jnp.asarray(mask), jax.random.PRNGKey(2),
        threshold=3e-3, opts=RansacOptions(num_hypotheses=128),
    )
    assert bool(out["success"])
    assert not np.any(np.asarray(out["inliers"])[80:])
    assert float(so3.relative_angle_deg(jnp.asarray(R), out["i2Ri1"])) < 0.5


def test_ransac_prosac_weighting_low_inlier_regime():
    """At 75% outliers, an all-inlier 8-sample is ~0.39^8 likely — uniform
    sampling with 256 hypotheses usually fails, but score-weighted (PROSAC-
    style) sampling with informative weights succeeds."""
    R, t, x1, x2, outliers = _make_two_view(n=400, outlier_frac=0.75, noise=3e-4, seed=7)
    rng = np.random.default_rng(8)
    # informative quality scores: inliers score high (like match similarity)
    scores = np.where(~outliers, rng.uniform(0.7, 1.0, 400), rng.uniform(0.0, 0.6, 400))
    out_w = ransac_essential(
        jnp.asarray(x1), jnp.asarray(x2), jnp.ones(400, bool), jax.random.PRNGKey(0),
        threshold=3e-3, opts=RansacOptions(num_hypotheses=256),
        sample_weights=jnp.asarray(scores.astype(np.float32)) ** 8,
    )
    assert bool(out_w["success"])
    r_err = float(so3.relative_angle_deg(jnp.asarray(R), out_w["i2Ri1"]))
    assert r_err < 1.0, r_err
    inl = np.asarray(out_w["inliers"])
    assert inl[~outliers].mean() > 0.8
    assert inl[outliers].mean() < 0.05


def test_ransac_lmeds_scoring():
    R, t, x1, x2, outliers = _make_two_view(n=200, outlier_frac=0.3, noise=3e-4, seed=9)
    out = ransac_essential(
        jnp.asarray(x1), jnp.asarray(x2), jnp.ones(200, bool), jax.random.PRNGKey(0),
        threshold=3e-3, opts=RansacOptions(num_hypotheses=256, scoring="lmeds"),
    )
    assert bool(out["success"])
    assert float(so3.relative_angle_deg(jnp.asarray(R), out["i2Ri1"])) < 0.5
