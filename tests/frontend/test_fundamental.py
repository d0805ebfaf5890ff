import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.frontend.verifiers.fundamental import (
    FundamentalOptions,
    fundamental_to_essential,
    gric_select_model,
    ransac_fundamental,
    ransac_homography,
)
from gtsfm_tpu.geometry import so3
from tests.frontend.test_essential import _make_two_view


def _pixelize(x, f=500.0, c=(320, 240)):
    return (x * f + np.asarray(c)).astype(np.float32)


def test_fundamental_ransac_inliers():
    R, t, x1, x2, outliers = _make_two_view(n=200, outlier_frac=0.3, noise=5e-4, seed=0)
    uv1, uv2 = _pixelize(x1), _pixelize(x2)
    out = ransac_fundamental(
        jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(200, bool), jax.random.PRNGKey(0),
        threshold_px=2.0, opts=FundamentalOptions(num_hypotheses=256),
    )
    assert bool(out["success"])
    inl = np.asarray(out["inliers"])
    assert inl[~outliers].mean() > 0.9
    assert inl[outliers].mean() < 0.1


def test_fundamental_to_essential_pose():
    from gtsfm_tpu.frontend.verifiers.essential import recover_pose_from_essential

    R, t, x1, x2, _ = _make_two_view(n=150, noise=2e-4, seed=1)
    uv1, uv2 = _pixelize(x1), _pixelize(x2)
    out = ransac_fundamental(
        jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(150, bool), jax.random.PRNGKey(1),
        threshold_px=2.0,
    )
    K = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    E = fundamental_to_essential(out["F"], K, K)
    R_rec, t_rec = recover_pose_from_essential(
        E, jnp.asarray(x1), jnp.asarray(x2), jnp.ones(150)
    )
    assert float(so3.relative_angle_deg(jnp.asarray(R), R_rec)) < 1.0


def test_homography_and_gric_planar_degeneracy():
    """Points on one plane: H explains everything -> flagged degenerate."""
    rng = np.random.default_rng(2)
    R = np.asarray(so3.expmap(jnp.asarray([0.05, -0.1, 0.02])))
    t = np.array([0.5, 0.1, 0.05], np.float32)
    # planar scene z = 4 in cam1
    X1 = np.stack([rng.uniform(-2, 2, 150), rng.uniform(-2, 2, 150), np.full(150, 4.0)], -1).astype(np.float32)
    X2 = X1 @ R.T + t
    x1 = X1[:, :2] / X1[:, 2:3]
    x2 = X2[:, :2] / X2[:, 2:3]
    uv1, uv2 = _pixelize(x1), _pixelize(x2)
    m = jnp.ones(150, bool)
    f_out = ransac_fundamental(jnp.asarray(uv1), jnp.asarray(uv2), m, jax.random.PRNGKey(3), threshold_px=2.0)
    h_out = ransac_homography(jnp.asarray(uv1), jnp.asarray(uv2), m, jax.random.PRNGKey(4), threshold_px=2.0)
    degen, ratio = gric_select_model(f_out["inliers"], h_out["inliers"], m)
    assert bool(degen), float(ratio)

    # non-planar scene: H should NOT explain most correspondences
    _, _, x1g, x2g, _ = _make_two_view(n=150, seed=5)
    uv1g, uv2g = _pixelize(x1g), _pixelize(x2g)
    f2 = ransac_fundamental(jnp.asarray(uv1g), jnp.asarray(uv2g), m, jax.random.PRNGKey(5), threshold_px=2.0)
    h2 = ransac_homography(jnp.asarray(uv1g), jnp.asarray(uv2g), m, jax.random.PRNGKey(6), threshold_px=2.0)
    degen2, ratio2 = gric_select_model(f2["inliers"], h2["inliers"], m)
    assert not bool(degen2), float(ratio2)
