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


def test_degensac_recovers_from_dominant_plane():
    """280 coplanar points + 6 off-plane + 40 gross outliers: plain F-RANSAC
    fits the dominant plane and misses the off-plane structure; DEGENSAC's
    plane-and-parallax re-estimation (F = [e']_x H with the epipole voted
    by off-H correspondences) must recover all off-plane inliers without
    admitting outliers."""
    rng = np.random.default_rng(0)
    n_plane, n_off, n_out, noise = 280, 6, 40, 0.4
    K = np.array([[500, 0, 320], [0, 500, 240], [0, 0, 1.0]])
    ang = 0.15
    R = np.array(
        [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]]
    )
    t = np.array([0.8, 0.15, 0.1])
    pp = np.stack([rng.uniform(-2, 2, n_plane), rng.uniform(-1.5, 1.5, n_plane),
                   np.full(n_plane, 5.0)], 1)
    po = np.stack([rng.uniform(-2, 2, n_off), rng.uniform(-1.5, 1.5, n_off),
                   rng.uniform(2.2, 3.5, n_off)], 1)
    pts = np.concatenate([pp, po])

    def proj(P, Rm, tm):
        pc = (Rm @ P.T).T + tm
        uv = (K @ pc.T).T
        return uv[:, :2] / uv[:, 2:3]

    uv1 = proj(pts, np.eye(3), np.zeros(3)) + rng.normal(0, noise, (len(pts), 2))
    uv2 = proj(pts, R, t) + rng.normal(0, noise, (len(pts), 2))
    o1 = rng.uniform([0, 0], [640, 480], (n_out, 2))
    o2 = rng.uniform([0, 0], [640, 480], (n_out, 2))
    uv1 = np.concatenate([uv1, o1]).astype(np.float32)
    uv2 = np.concatenate([uv2, o2]).astype(np.float32)
    mask = jnp.ones(len(uv1), bool)
    key = jax.random.PRNGKey(0)

    o_van = ransac_fundamental(jnp.asarray(uv1), jnp.asarray(uv2), mask, key, 2.0,
                               FundamentalOptions())
    o_dg = ransac_fundamental(jnp.asarray(uv1), jnp.asarray(uv2), mask, key, 2.0,
                              FundamentalOptions(degensac=True))
    off = slice(n_plane, n_plane + n_off)
    van_recall = np.asarray(o_van["inliers"])[off].mean()
    dg = np.asarray(o_dg["inliers"])
    assert van_recall < 0.5  # vanilla is fooled by the plane
    assert dg[off].all()  # degensac recovers every off-plane point
    assert dg[n_plane + n_off:].sum() <= 3  # and stays outlier-clean
    assert dg[:n_plane].mean() > 0.95  # plane inliers retained
