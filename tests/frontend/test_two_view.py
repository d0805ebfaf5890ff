import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.frontend.two_view import TwoViewOptions, run_two_view_batch
from gtsfm_tpu.frontend.verifiers.essential import RansacOptions
from gtsfm_tpu.geometry import PinholeCamera, so3
from tests.common.test_sfm_data import make_synthetic_scene


def make_pair_batch(n_cams=4, n_pts=120, desc_dim=32, desc_noise=0.02, seed=0):
    """Synthetic batched two-view inputs: each 3D point gets a random unit
    descriptor; keypoints per image are its projections."""
    rng = np.random.default_rng(seed)
    scene = make_synthetic_scene(n_cams=n_cams, n_tracks=n_pts)
    pts = np.asarray(scene.points)
    point_desc = rng.normal(size=(n_pts, desc_dim)).astype(np.float32)
    point_desc /= np.linalg.norm(point_desc, axis=-1, keepdims=True)

    K = n_pts
    kp_xy = np.zeros((n_cams, K, 2), np.float32)
    desc = np.zeros((n_cams, K, desc_dim), np.float32)
    mask = np.zeros((n_cams, K), bool)
    for i in range(n_cams):
        cam = PinholeCamera(
            pose=scene.poses[i], cal=jax.tree.map(lambda a: a[i], scene.cal)
        )
        uv, depth = cam.project(jnp.asarray(pts))
        perm = rng.permutation(n_pts)  # different keypoint order per image
        kp_xy[i] = np.asarray(uv)[perm]
        d = point_desc[perm] + desc_noise * rng.normal(size=(n_pts, desc_dim)).astype(np.float32)
        desc[i] = d / np.linalg.norm(d, axis=-1, keepdims=True)
        mask[i] = np.asarray(depth)[perm] > 0

    pairs = np.array([(i, j) for i in range(n_cams) for j in range(i + 1, n_cams)], np.int32)
    P = len(pairs)
    take = lambda arr, idx: jnp.asarray(arr[idx])
    i1, i2 = pairs[:, 0], pairs[:, 1]
    cal1 = jax.tree.map(lambda a: a[jnp.asarray(i1)], scene.cal)
    cal2 = jax.tree.map(lambda a: a[jnp.asarray(i2)], scene.cal)
    batch = dict(
        kp_xy1=take(kp_xy, i1), kp_xy2=take(kp_xy, i2),
        desc1=take(desc, i1), desc2=take(desc, i2),
        kp_mask1=take(mask, i1), kp_mask2=take(mask, i2),
        cal1=cal1, cal2=cal2, pair_mask=jnp.ones(P, bool),
    )
    return scene, pairs, batch


def _expected_rel(scene, pairs):
    R = np.asarray(scene.poses.R)
    t = np.asarray(scene.poses.t)
    i1, i2 = pairs[:, 0], pairs[:, 1]
    i2Ri1 = np.einsum("eji,ejk->eik", R[i2], R[i1])
    d = np.einsum("eji,ej->ei", R[i2], t[i1] - t[i2])
    i2Ui1 = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return i2Ri1, i2Ui1


def test_two_view_batch_recovers_relative_poses():
    scene, pairs, batch = make_pair_batch()
    opts = TwoViewOptions(ransac=RansacOptions(num_hypotheses=128))
    res = run_two_view_batch(**batch, key=jax.random.PRNGKey(0), opts=opts)
    assert np.asarray(res.valid).all()
    R_gt, U_gt = _expected_rel(scene, pairs)
    r_err = np.asarray(so3.relative_angle_deg(jnp.asarray(R_gt), res.i2Ri1))
    u_dot = np.abs(np.sum(np.asarray(res.i2Ui1) * U_gt, axis=-1))
    u_err = np.degrees(np.arccos(np.clip(u_dot, -1, 1)))
    assert r_err.max() < 1.0, f"rotation errs {r_err}"
    assert u_err.max() < 2.0, f"translation errs {u_err}"
    assert np.asarray(res.num_inliers).min() > 60


def test_two_view_batch_rejects_bad_pair():
    scene, pairs, batch = make_pair_batch(desc_noise=0.0, seed=1)
    # destroy matching for pair 0 by shuffling its descriptors randomly
    rng = np.random.default_rng(2)
    d1 = np.asarray(batch["desc1"]).copy()
    d1[0] = rng.normal(size=d1[0].shape).astype(np.float32)
    d1[0] /= np.linalg.norm(d1[0], axis=-1, keepdims=True)
    batch["desc1"] = jnp.asarray(d1)
    opts = TwoViewOptions(ransac=RansacOptions(num_hypotheses=128))
    res = run_two_view_batch(**batch, key=jax.random.PRNGKey(0), opts=opts)
    valid = np.asarray(res.valid)
    assert not valid[0]
    assert valid[1:].all()


def test_two_view_pair_mask():
    scene, pairs, batch = make_pair_batch(seed=3)
    pm = np.ones(len(pairs), bool)
    pm[2] = False
    batch["pair_mask"] = jnp.asarray(pm)
    res = run_two_view_batch(**batch, key=jax.random.PRNGKey(0))
    assert not np.asarray(res.valid)[2]
    assert not np.asarray(res.corr_mask)[2].any()


def test_two_view_homography_degeneracy_rejection():
    """A planar scene pair should be flagged degenerate when the H check is
    on, and kept when it is off."""
    rng = np.random.default_rng(5)
    n_cams, n_pts, D = 2, 200, 32
    # all points on the plane z=5 (camera frame of cam0)
    pts = np.stack([rng.uniform(-1.5, 1.5, n_pts), rng.uniform(-1, 1, n_pts),
                    np.full(n_pts, 5.0)], -1).astype(np.float32)
    pdesc = rng.normal(size=(n_pts, D)).astype(np.float32)
    pdesc /= np.linalg.norm(pdesc, axis=-1, keepdims=True)
    centers = np.asarray([[0, 0, 0], [0.6, 0.1, 0]], np.float32)
    Rs = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
    kp = np.zeros((2, n_pts, 2), np.float32)
    msk = np.zeros((2, n_pts), bool)
    dsc = np.zeros((2, n_pts, D), np.float32)
    for i in range(2):
        pc = pts - centers[i]
        uv = 500.0 * pc[:, :2] / pc[:, 2:3] + np.asarray([320, 240], np.float32)
        kp[i] = uv
        msk[i] = True
        dsc[i] = pdesc
    from gtsfm_tpu.geometry import Cal3Bundler

    cal = Cal3Bundler.create(jnp.full(1, 500.0), jnp.zeros(1), jnp.zeros(1),
                             jnp.full(1, 320.0), jnp.full(1, 240.0))
    batch = dict(
        kp_xy1=jnp.asarray(kp[:1]), kp_xy2=jnp.asarray(kp[1:]),
        desc1=jnp.asarray(dsc[:1]), desc2=jnp.asarray(dsc[1:]),
        kp_mask1=jnp.asarray(msk[:1]), kp_mask2=jnp.asarray(msk[1:]),
        cal1=cal, cal2=cal, pair_mask=jnp.ones(1, bool),
    )
    res_off = run_two_view_batch(**batch, key=jax.random.PRNGKey(0), opts=TwoViewOptions())
    assert bool(np.asarray(res_off.valid)[0])
    res_on = run_two_view_batch(
        **batch, key=jax.random.PRNGKey(0),
        opts=TwoViewOptions(homography_degeneracy_ratio=0.85),
    )
    assert not bool(np.asarray(res_on.valid)[0])


def test_two_view_indeterminacy_rejection():
    """A pair whose correspondences are all clustered at one image location
    cannot determine the relative pose; the information-spectrum check must
    reject it (2-view indeterminate-linear-system parity) while leaving
    well-conditioned pairs untouched."""
    scene, pairs, batch = make_pair_batch(seed=7)
    kp1 = np.asarray(batch["kp_xy1"]).copy()
    kp2 = np.asarray(batch["kp_xy2"]).copy()
    rng = np.random.default_rng(8)
    # collapse pair 0's keypoints to a single pixel (+tiny jitter so the
    # 5-pt solver doesn't produce exact NaNs)
    kp1[0] = kp1[0][:1] + 0.1 * rng.normal(size=kp1[0].shape).astype(np.float32)
    kp2[0] = kp2[0][:1] + 0.1 * rng.normal(size=kp2[0].shape).astype(np.float32)
    batch["kp_xy1"] = jnp.asarray(kp1)
    batch["kp_xy2"] = jnp.asarray(kp2)

    opts_on = TwoViewOptions(
        ransac=RansacOptions(num_hypotheses=128), indeterminacy_eig_ratio=1e-5
    )
    res_on = run_two_view_batch(**batch, key=jax.random.PRNGKey(0), opts=opts_on)
    valid_on = np.asarray(res_on.valid)
    assert not valid_on[0]
    assert valid_on[1:].all()

    opts_off = TwoViewOptions(ransac=RansacOptions(num_hypotheses=128))
    res_off = run_two_view_batch(**batch, key=jax.random.PRNGKey(0), opts=opts_off)
    assert np.asarray(res_off.valid)[1:].all()


def test_essential_information_spectrum_conditioning():
    from gtsfm_tpu.frontend.verifiers.essential import (
        essential_information_spectrum,
    )

    scene, pairs, batch = make_pair_batch(seed=9)
    res = run_two_view_batch(**batch, key=jax.random.PRNGKey(0))
    # well-conditioned pair: healthy eigenvalue ratio
    x1 = jax.tree.map(lambda a: a[0], batch["cal1"]).calibrate(batch["kp_xy1"][0])
    x2 = jax.tree.map(lambda a: a[0], batch["cal2"]).calibrate(
        batch["kp_xy2"][0][np.asarray(res.corr_i2)[0]]
    )
    w = np.asarray(res.corr_mask)[0].astype(np.float32)
    mn, mx = essential_information_spectrum(x1, x2, jnp.asarray(w), res.i2Ri1[0], res.i2Ui1[0])
    assert float(mn) > 1e-4 * float(mx)
    # degenerate: all weight on a single correspondence -> rank deficient
    w1 = np.zeros_like(w)
    w1[np.argmax(w)] = 1.0
    mn1, mx1 = essential_information_spectrum(
        x1, x2, jnp.asarray(w1), res.i2Ri1[0], res.i2Ui1[0]
    )
    assert float(mn1) < 1e-6 * float(mx1)
