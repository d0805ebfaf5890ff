import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsfm_tpu.bundle.triangulation import (
    TriangulationMode,
    triangulate_dlt,
    triangulate_tracks,
)
from tests.common.test_sfm_data import make_synthetic_scene


def _scene_track_arrays(data):
    """Convert SfmData measurements into padded [T, K] track arrays."""
    T = data.max_tracks
    K = data.max_cameras
    cam_idx = np.zeros((T, K), np.int32)
    uv = np.zeros((T, K, 2), np.float32)
    mask = np.zeros((T, K), bool)
    counts = np.zeros(T, np.int32)
    mc = np.asarray(data.meas_cam)
    mt = np.asarray(data.meas_track)
    muv = np.asarray(data.meas_uv)
    for m in range(len(mc)):
        if not np.asarray(data.meas_mask)[m]:
            continue
        j = mt[m]
        k = counts[j]
        cam_idx[j, k] = mc[m]
        uv[j, k] = muv[m]
        mask[j, k] = True
        counts[j] += 1
    return jnp.asarray(cam_idx), jnp.asarray(uv), jnp.asarray(mask)


@pytest.mark.parametrize(
    "mode",
    [
        TriangulationMode.NO_RANSAC,
        TriangulationMode.RANSAC_SAMPLE_UNIFORM,
        TriangulationMode.RANSAC_SAMPLE_BIASED_BASELINE,
        TriangulationMode.RANSAC_TOPK_BASELINES,
    ],
)
def test_triangulate_perfect_tracks(mode):
    data = make_synthetic_scene(n_cams=5, n_tracks=30)
    cam_idx, uv, mask = _scene_track_arrays(data)
    pts, inliers, ok = triangulate_tracks(
        data.poses, data.cal, cam_idx, uv, mask, jax.random.PRNGKey(0),
        reproj_threshold_px=3.0, num_hypotheses=16, mode=mode,
    )
    assert np.all(np.asarray(ok))
    err = np.linalg.norm(np.asarray(pts) - np.asarray(data.points), axis=-1)
    assert np.max(err) < 5e-2, f"max point err {np.max(err)}"
    assert np.all(np.asarray(inliers) == np.asarray(mask))


def test_triangulate_rejects_outlier_observation():
    data = make_synthetic_scene(n_cams=6, n_tracks=20)
    cam_idx, uv, mask = _scene_track_arrays(data)
    uv_np = np.asarray(uv).copy()
    uv_np[:, 2] += 150.0  # corrupt the 3rd observation of every track
    pts, inliers, ok = triangulate_tracks(
        data.poses, data.cal, cam_idx, jnp.asarray(uv_np), mask, jax.random.PRNGKey(1),
        reproj_threshold_px=3.0, num_hypotheses=32,
        mode=TriangulationMode.RANSAC_SAMPLE_UNIFORM,
    )
    inl = np.asarray(inliers)
    assert np.all(np.asarray(ok))
    assert not np.any(inl[:, 2]), "corrupted observation must be outlier"
    assert np.all(inl[:, [0, 1, 3, 4, 5]])
    err = np.linalg.norm(np.asarray(pts) - np.asarray(data.points), axis=-1)
    assert np.max(err) < 5e-2


def test_triangulate_short_and_empty_tracks():
    data = make_synthetic_scene(n_cams=4, n_tracks=6)
    cam_idx, uv, mask = _scene_track_arrays(data)
    m = np.asarray(mask).copy()
    m[0, 1:] = False  # track 0: single observation -> cannot triangulate
    m[1, :] = False  # track 1: empty
    pts, inliers, ok = triangulate_tracks(
        data.poses, data.cal, cam_idx, uv, jnp.asarray(m), jax.random.PRNGKey(2),
        num_hypotheses=8,
    )
    ok = np.asarray(ok)
    assert not ok[0] and not ok[1]
    assert np.all(ok[2:])
    assert not np.any(np.isnan(np.asarray(pts)))


def test_dlt_two_view_exact():
    data = make_synthetic_scene(n_cams=2, n_tracks=10)
    cam_idx, uv, mask = _scene_track_arrays(data)
    cal_m = jax.tree.map(lambda a: a[cam_idx], data.cal)
    xy = cal_m.calibrate(uv)
    for j in range(5):
        poses_t = jax.tree.map(lambda a: a[cam_idx[j]], data.poses)
        X = triangulate_dlt(poses_t, xy[j], mask[j])
        np.testing.assert_allclose(np.asarray(X), np.asarray(data.points[j]), atol=2e-2)


def test_min_angle_rejects_narrow_baseline():
    # two cameras almost at the same place -> tiny triangulation angle
    from gtsfm_tpu.geometry import SE3, Cal3Bundler

    poses = SE3(
        R=jnp.tile(jnp.eye(3), (2, 1, 1)),
        t=jnp.asarray([[0.0, 0, 0], [0.001, 0, 0]]),
    )
    cal = Cal3Bundler.create(jnp.full(2, 500.0), jnp.zeros(2), jnp.zeros(2), jnp.zeros(2), jnp.zeros(2))
    X_true = jnp.asarray([0.2, 0.1, 5.0])
    from gtsfm_tpu.geometry import PinholeCamera

    uv = []
    for i in range(2):
        cam = PinholeCamera(pose=poses[i], cal=jax.tree.map(lambda a: a[i], cal))
        u, _ = cam.project(X_true)
        uv.append(np.asarray(u))
    cam_idx = jnp.asarray([[0, 1]], jnp.int32)
    uvs = jnp.asarray([uv], jnp.float32)
    mask = jnp.ones((1, 2), bool)
    _, _, ok = triangulate_tracks(
        poses, cal, cam_idx, uvs, mask, jax.random.PRNGKey(0),
        min_triangulation_angle_deg=1.0, num_hypotheses=4,
    )
    assert not bool(np.asarray(ok)[0])
