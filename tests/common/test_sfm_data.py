import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsfm_tpu.common.sfm_data import SceneMeta, SfmData
from gtsfm_tpu.geometry import SE3, Cal3Bundler, so3
from gtsfm_tpu.geometry.sim3 import Sim3


def make_synthetic_scene(n_cams=4, n_tracks=20, noise=0.0, seed=0):
    """Cameras on a ring looking at points near origin; perfect measurements."""
    rng = np.random.default_rng(seed)
    angles = np.linspace(0, 1.5 * np.pi, n_cams)
    centers = np.stack([4 * np.cos(angles), 4 * np.sin(angles), np.zeros(n_cams)], axis=1)
    # camera z-axis points at origin
    Rs = []
    for c in centers:
        z = -c / np.linalg.norm(c)
        x = np.cross(np.array([0.0, 0.0, 1.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        Rs.append(np.stack([x, y, z], axis=1))
    poses = SE3(R=jnp.asarray(np.stack(Rs), jnp.float32), t=jnp.asarray(centers, jnp.float32))
    cal = Cal3Bundler.create(
        jnp.full((n_cams,), 500.0), jnp.zeros(n_cams), jnp.zeros(n_cams),
        jnp.full((n_cams,), 320.0), jnp.full((n_cams,), 240.0),
    )
    pts = rng.uniform(-1, 1, size=(n_tracks, 3)).astype(np.float32)
    from gtsfm_tpu.geometry import PinholeCamera

    tracks = []
    for j in range(n_tracks):
        obs = []
        for i in range(n_cams):
            cam = PinholeCamera(pose=poses[i], cal=jax.tree.map(lambda a: a[i], cal))
            uv, depth = cam.project(jnp.asarray(pts[j]))
            if float(depth) > 0:
                uv_np = np.asarray(uv) + rng.normal(0, noise, 2).astype(np.float32)
                obs.append((i, uv_np))
        if len(obs) >= 2:
            tracks.append((pts[j], obs))
    return SfmData.from_cameras_and_tracks(
        poses, cal, tracks, num_cameras=n_cams,
        meta=SceneMeta(image_names=[f"im{i}.jpg" for i in range(n_cams)],
                       image_sizes=[(640, 480)] * n_cams),
    )


def test_counts():
    data = make_synthetic_scene()
    assert data.number_images() == 4
    assert data.number_tracks() == 20
    assert data.number_measurements() == 80  # all points visible in all cams


def test_reprojection_errors_zero_for_perfect_scene():
    data = make_synthetic_scene()
    err = np.asarray(data.reprojection_errors())
    m = np.asarray(data.meas_mask)
    assert np.all(err[m] < 1e-2)


def test_track_lengths():
    data = make_synthetic_scene()
    lengths = np.asarray(data.track_lengths())
    assert np.all(lengths[np.asarray(data.track_mask)] == 4)


def test_filter_by_reprojection_error():
    data = make_synthetic_scene()
    # corrupt one measurement badly
    uv = np.asarray(data.meas_uv).copy()
    uv[0] += 500.0
    data = data.replace(meas_uv=jnp.asarray(uv))
    filtered = data.filter_by_reprojection_error(3.0)
    assert filtered.number_measurements() == data.number_measurements() - 1
    assert filtered.number_tracks() == data.number_tracks()


def test_filter_kills_short_tracks():
    data = make_synthetic_scene(n_cams=2, n_tracks=5)
    uv = np.asarray(data.meas_uv).copy()
    uv[0] += 500.0  # now track 0 has only 1 good measurement
    data = data.replace(meas_uv=jnp.asarray(uv))
    filtered = data.filter_by_reprojection_error(3.0, min_track_len=2)
    assert filtered.number_tracks() == 4


def test_transform_sim3_preserves_reprojection():
    data = make_synthetic_scene()
    S = Sim3(R=so3.random(jax.random.PRNGKey(0)), t=jnp.array([1.0, -2.0, 0.5]), s=jnp.asarray(2.0))
    moved = data.transform(S)
    err = np.asarray(moved.reprojection_errors())
    m = np.asarray(moved.meas_mask)
    assert np.all(err[m] < 1e-2)


def test_compact():
    data = make_synthetic_scene()
    filtered = data.filter_by_track_length(5)  # kills all tracks (len 4)
    compacted = filtered.compact()
    assert compacted.max_tracks == 0 or compacted.number_tracks() == 0
    data2 = data.filter_by_reprojection_error(3.0).compact()
    assert data2.number_tracks() == 20
    assert data2.max_measurements == data2.number_measurements()


def test_largest_connected_component():
    # two disconnected camera groups: tracks only within each pair
    poses = SE3.identity((4,))
    cal = Cal3Bundler.create(jnp.ones(4), jnp.zeros(4), jnp.zeros(4), jnp.zeros(4), jnp.zeros(4))
    tracks = [
        (np.zeros(3), [(0, np.zeros(2)), (1, np.zeros(2))]),
        (np.ones(3), [(0, np.zeros(2)), (1, np.zeros(2))]),
        (np.ones(3) * 2, [(2, np.zeros(2)), (3, np.zeros(2))]),
    ]
    data = SfmData.from_cameras_and_tracks(poses, cal, tracks, num_cameras=4)
    cc = data.select_largest_connected_component()
    keep = np.asarray(cc.pose_mask)
    assert keep.tolist() == [True, True, False, False]
    assert cc.number_tracks() == 2


def test_jit_filter():
    data = make_synthetic_scene()
    f = jax.jit(lambda d: d.filter_by_reprojection_error(3.0))
    out = f(data)
    assert out.number_tracks() == 20


def test_downsample():
    data = make_synthetic_scene(n_tracks=20)
    small = data.downsample(5)
    assert small.number_tracks() == 5
    # measurements of dropped tracks are masked
    mt = np.asarray(small.meas_track)
    mm_ = np.asarray(small.meas_mask)
    tm = np.asarray(small.track_mask)
    assert np.all(tm[mt[mm_]])
    # reprojection still clean for survivors
    err = np.asarray(small.reprojection_errors())
    assert np.all(err[mm_] < 0.05)
