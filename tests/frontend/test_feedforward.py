import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.frontend.feedforward import (
    FeedforwardOptions,
    FeedforwardReconstruction,
    feedforward_to_sfm_data,
)
from gtsfm_tpu.geometry import Cal3_S2


def test_feedforward_shapes():
    model = FeedforwardReconstruction(
        FeedforwardOptions(dim=64, depth=2, num_heads=2), example_hw=(64, 96)
    )
    imgs = jnp.asarray(np.random.default_rng(0).uniform(size=(3, 64, 96)).astype(np.float32))
    poses, depth, conf, focal = model.run(imgs)
    assert poses.R.shape == (3, 3, 3)
    assert depth.shape == (3, 64, 96)
    assert conf.shape == (3, 4, 6)
    assert np.all(np.asarray(depth) > 0)
    # rotations valid
    RtR = np.einsum("bij,bik->bjk", np.asarray(poses.R), np.asarray(poses.R))
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (3, 1, 1)), atol=1e-5)


def test_feedforward_to_sfm_data():
    model = FeedforwardReconstruction(
        FeedforwardOptions(dim=64, depth=1, num_heads=2), example_hw=(64, 64)
    )
    imgs = jnp.asarray(np.random.default_rng(1).uniform(size=(2, 64, 64)).astype(np.float32))
    poses, depth, conf, focal = model.run(imgs)
    cal = Cal3_S2.create(jnp.full(2, 80.0), jnp.full(2, 80.0), jnp.zeros(2),
                         jnp.full(2, 32.0), jnp.full(2, 32.0))
    data = feedforward_to_sfm_data(
        poses, np.asarray(depth), np.asarray(conf), cal, conf_threshold=0.0, max_tracks=50
    )
    assert data.number_images() == 2
    assert data.number_tracks() > 10
    err = np.asarray(data.reprojection_errors())
    m = np.asarray(data.meas_mask)
    # unprojected points must reproject exactly to their pixels
    assert np.median(err[m]) < 0.5


def test_rank_frames_prefers_central():
    import jax.numpy as jnp
    import numpy as np

    from gtsfm_tpu.frontend.feedforward import rank_frames

    rng = np.random.default_rng(0)
    base = rng.normal(size=(1, 4, 4, 16)).astype(np.float32)
    # frame 1 is the average of frames 0 and 2; frame 3 is an outlier
    f0 = base + 0.2 * rng.normal(size=base.shape).astype(np.float32)
    f2 = base + 0.2 * rng.normal(size=base.shape).astype(np.float32)
    f1 = 0.5 * (f0 + f2)
    f3 = rng.normal(size=base.shape).astype(np.float32)
    feats = np.concatenate([f0, f1, f2, f3])
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    scores = np.asarray(rank_frames(jnp.asarray(feats)))
    # the load-bearing property: the outlier frame ranks last by a wide
    # margin, so it is never chosen as the tracking reference
    assert np.argmin(scores) == 3
    assert scores[3] < scores[:3].min() - 0.3


def test_track_queries_recovers_shifted_features():
    import jax.numpy as jnp
    import numpy as np

    from gtsfm_tpu.frontend.feedforward import track_queries

    rng = np.random.default_rng(1)
    hp, wp, D = 12, 16, 32
    f0 = rng.normal(size=(hp, wp, D)).astype(np.float32)
    f0 /= np.linalg.norm(f0, axis=-1, keepdims=True)
    f1 = np.roll(f0, shift=(2, 3), axis=(0, 1))  # frame 1 = frame 0 shifted
    feats = jnp.asarray(np.stack([f0, f1]))
    qy, qx = np.array([4, 6]), np.array([5, 9])
    qfeat = feats[0, qy, qx]
    xy, vis = track_queries(feats, qfeat)
    xy, vis = np.asarray(xy), np.asarray(vis)
    # frame 0: found at the query location
    np.testing.assert_allclose(xy[0, :, 0], qx, atol=0.5)
    np.testing.assert_allclose(xy[0, :, 1], qy, atol=0.5)
    # frame 1: found at the shifted location
    np.testing.assert_allclose(xy[1, :, 0], (qx + 3) % wp, atol=0.5)
    np.testing.assert_allclose(xy[1, :, 1], (qy + 2) % hp, atol=0.5)
    assert (vis > 0.99).all()


def test_select_tracks_for_ba_covers_cameras():
    import numpy as np

    from gtsfm_tpu.frontend.feedforward import select_tracks_for_ba

    rng = np.random.default_rng(2)
    Q, B = 200, 5
    valid = rng.random((Q, B)) < 0.4
    vis = rng.random((Q, B)).astype(np.float32) * valid
    chosen = select_tracks_for_ba(vis, valid, per_camera=6)
    coverage = valid[chosen].sum(axis=0)
    # every camera covered to the target (the pool is plentiful)
    assert (coverage >= 6).all()
    # selection is economical: far fewer tracks than the full pool
    assert chosen.sum() < Q / 2
