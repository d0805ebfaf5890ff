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
