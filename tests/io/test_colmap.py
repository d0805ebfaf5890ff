import os

import numpy as np
import pytest

from gtsfm_tpu.io import colmap
from tests.common.test_sfm_data import make_synthetic_scene

REF_SKYDIO8 = "/root/reference/tests/data/crane_mast_8imgs_colmap_output"


def test_write_read_roundtrip(tmp_path):
    data = make_synthetic_scene()
    colmap.write_scene(data, str(tmp_path))
    assert set(os.listdir(tmp_path)) >= {"cameras.txt", "images.txt", "points3D.txt"}
    data2 = colmap.read_scene(str(tmp_path))
    assert data2.number_images() == data.number_images()
    assert data2.number_tracks() == data.number_tracks()
    assert data2.number_measurements() == data.number_measurements()
    # poses should roundtrip (same sorted-name order here)
    np.testing.assert_allclose(np.asarray(data2.poses.t), np.asarray(data.poses.t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(data2.poses.R), np.asarray(data.poses.R), atol=1e-4)
    # reprojection errors still tiny after roundtrip
    err = np.asarray(data2.reprojection_errors())
    m = np.asarray(data2.meas_mask)
    assert np.all(err[m] < 0.05)


def test_roundtrip_with_observationless_camera(tmp_path):
    """COLMAP images.txt pairs each pose line with a POINTS2D line that is
    EMPTY for cameras without measurements; the reader must consume lines
    strictly two at a time (blank lines preserved)."""
    import jax.numpy as jnp

    data = make_synthetic_scene()
    # strip every measurement of camera 0 so write_scene emits an empty
    # POINTS2D line for it
    keep = np.asarray(data.meas_cam) != 0
    data = data.replace(meas_mask=jnp.asarray(np.asarray(data.meas_mask) & keep))
    colmap.write_scene(data, str(tmp_path))
    data2 = colmap.read_scene(str(tmp_path))
    assert data2.number_images() == data.number_images()
    assert data2.number_measurements() == data.number_measurements()
    # camera 0's pose must still be present and aligned with the original
    np.testing.assert_allclose(
        np.asarray(data2.poses.t), np.asarray(data.poses.t), atol=1e-4
    )


@pytest.mark.skipif(not os.path.isdir(REF_SKYDIO8), reason="reference data not mounted")
def test_read_reference_colmap_scene():
    data = colmap.read_scene(REF_SKYDIO8)
    assert data.number_images() == 8
    assert data.number_tracks() > 100
    err = np.asarray(data.reprojection_errors())
    m = np.asarray(data.meas_mask)
    # A real COLMAP reconstruction should mostly reproject within a few px
    assert np.median(err[m]) < 3.0


def test_ply_roundtrip(tmp_path):
    from gtsfm_tpu.io.ply import read_ply, write_ply

    pts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    cols = np.random.default_rng(1).uniform(size=(50, 3)).astype(np.float32)
    p = tmp_path / "cloud.ply"
    write_ply(str(p), pts, cols)
    pts2, cols2 = read_ply(str(p))
    np.testing.assert_allclose(pts2, pts, atol=1e-6)
    assert np.abs(cols2 - cols).max() < 1 / 255 + 1e-6
    # colorless
    write_ply(str(p), pts)
    pts3, c3 = read_ply(str(p))
    np.testing.assert_allclose(pts3, pts, atol=1e-6)
    assert c3 is None
