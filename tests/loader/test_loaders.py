import os

import numpy as np
import pytest

REF = "/root/reference/tests/data"

needs = lambda p: pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, p)), reason="reference data not mounted"
)


@needs("set1_lund_door")
def test_olsson_loader():
    from gtsfm_tpu.loader.olsson import OlssonLoader

    L = OlssonLoader(os.path.join(REF, "set1_lund_door"), max_resolution=320)
    assert len(L) == 12
    img = L.get_image(0)
    assert min(img.height, img.width) <= 320
    cal = L.get_camera_intrinsics(0)
    assert float(np.asarray(cal.f)) > 100
    assert L.get_gt_poses() is not None
    batch, sizes = L.load_grayscale_batch(indices=[0, 1])
    assert batch.shape[0] == 2 and batch.max() <= 1.0


@needs("crane_mast_8imgs_colmap_output")
def test_colmap_loader_no_images_dir():
    # crane_mast has no images on disk; loader yields 0 usable records
    from gtsfm_tpu.loader.colmap import ColmapLoader

    L = ColmapLoader(os.path.join(REF, "crane_mast_8imgs_colmap_output"), "/nonexistent")
    assert len(L) == 0


@needs("astrovision/test_2011212_opnav_022")
def test_astrovision_loader():
    from gtsfm_tpu.loader.datasets import AstrovisionLoader

    L = AstrovisionLoader(os.path.join(REF, "astrovision/test_2011212_opnav_022"))
    assert len(L) >= 2
    img = L.get_image(0)
    assert img.height > 0
    pose = L.get_camera_pose(0)
    assert abs(float(np.linalg.det(np.asarray(pose.R))) - 1.0) < 1e-4
    cal = L.get_camera_intrinsics(0)
    assert float(np.asarray(cal.fx)) > 0


@needs("tanks_and_temples_barn")
def test_tnt_loader():
    from gtsfm_tpu.loader.datasets import TanksAndTemplesLoader

    base = os.path.join(REF, "tanks_and_temples_barn")
    L = TanksAndTemplesLoader(
        img_dir=os.path.join(base, "Barn"),
        poses_fpath=os.path.join(base, "Barn_COLMAP_SfM.log"),
        max_resolution=480,
    )
    if len(L) == 0:
        pytest.skip("no T&T images in the sample")
    pose = L.get_camera_pose(0)
    assert abs(float(np.linalg.det(np.asarray(pose.R))) - 1.0) < 1e-3


@needs("mobilebrick")
def test_mobilebrick_loader():
    from gtsfm_tpu.loader.datasets import MobilebrickLoader

    L = MobilebrickLoader(os.path.join(REF, "mobilebrick"), max_resolution=480)
    assert len(L) >= 3
    cal = L.get_camera_intrinsics(0)
    assert float(np.asarray(cal.fx)) > 100
    assert L.get_camera_pose(0) is not None


@needs("1dsfm")
def test_onedsfm_loader():
    from gtsfm_tpu.loader.datasets import OneDSFMLoader

    L = OneDSFMLoader(os.path.join(REF, "1dsfm"), max_resolution=320)
    assert len(L) >= 2
    cal = L.get_camera_intrinsics(0)  # EXIF or default prior
    assert float(np.asarray(cal.f)) > 0


@needs("hilti_exp4_small")
def test_hilti_loader():
    from gtsfm_tpu.loader.hilti import HiltiLoader

    L = HiltiLoader(os.path.join(REF, "hilti_exp4_small"), max_resolution=480)
    assert len(L) >= 5
    assert L.cams_per_rig >= 2
    assert L.rig_index(L.cams_per_rig) == 1
    cal = L.get_camera_intrinsics(0)
    if cal is not None:
        assert float(np.asarray(cal.fx)) > 0
    edges, rel, w = L.get_rig_constraints()
    assert len(edges) >= 1
    # relative pose within the same rig must be a valid SE3
    R0 = np.asarray(rel.R)[0]
    assert abs(np.linalg.det(R0) - 1.0) < 1e-4
