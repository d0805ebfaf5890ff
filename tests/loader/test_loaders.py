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


@needs("argoverse/train1/273c1883-673a-36bf-b124-88311b1a80be")
def test_argoverse_loader():
    from gtsfm_tpu.loader.datasets import ArgoverseLoader

    L = ArgoverseLoader(
        os.path.join(REF, "argoverse/train1"),
        log_id="273c1883-673a-36bf-b124-88311b1a80be",
        stride=1, max_num_imgs=20, max_resolution=320,
    )
    assert len(L) == 2
    img = L.get_image(0)
    assert min(img.height, img.width) <= 320
    cal = L.get_camera_intrinsics(0)
    assert float(np.asarray(cal.f)) > 100
    # world frame anchored at camera 0
    p0 = L.get_camera_pose(0)
    np.testing.assert_allclose(np.asarray(p0.R), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(p0.t), 0.0, atol=1e-5)
    p1 = L.get_camera_pose(1)
    R1 = np.asarray(p1.R)
    np.testing.assert_allclose(R1 @ R1.T, np.eye(3), atol=1e-5)
    assert np.linalg.norm(np.asarray(p1.t)) > 0.1  # vehicle moved
    # lookahead pair limit: 2s * 30Hz / stride 1 = 60 frames
    assert L.is_valid_pair(0, 1)
    assert not L.is_valid_pair(1, 0)


@needs("imb_reichstag")
def test_yfcc_imb_loader():
    from gtsfm_tpu.loader.datasets import YfccImbLoader

    L = YfccImbLoader(os.path.join(REF, "imb_reichstag"), co_visibility_threshold=0.1,
                      max_resolution=320)
    assert len(L) > 0
    cal = L.get_camera_intrinsics(0)
    assert float(np.asarray(cal.f)) > 100
    pose = L.get_camera_pose(0)
    R = np.asarray(pose.R)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    pairs = L.valid_pairs()
    assert len(pairs) > 0
    assert all(L.is_valid_pair(i, j) for i, j in pairs[:10])
    # a higher threshold admits no more pairs than a lower one
    L9 = YfccImbLoader(os.path.join(REF, "imb_reichstag"), co_visibility_threshold=0.9,
                       max_resolution=320)
    assert len(L9.valid_pairs()) <= len(pairs)
    img = L.get_image(0)
    assert min(img.height, img.width) <= 320
