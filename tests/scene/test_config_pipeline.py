"""Config-composed pipelines: every front-end stage must be swappable from
YAML (the reference's defining invariant — configs/unified.yaml +
runner.py:202-311 component swaps)."""

import os

import numpy as np
import pytest

import gtsfm_tpu.configs.config as C

DOOR = "/root/reference/tests/data/set1_lund_door"


def test_unified_builds_classical_frontend():
    so = C.build_scene_optimizer(C.load_config("unified"))
    from gtsfm_tpu.frontend.detectors.dog_sift import DoGSift

    assert isinstance(so.detector.detector, DoGSift)
    assert so.matcher is None  # fused mutual-NN path
    assert so.detector.max_keypoints == 2048


def test_deep_front_end_builds_deep_components():
    so = C.build_scene_optimizer(
        C.load_config("deep_front_end", ["matcher.num_layers=2"])
    )
    from gtsfm_tpu.frontend.detectors.superpoint import SuperPoint
    from gtsfm_tpu.frontend.global_descriptors.descriptors import NetVLADDescriptor
    from gtsfm_tpu.frontend.matchers.lightglue import LightGlueMatcher

    assert isinstance(so.detector.detector, SuperPoint)
    assert isinstance(so.matcher, LightGlueMatcher)
    assert isinstance(so.global_descriptor, NetVLADDescriptor)
    # observably different pipeline from unified
    so_unified = C.build_scene_optimizer(C.load_config("unified"))
    assert type(so.detector.detector) is not type(so_unified.detector.detector)


def test_registry_rejects_unknown_names():
    from gtsfm_tpu.frontend.registry import build_detector, build_matcher

    with pytest.raises(ValueError):
        build_detector({"name": "nope"})
    with pytest.raises(ValueError):
        build_matcher({"name": "nope"})


def test_vggt_config_selects_feedforward():
    so = C.build_scene_optimizer(C.load_config("vggt"))
    assert so.options.cluster_optimizer == "vggt"


@pytest.mark.skipif(not os.path.isdir(DOOR), reason="door data not mounted")
def test_deep_config_runs_end_to_end_shapes():
    """Random-weight SuperPoint+LightGlue on 5 Door images: the pipeline
    must execute every stage and return a well-formed (possibly empty)
    scene — weight quality is tested separately by the exact-port tests."""
    from gtsfm_tpu.loader.olsson import OlssonLoader

    cfg = C.load_config(
        "deep_front_end",
        [
            "scene_optimizer.pair_batch_size=8",
            "detector.max_keypoints=256",
            "matcher.num_layers=2",
        ],
    )
    so = C.build_scene_optimizer(cfg)
    loader = OlssonLoader(DOOR, max_resolution=240, max_frames=5)
    data, groups = so.run(loader)
    names = [g.name for g in groups]
    assert "frontend_summary" in names
    assert data.max_cameras == 5


@pytest.mark.skipif(not os.path.isdir(DOOR), reason="door data not mounted")
def test_feedforward_cluster_optimizer_via_config():
    """--cluster_optimizer vggt routes through the feed-forward slot."""
    from gtsfm_tpu.loader.olsson import OlssonLoader

    cfg = C.load_config("vggt", ["scene_optimizer.feedforward_post_ba=false"])
    so = C.build_scene_optimizer(cfg)
    loader = OlssonLoader(DOOR, max_resolution=120, max_frames=3)
    data, groups = so.run(loader)
    names = [g.name for g in groups]
    assert "feedforward_metrics" in names
    assert data.number_images() == 3


@pytest.mark.skipif(not os.path.isdir(DOOR), reason="door data not mounted")
def test_cachers_make_second_run_skip_recompute(tmp_path):
    """With use_cache, a second identical run replays detection + two-view
    from the content-addressed disk cache (checkpoint/resume parity)."""
    import time

    from gtsfm_tpu.loader.olsson import OlssonLoader

    overrides = [
        "scene_optimizer.use_cache=true",
        f"scene_optimizer.cache_root={tmp_path}",
        "scene_optimizer.pair_batch_size=8",
        "detector.max_keypoints=256",
    ]
    cfg = C.load_config("unified", overrides)

    so1 = C.build_scene_optimizer(cfg)
    loader = OlssonLoader(DOOR, max_resolution=240, max_frames=4)
    t0 = time.perf_counter()
    so1.run(loader)
    first = time.perf_counter() - t0

    # fresh optimizer, same cache root: both stages must hit
    so2 = C.build_scene_optimizer(C.load_config("unified", overrides))
    images, sizes = loader.load_grayscale_batch()
    kp_xy, kp_mask, descs = so2._detect_batch(images, sizes)
    key = None  # the cache is keyed on content; a hit returns instantly
    t0 = time.perf_counter()
    kp_xy2, kp_mask2, descs2 = so2._detect_batch(images, sizes)
    assert time.perf_counter() - t0 < max(0.5, first / 10)
    np.testing.assert_array_equal(kp_xy, kp_xy2)
    # two-view cache hit
    from gtsfm_tpu.loader.base import batch_calibrations

    cal = batch_calibrations(loader.get_all_intrinsics())
    pairs = np.array([(0, 1), (1, 2), (2, 3)], np.int32)
    tvr1 = so2._run_two_view(pairs, kp_xy, kp_mask, descs, cal)
    t0 = time.perf_counter()
    tvr2 = so2._run_two_view(pairs, kp_xy, kp_mask, descs, cal)
    assert time.perf_counter() - t0 < 1.0
    np.testing.assert_array_equal(tvr1["valid"], tvr2["valid"])


def test_mast3r_config_builds_generator():
    cfg = C.load_config(
        "mast3r",
        [
            "correspondence.enc_dim=32", "correspondence.dec_dim=24",
            "correspondence.enc_heads=2", "correspondence.dec_heads=2",
            "correspondence.enc_depth=1", "correspondence.dec_depth=1",
            "correspondence.local_feat_dim=4", "correspondence.long_edge=64",
        ],
    )
    so = C.build_scene_optimizer(cfg)
    from gtsfm_tpu.frontend.mast3r import Mast3rCorrespondenceGenerator

    assert isinstance(so.correspondence, Mast3rCorrespondenceGenerator)
    assert so.options.direct_max_keypoints == 2048


@pytest.mark.skipif(not os.path.isdir(DOOR), reason="door data not mounted")
def test_mast3r_config_runs_end_to_end_shapes():
    """Random-weight MASt3R direct-correspondence pipeline on 4 Door images:
    per-pair dense correspondences -> dedup aggregation -> verification ->
    back-end. Shape/pipeline test; exactness is covered by
    tests/frontend/test_mast3r_exact.py."""
    from gtsfm_tpu.loader.olsson import OlssonLoader

    cfg = C.load_config(
        "mast3r",
        [
            "correspondence.enc_dim=32", "correspondence.dec_dim=24",
            "correspondence.enc_heads=2", "correspondence.dec_heads=2",
            "correspondence.enc_depth=1", "correspondence.dec_depth=1",
            "correspondence.local_feat_dim=4", "correspondence.long_edge=96",
            "correspondence.max_correspondences=128",
            "scene_optimizer.pair_batch_size=8",
            "scene_optimizer.direct_max_keypoints=512",
        ],
    )
    so = C.build_scene_optimizer(cfg)
    loader = OlssonLoader(DOOR, max_resolution=160, max_frames=4)
    data, groups = so.run(loader)
    names = [g.name for g in groups]
    assert "frontend_summary" in names
    assert data.max_cameras == 4


@pytest.mark.skipif(not os.path.isdir(DOOR), reason="door data not mounted")
def test_loftr_correspondence_config_runs():
    """LoFTR-class dense matcher through the same direct path."""
    from gtsfm_tpu.loader.olsson import OlssonLoader

    cfg = C.load_config(
        "unified",
        [
            "correspondence.name=loftr",
            "correspondence.max_matches=256",
            "scene_optimizer.pair_batch_size=8",
            "scene_optimizer.direct_max_keypoints=512",
        ],
    )
    so = C.build_scene_optimizer(cfg)
    from gtsfm_tpu.frontend.correspondence import DenseCorrespondenceGenerator

    assert isinstance(so.correspondence, DenseCorrespondenceGenerator)
    loader = OlssonLoader(DOOR, max_resolution=160, max_frames=3)
    data, groups = so.run(loader)
    assert data.max_cameras == 3


def test_all_named_configs_build():
    """Every shipped named config composes a SceneOptimizer (the
    reference's config catalog: sift/skydio/megaloc/colmap/onedsfm/door/
    cluster/vggt/fastvggt/anysplat...). Reduced dims where a config
    defaults to a large learned model."""
    small_megaloc = [
        "global_descriptor.embed_dim=32", "global_descriptor.depth=1",
        "global_descriptor.num_heads=2", "global_descriptor.pretrain_grid=5",
        "global_descriptor.num_clusters=8", "global_descriptor.cluster_dim=16",
        "global_descriptor.token_dim=16", "global_descriptor.mlp_dim=32",
        "global_descriptor.feat_dim=64",
    ]
    cases = {
        "unified": [], "sift_front_end": [], "skydio_front_end": [],
        "onedsfm_front_end": [], "vggt": [], "fastvggt": [], "anysplat": [],
        "door": [], "cluster": [], "synthetic_front_end": [], "unit_test": [],
        "deep_front_end": ["matcher.num_layers=2"],
        "megaloc_sift_frontend": small_megaloc,
    }
    for name, ov in cases.items():
        so = C.build_scene_optimizer(C.load_config(name, ov))
        assert so is not None, name
    # configs with required fields still parse
    cfg = C.load_config("mast3r", ["correspondence.enc_depth=1",
                                   "correspondence.dec_depth=1",
                                   "correspondence.enc_dim=32",
                                   "correspondence.dec_dim=24",
                                   "correspondence.enc_heads=2",
                                   "correspondence.dec_heads=2",
                                   "correspondence.local_feat_dim=4"])
    assert C.build_scene_optimizer(cfg).correspondence is not None
