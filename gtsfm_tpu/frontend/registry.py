"""Front-end component registry: name -> detector / matcher / global
descriptor, the swap machinery behind the config system.

Parity: /root/reference/gtsfm/runner.py:202-311 (CLI/Hydra override mapping
that swaps correspondence generators, matchers and global descriptors into
the object tree) and configs/unified.yaml:1-80. Here each component family
has a small factory keyed by ``name``; configs/config.py routes YAML dicts
through these factories so every stage of the production pipeline is
config-selectable.

Uniform contracts
-----------------
detector:  ``detect_batch(images f32 (B, H, W)) -> (kp_xy (B, K, 2),
           kp_mask (B, K), descs (B, K, D))`` as numpy, plus
           ``.max_keypoints``. Adapters below wrap per-image (DoGSift,
           OpenCV) and batched-CNN (SuperPoint, D2-Net, DISK) components.
matcher:   ``match_batch(desc1, desc2, xy1, xy2, mask1, mask2, image_size)
           -> (match_idx i32 (P, K), match_mask (P, K), score (P, K))`` or
           ``None`` for the fused in-kernel mutual-NN path.
global descriptor: ``describe_batch(images) -> (N, D)``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class _VmappedDetectorAdapter:
    """Wraps a per-image detector callable (image (H, W) -> (Keypoints,
    desc)) into the batched contract with one jitted vmap."""

    def __init__(self, detector, max_keypoints: int):
        self.detector = detector
        self.max_keypoints = max_keypoints
        self._det = jax.jit(jax.vmap(lambda im: detector(im)))

    def detect_batch(self, images: np.ndarray):
        kps, d = self._det(jnp.asarray(images))
        return (
            np.asarray(kps.coordinates),
            np.asarray(kps.mask),
            np.asarray(d),
        )


class _BatchedCNNDetectorAdapter:
    """Wraps a batched CNN detector ((B, H, W) -> (Keypoints, desc)),
    padding H/W to the net's stride so the conv tower shapes are legal."""

    def __init__(self, detector, max_keypoints: int, stride: int = 8):
        self.detector = detector
        self.max_keypoints = max_keypoints
        self.stride = stride

    def detect_batch(self, images: np.ndarray):
        B, H, W = images.shape
        Hp, Wp = _round_up(H, self.stride), _round_up(W, self.stride)
        if (Hp, Wp) != (H, W):
            padded = np.zeros((B, Hp, Wp), images.dtype)
            padded[:, :H, :W] = images
            images = padded
        kps, d = self.detector(jnp.asarray(images))
        return (
            np.asarray(kps.coordinates),
            np.asarray(kps.mask),
            np.asarray(d),
        )


class _HostDetectorAdapter:
    """Per-image host (OpenCV-class) detector; loops on CPU."""

    def __init__(self, detector, max_keypoints: int):
        self.detector = detector
        self.max_keypoints = max_keypoints

    def detect_batch(self, images: np.ndarray):
        kp_list, mask_list, desc_list = [], [], []
        for im in images:
            kps, d = self.detector(im)
            kp_list.append(np.asarray(kps.coordinates))
            mask_list.append(np.asarray(kps.mask))
            desc_list.append(np.asarray(d))
        return np.stack(kp_list), np.stack(mask_list), np.stack(desc_list)


def build_detector(cfg: Optional[dict]):
    """cfg: {name: dog_sift|superpoint|d2net|disk|sift|root_sift|orb|brisk|
    kaze, weights_path?: str, <option fields>}."""
    cfg = dict(cfg or {})
    name = cfg.pop("name", "dog_sift")
    weights_path = cfg.pop("weights_path", None)

    if name == "dog_sift":
        from gtsfm_tpu.frontend.detectors.dog_sift import DoGSift, DoGSiftOptions

        opts = DoGSiftOptions(**cfg)
        return _VmappedDetectorAdapter(DoGSift(opts), opts.max_keypoints)
    if name == "superpoint":
        from gtsfm_tpu.frontend.detectors.superpoint import SuperPoint, SuperPointOptions

        opts = SuperPointOptions(**cfg)
        det = SuperPoint(opts, weights_path=weights_path)
        return _BatchedCNNDetectorAdapter(det, opts.max_keypoints, stride=8)
    if name == "d2net":
        from gtsfm_tpu.frontend.detectors.d2net import D2Net, D2NetOptions

        opts = D2NetOptions(**cfg)
        det = D2Net(opts, weights_path=weights_path)
        return _BatchedCNNDetectorAdapter(det, opts.max_keypoints, stride=4)
    if name == "disk":
        from gtsfm_tpu.frontend.detectors.disk import DISK, DISKOptions

        opts = DISKOptions(**cfg)
        det = DISK(opts, weights_path=weights_path)
        return _BatchedCNNDetectorAdapter(det, opts.max_keypoints, stride=16)
    if name in ("sift", "root_sift", "orb", "brisk", "kaze"):
        from gtsfm_tpu.frontend.detectors.opencv_classical import (
            OpenCVDetectorDescriptor,
            OpenCVDetectorOptions,
        )

        opts = OpenCVDetectorOptions(kind=name, **cfg)
        return _HostDetectorAdapter(OpenCVDetectorDescriptor(opts), opts.max_keypoints)
    if name == "combination":
        from gtsfm_tpu.frontend.detectors.opencv_classical import (
            CombinationDetectorDescriptor,
            CombinationOptions,
        )

        opts = CombinationOptions(**cfg)
        return _HostDetectorAdapter(
            CombinationDetectorDescriptor(opts), opts.max_keypoints
        )
    raise ValueError(f"Unknown detector: {name!r}")


def build_matcher(cfg: Optional[dict]):
    """cfg: {name: mutual_nn|lightglue, weights_path?: str, <options>}.
    Returns None for mutual_nn — the fused in-kernel path inside
    run_two_view_batch (one jit, no separate matcher stage)."""
    cfg = dict(cfg or {})
    name = cfg.pop("name", "mutual_nn")
    if name == "mutual_nn":
        return None
    if name == "lightglue":
        from gtsfm_tpu.frontend.matchers.lightglue import (
            LightGlueMatcher,
            LightGlueOptions,
        )

        weights_path = cfg.pop("weights_path", None)
        example_dim = cfg.pop("descriptor_dim", 256)
        opts = LightGlueOptions(**cfg)
        params = None
        if weights_path is not None:
            from gtsfm_tpu.frontend.matchers.lightglue import load_torch_weights

            params, opts = load_torch_weights(weights_path, opts)
        return LightGlueMatcher(opts, params=params, example_dim=example_dim)
    if name == "superglue":
        from gtsfm_tpu.frontend.matchers.superglue import (
            SuperGlueMatcher,
            SuperGlueOptions,
        )

        weights_path = cfg.pop("weights_path", None)
        opts = SuperGlueOptions(**cfg)
        params = None
        if weights_path is not None:
            from gtsfm_tpu.frontend.matchers.superglue import load_torch_weights

            params = load_torch_weights(weights_path, opts)["params"]
        return SuperGlueMatcher(opts, params=params)
    raise ValueError(f"Unknown matcher: {name!r}")


def build_global_descriptor(cfg: Optional[dict]):
    """cfg: {name: tiny|netvlad|hloc_netvlad|megaloc, weights_path?: str}."""
    cfg = dict(cfg or {})
    name = cfg.pop("name", "tiny")
    if name == "tiny":
        from gtsfm_tpu.frontend.global_descriptors.descriptors import TinyImageDescriptor

        return TinyImageDescriptor(**cfg)
    if name == "netvlad":
        from gtsfm_tpu.frontend.global_descriptors.descriptors import (
            NetVLADDescriptor,
            NetVLADOptions,
        )

        cfg.pop("weights_path", None)
        return NetVLADDescriptor(NetVLADOptions(**cfg))
    if name == "hloc_netvlad":
        from gtsfm_tpu.frontend.global_descriptors.descriptors import HlocNetVLADDescriptor

        return HlocNetVLADDescriptor(weights_path=cfg.pop("weights_path", None))
    if name == "megaloc":
        from gtsfm_tpu.frontend.global_descriptors.megaloc import (
            MegaLocDescriptor,
            MegaLocOptions,
        )

        weights_path = cfg.pop("weights_path", None)
        return MegaLocDescriptor(MegaLocOptions(**cfg), weights_path=weights_path)
    raise ValueError(f"Unknown global descriptor: {name!r}")


def build_correspondence(cfg: Optional[dict]):
    """cfg: {name: detdesc|loftr|mast3r|colmap, ...}. Returns None for
    detdesc (the detector/matcher path) or a direct image-correspondence
    generator with generate(images, pairs) -> {(i1, i2): (uv1, uv2)} —
    the reference's correspondence_generator swap (runner.py:202-311,
    image/mast3r/colmap correspondence generators)."""
    cfg = dict(cfg or {})
    name = cfg.pop("name", "detdesc")
    if name == "detdesc":
        return None
    if name == "loftr":
        # exact kornia-layout LoFTR (matchers/loftr.py); official
        # outdoor_ds.ckpt / indoor_ds_new.ckpt load via weights_path
        from gtsfm_tpu.frontend.correspondence import DenseCorrespondenceGenerator
        from gtsfm_tpu.frontend.matchers.loftr import (
            LoFTRMatcher,
            LoFTROptions,
            load_torch_weights,
        )

        weights_path = cfg.pop("weights_path", None)
        opts = LoFTROptions(**cfg)
        params = None
        if weights_path:
            params = load_torch_weights(weights_path, opts)["params"]
        return DenseCorrespondenceGenerator(LoFTRMatcher(opts, params=params))
    if name == "loftr_compact":
        # the lightweight LoFTR-class net (matchers/dense_matcher.py) —
        # cheap shape-testing variant, not checkpoint-loadable
        from gtsfm_tpu.frontend.correspondence import DenseCorrespondenceGenerator
        from gtsfm_tpu.frontend.matchers.dense_matcher import (
            DenseImageMatcher,
            DenseMatcherOptions,
        )

        cfg.pop("weights_path", None)  # trained pytrees load via params=
        matcher = DenseImageMatcher(DenseMatcherOptions(**cfg))
        return DenseCorrespondenceGenerator(matcher)
    if name == "mast3r":
        from gtsfm_tpu.frontend.mast3r import Mast3rCorrespondenceGenerator, MASt3ROptions

        weights_path = cfg.pop("weights_path", None)
        return Mast3rCorrespondenceGenerator(
            MASt3ROptions(**cfg), weights_path=weights_path
        )
    if name == "colmap":
        from gtsfm_tpu.frontend.correspondence import ColmapCorrespondenceGenerator

        gen = ColmapCorrespondenceGenerator(
            cfg.pop("colmap_dir"), binary=cfg.pop("binary", False)
        )

        class _IgnoreImages:
            def __init__(self, g):
                self.g = g

            def generate(self, images, pairs):
                return self.g.generate(pairs)

        return _IgnoreImages(gen)
    if name == "synthetic":
        # noise-free correspondences from GT geometry — back-end validation
        # through the production path (synthetic_correspondence_generator.py
        # :36 + configs/synthetic_front_end.yaml parity); the scene
        # optimizer routes it via its requires_gt marker
        from gtsfm_tpu.frontend.synthetic import (
            SyntheticCorrespondenceGenerator,
            SyntheticOptions,
        )

        return SyntheticCorrespondenceGenerator(SyntheticOptions(**cfg))
    raise ValueError(f"Unknown correspondence generator: {name!r}")
