"""Classical OpenCV detector/descriptor wrappers (host-side components).

Parity: /root/reference/gtsfm/frontend/detector_descriptor/{sift,orb,brisk,
kaze}.py — the reference itself wraps OpenCV for its classical baselines,
so these wrappers are the like-for-like components. The TPU-native path
remains detectors.dog_sift (pure JAX); these exist for baseline comparisons
and datasets where OpenCV SIFT's exact behavior matters.

Outputs use the framework's padded Keypoints + descriptor currency.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.common.keypoints import Keypoints

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


class OpenCVDetectorOptions(NamedTuple):
    max_keypoints: int = 2048
    kind: str = "sift"  # sift | root_sift | orb | brisk | kaze


def _make(kind: str, max_kp: int):
    if kind in ("sift", "root_sift"):
        return cv2.SIFT_create(nfeatures=max_kp)
    if kind == "orb":
        return cv2.ORB_create(nfeatures=max_kp)
    if kind == "brisk":
        return cv2.BRISK_create()
    if kind == "kaze":
        return cv2.KAZE_create()
    raise ValueError(kind)


class OpenCVDetectorDescriptor:
    """detect_and_describe(image (H, W) float [0,1]) -> (Keypoints, desc)."""

    def __init__(self, options: OpenCVDetectorOptions = OpenCVDetectorOptions()):
        if not _HAS_CV2:
            raise RuntimeError("OpenCV unavailable")
        self.options = options
        self._det = _make(options.kind, options.max_keypoints)

    def __call__(self, image):
        img8 = (np.asarray(image) * 255).clip(0, 255).astype(np.uint8)
        kps, desc = self._det.detectAndCompute(img8, None)
        K = self.options.max_keypoints
        coords = np.zeros((K, 2), np.float32)
        scales = np.zeros(K, np.float32)
        resp = np.zeros(K, np.float32)
        mask = np.zeros(K, bool)
        if desc is None:
            desc = np.zeros((0, 128), np.float32)
        order = np.argsort([-k.response for k in kps])[:K]
        D = desc.shape[1] if len(desc) else 128
        out_desc = np.zeros((K, D), np.float32)
        for i, j in enumerate(order):
            k = kps[j]
            coords[i] = k.pt
            scales[i] = k.size
            resp[i] = k.response
            mask[i] = True
            d = desc[j].astype(np.float32)
            if self.options.kind == "root_sift":
                d = np.sqrt(d / max(d.sum(), 1e-9))  # RootSIFT (Hellinger)
            n = np.linalg.norm(d)
            out_desc[i] = d / max(n, 1e-9)
        return (
            Keypoints(
                coordinates=jnp.asarray(coords),
                scales=jnp.asarray(scales),
                responses=jnp.asarray(resp),
                mask=jnp.asarray(mask),
            ),
            jnp.asarray(out_desc),
        )


class CombinationOptions(NamedTuple):
    max_keypoints: int = 2048
    detector: str = "fast"  # fast | gftt | dog (SIFT's detector)
    descriptor: str = "sift"  # sift | root_sift | orb


class CombinationDetectorDescriptor:
    """Mix-and-match: detector X's keypoints described by descriptor Y
    (parity: frontend/detector_descriptor/combination_detector_descriptor
    .py + the separate detector/ (DoG, FAST) and descriptor/ (SIFT,
    RootSIFT) module families)."""

    def __init__(self, options: CombinationOptions = CombinationOptions()):
        if not _HAS_CV2:
            raise RuntimeError("OpenCV unavailable")
        self.options = options
        o = options
        if o.detector == "fast":
            self._det = cv2.FastFeatureDetector_create()
        elif o.detector == "gftt":
            self._det = cv2.GFTTDetector_create(maxCorners=o.max_keypoints)
        elif o.detector == "dog":
            self._det = cv2.SIFT_create(nfeatures=o.max_keypoints)
        else:
            raise ValueError(o.detector)
        if o.descriptor in ("sift", "root_sift"):
            self._desc = cv2.SIFT_create()
        elif o.descriptor == "orb":
            self._desc = cv2.ORB_create()
        else:
            raise ValueError(o.descriptor)

    def __call__(self, image):
        o = self.options
        img8 = (np.asarray(image) * 255).clip(0, 255).astype(np.uint8)
        kps = self._det.detect(img8, None)
        # descriptors need scale/orientation fields FAST doesn't set
        for k in kps:
            if k.size <= 0:
                k.size = 7.0
        kps, desc = self._desc.compute(img8, kps)
        K = o.max_keypoints
        coords = np.zeros((K, 2), np.float32)
        scales = np.zeros(K, np.float32)
        resp = np.zeros(K, np.float32)
        mask = np.zeros(K, bool)
        if desc is None or len(kps) == 0:
            desc = np.zeros((0, 128), np.float32)
            kps = []
        order = np.argsort([-k.response for k in kps])[:K]
        D = desc.shape[1] if len(desc) else 128
        out_desc = np.zeros((K, D), np.float32)
        for i, j in enumerate(order):
            k = kps[j]
            coords[i] = k.pt
            scales[i] = k.size
            resp[i] = k.response
            mask[i] = True
            d = desc[j].astype(np.float32)
            if o.descriptor == "root_sift":
                d = np.sqrt(d / max(d.sum(), 1e-9))
            out_desc[i] = d / max(np.linalg.norm(d), 1e-9)
        return (
            Keypoints(
                coordinates=jnp.asarray(coords),
                scales=jnp.asarray(scales),
                responses=jnp.asarray(resp),
                mask=jnp.asarray(mask),
            ),
            jnp.asarray(out_desc),
        )
