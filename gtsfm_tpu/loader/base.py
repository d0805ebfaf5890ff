"""Loader base: image access with resolution capping + intrinsics rescale.

Parity: /root/reference/gtsfm/loader/loader_base.py:34 (LoaderBase:
get_image/get_camera_intrinsics/get_camera_pose with joint resolution-
capped rescaling :160-258, EXIF-fallback intrinsics, GT access, batched
padded tensor loading for the retriever :393-517).

TPU-first: loaders are host-side IO; the device-facing products are padded
grayscale batches (load_image_batch) and batched calibrations.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from gtsfm_tpu.common.image import Image, rgb_to_gray
from gtsfm_tpu.geometry import SE3, Cal3Bundler

try:  # PIL for JPEG IO (host-side only)
    from PIL import Image as PILImage
    from PIL.ExifTags import TAGS

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False


def read_image(path: str) -> Image:
    """Read an image file with EXIF."""
    if not _HAS_PIL:
        raise RuntimeError("PIL unavailable")
    im = PILImage.open(path)
    exif = {}
    raw = getattr(im, "getexif", lambda: None)()
    if raw:
        for tag_id, value in raw.items():
            tag = TAGS.get(tag_id, tag_id)
            exif[tag] = value
        # merge the Exif IFD (FocalLength etc. live there)
        try:
            ifd = raw.get_ifd(0x8769)
            for tag_id, value in ifd.items():
                exif[TAGS.get(tag_id, tag_id)] = value
        except Exception:
            pass
    arr = np.asarray(im.convert("RGB"))
    return Image(value_array=arr, exif_data=exif, file_name=os.path.basename(path))


def _resize(arr: np.ndarray, new_h: int, new_w: int) -> np.ndarray:
    if not _HAS_PIL:
        raise RuntimeError("PIL unavailable")
    return np.asarray(PILImage.fromarray(arr).resize((new_w, new_h), PILImage.BILINEAR))


class LoaderBase:
    """Subclasses implement __len__, _get_image_full_res(i),
    _get_intrinsics_full_res(i), get_camera_pose(i)."""

    def __init__(self, max_resolution: int = 760):
        self.max_resolution = max_resolution
        self._scale_cache: dict = {}

    # ---- abstract ----------------------------------------------------------
    def __len__(self) -> int:
        raise NotImplementedError

    def _get_image_full_res(self, index: int) -> Image:
        raise NotImplementedError

    def _get_intrinsics_full_res(self, index: int):
        raise NotImplementedError

    def get_camera_pose(self, index: int) -> Optional[SE3]:
        """GT pose wTi if known, else None."""
        return None

    def is_valid_pair(self, idx1: int, idx2: int) -> bool:
        """Whether (idx1, idx2), idx1 < idx2, may be matched. Loaders with
        temporal ordering or benchmark pair lists restrict this (parity:
        loader_base.is_valid_pair / valid-pair enumeration :600)."""
        return 0 <= idx1 < idx2 < len(self)

    def valid_pairs(self) -> np.ndarray:
        """All loader-valid (i, j) pairs as an (E, 2) int array."""
        n = len(self)
        return np.array(
            [(i, j) for i in range(n) for j in range(i + 1, n) if self.is_valid_pair(i, j)],
            np.int32,
        ).reshape(-1, 2)

    # ---- resolution-capped access -----------------------------------------
    def _scale_for(self, index: int, h: int, w: int) -> float:
        """Downscale factor so the short side <= max_resolution (mirrors the
        reference's target-resolution logic, loader_base.py:160-258)."""
        short = min(h, w)
        if short <= self.max_resolution:
            return 1.0
        return self.max_resolution / short

    def get_image(self, index: int) -> Image:
        img = self._get_image_full_res(index)
        s = self._scale_for(index, img.height, img.width)
        self._scale_cache[index] = s
        if s == 1.0:
            return img
        new_h, new_w = int(round(img.height * s)), int(round(img.width * s))
        arr = _resize(img.value_array, new_h, new_w)
        return Image(value_array=arr, exif_data=img.exif_data, file_name=img.file_name)

    def get_camera_intrinsics(self, index: int):
        cal = self._get_intrinsics_full_res(index)
        if cal is None:
            img = self._get_image_full_res(index)
            f, u0, v0 = img.intrinsics_from_exif()
            cal = Cal3Bundler.create(f, 0.0, 0.0, u0, v0)
        s = self._scale_cache.get(index)
        if s is None:
            img = self._get_image_full_res(index)
            s = self._scale_for(index, img.height, img.width)
            self._scale_cache[index] = s
        if s == 1.0:
            return cal
        return _rescale_cal(cal, s)

    # ---- batched products for the device pipeline -------------------------
    def load_grayscale_batch(self, indices=None, pad_to: Optional[tuple] = None):
        """-> (images f32 (B, H, W) in [0,1], (orig_h, orig_w) list).

        All images resized/padded to a common (H, W) for the batched
        detector. Parity: loader_base.load_image_batch (:393-517)."""
        if indices is None:
            indices = range(len(self))
        imgs = [self.get_image(i) for i in indices]
        grays = [rgb_to_gray(im.value_array) for im in imgs]
        sizes = [(g.shape[0], g.shape[1]) for g in grays]
        H = max(s[0] for s in sizes)
        W = max(s[1] for s in sizes)
        if pad_to is not None:
            H, W = max(H, pad_to[0]), max(W, pad_to[1])
        batch = np.zeros((len(grays), H, W), np.float32)
        for b, g in enumerate(grays):
            batch[b, : g.shape[0], : g.shape[1]] = g
        return batch, sizes

    def get_all_intrinsics(self):
        return [self.get_camera_intrinsics(i) for i in range(len(self))]

    def get_gt_poses(self):
        poses = [self.get_camera_pose(i) for i in range(len(self))]
        if any(p is None for p in poses):
            return None
        import jax.numpy as jnp

        return SE3(
            R=jnp.stack([p.R for p in poses]),
            t=jnp.stack([p.t for p in poses]),
        )

    def image_filenames(self):
        return [self._get_image_full_res(i).file_name for i in range(len(self))]


def _rescale_cal(cal, s: float):
    """Scale calibration for image downscaling by factor s."""
    from gtsfm_tpu.geometry import Cal3Bundler as CB, Cal3_S2 as CS2, Cal3DS2 as CDS2, Cal3Fisheye as CF

    if isinstance(cal, CB):
        return cal.replace(f=cal.f * s, u0=cal.u0 * s, v0=cal.v0 * s)
    if isinstance(cal, (CS2, CDS2, CF)):
        return cal.replace(fx=cal.fx * s, fy=cal.fy * s, s=cal.s * s, u0=cal.u0 * s, v0=cal.v0 * s)
    raise ValueError(type(cal))


def batch_calibrations(cals):
    """Stack per-image calibrations (same type) into one batched pytree."""
    import jax
    import jax.numpy as jnp

    t0 = type(cals[0])
    assert all(type(c) is t0 for c in cals), "mixed calibration types"
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *cals)
