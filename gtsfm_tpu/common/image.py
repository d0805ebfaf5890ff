"""Host-side image container with EXIF-based intrinsics inference.

Parity: /root/reference/gtsfm/common/image.py:19 (Image NamedTuple) and its
EXIF -> intrinsics logic (:43-141). Images live on host as numpy until a
pipeline stage ships a padded batch to HBM, so this is a plain dataclass,
not a pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from gtsfm_tpu.common.sensor_db import SENSOR_WIDTHS_MM

DEFAULT_FOCAL_RATIO = 1.2  # focal ~ 1.2 * max(h, w) when EXIF is absent


@dataclasses.dataclass
class Image:
    value_array: np.ndarray  # (H, W, 3) uint8 or (H, W) grayscale
    exif_data: Optional[dict] = None
    file_name: Optional[str] = None
    mask: Optional[np.ndarray] = None  # (H, W) bool, True = use pixel

    @property
    def height(self) -> int:
        return self.value_array.shape[0]

    @property
    def width(self) -> int:
        return self.value_array.shape[1]

    @property
    def shape(self):
        return self.value_array.shape

    def focal_length_from_exif(self) -> Optional[float]:
        """Estimate focal length in pixels from EXIF, else None.

        Priority (mirrors reference image.py:43-141):
        1. FocalLengthIn35mmFilm: f_px = f35 / 35mm-diag * img-diag
        2. FocalLength + sensor width from the camera-model database
        """
        if not self.exif_data:
            return None
        max_size = max(self.height, self.width)
        f35 = self.exif_data.get("FocalLengthIn35mmFilm")
        if f35 and f35 > 0:
            return float(f35) * np.hypot(self.width, self.height) / np.hypot(36.0, 24.0)
        focal_mm = self.exif_data.get("FocalLength")
        if not focal_mm or focal_mm <= 0:
            return None
        make = (self.exif_data.get("Make") or "").strip().lower()
        model = (self.exif_data.get("Model") or "").strip().lower()
        for key in (f"{make} {model}".strip(), model):
            sensor_mm = SENSOR_WIDTHS_MM.get(key)
            if sensor_mm:
                return float(focal_mm) / sensor_mm * max_size
        return None

    def intrinsics_from_exif(self):
        """Best-effort Cal3Bundler from EXIF; falls back to the
        default-focal-ratio prior. Returns (f, u0, v0)."""
        f = self.focal_length_from_exif()
        if f is None:
            f = DEFAULT_FOCAL_RATIO * max(self.height, self.width)
        return float(f), self.width / 2.0, self.height / 2.0

    def extract_patch(self, x: int, y: int, size: int) -> np.ndarray:
        """Square patch centered at (x, y), zero-padded at borders.

        Parity: reference image.py:173.
        """
        half = size // 2
        h, w = self.height, self.width
        out_shape = (size, size) + self.value_array.shape[2:]
        patch = np.zeros(out_shape, dtype=self.value_array.dtype)
        y0, y1 = max(0, y - half), min(h, y - half + size)
        x0, x1 = max(0, x - half), min(w, x - half + size)
        py0 = y0 - (y - half)
        px0 = x0 - (x - half)
        patch[py0 : py0 + (y1 - y0), px0 : px0 + (x1 - x0)] = self.value_array[y0:y1, x0:x1]
        return patch


def rgb_to_gray(value_array: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luma conversion, float32 in [0, 1]."""
    arr = value_array.astype(np.float32)
    if arr.max() > 1.5:
        arr = arr / 255.0
    if arr.ndim == 2:
        return arr
    return arr[..., 0] * 0.299 + arr[..., 1] * 0.587 + arr[..., 2] * 0.114
