"""COLMAP-export loader: cameras.txt/images.txt (GT) + images directory.

Parity: /root/reference/gtsfm/loader/colmap_loader.py:19-38 (ColmapLoader).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import SE3
from gtsfm_tpu.io import colmap as colmap_io
from gtsfm_tpu.loader.base import LoaderBase, read_image


class ColmapLoader(LoaderBase):
    def __init__(
        self,
        colmap_files_dirpath: str,
        images_dir: str,
        max_resolution: int = 760,
        use_gt_intrinsics: bool = True,
        max_frames: Optional[int] = None,
    ):
        super().__init__(max_resolution=max_resolution)
        self.images_dir = images_dir
        self.use_gt_intrinsics = use_gt_intrinsics
        cams = colmap_io.read_cameras_txt(os.path.join(colmap_files_dirpath, "cameras.txt"))
        images = colmap_io.read_images_txt(os.path.join(colmap_files_dirpath, "images.txt"))
        # keep only images present on disk; sorted by name (read_images_txt sorts)
        self._records = []
        for im in images:
            path = os.path.join(images_dir, im["name"])
            if os.path.exists(path):
                self._records.append((im, cams.get(im["camera_id"]), path))
        if max_frames:
            self._records = self._records[:max_frames]

    def __len__(self) -> int:
        return len(self._records)

    def _get_image_full_res(self, index: int):
        return read_image(self._records[index][2])

    def _get_intrinsics_full_res(self, index: int):
        if not self.use_gt_intrinsics:
            return None
        cam = self._records[index][1]
        if cam is None:
            return None
        kwargs, cal_type, _w, _h = cam
        return cal_type.create(**{k: float(v) for k, v in kwargs.items()})

    def get_camera_pose(self, index: int):
        im = self._records[index][0]
        return SE3(R=jnp.asarray(im["R"], jnp.float32), t=jnp.asarray(im["t"], jnp.float32))
