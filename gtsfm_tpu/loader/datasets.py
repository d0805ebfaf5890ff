"""Additional dataset loaders.

Parity: /root/reference/gtsfm/loader/ — AstrovisionLoader (258),
TanksAndTemplesLoader (373), MobilebrickLoader (176), OneDSFMLoader (128).
(HiltiLoader's 5-camera rig depends on rig between-factors — next round.)
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import SE3, Cal3_S2
from gtsfm_tpu.io import colmap as colmap_io
from gtsfm_tpu.loader.base import LoaderBase, read_image


class AstrovisionLoader(LoaderBase):
    """AstroVision segments: COLMAP *binary* model + images/.

    Parity: loader/astrovision_loader.py."""

    def __init__(self, data_dir: str, max_resolution: int = 1024, max_frames=None):
        super().__init__(max_resolution=max_resolution)
        self.data_dir = data_dir
        cams = colmap_io.read_cameras_bin(os.path.join(data_dir, "cameras.bin"))
        images = colmap_io.read_images_bin(os.path.join(data_dir, "images.bin"))
        self._records = []
        for im in images:
            path = os.path.join(data_dir, "images", im["name"])
            if os.path.exists(path):
                self._records.append((im, cams.get(im["camera_id"]), path))
        if max_frames:
            self._records = self._records[:max_frames]

    def __len__(self):
        return len(self._records)

    def _get_image_full_res(self, index):
        return read_image(self._records[index][2])

    def _get_intrinsics_full_res(self, index):
        cam = self._records[index][1]
        if cam is None:
            return None
        kwargs, cal_type, _w, _h = cam
        return cal_type.create(**{k: float(v) for k, v in kwargs.items()})

    def get_camera_pose(self, index):
        im = self._records[index][0]
        return SE3(R=jnp.asarray(im["R"], jnp.float32), t=jnp.asarray(im["t"], jnp.float32))


def _read_tnt_log(path: str) -> list:
    """Tanks & Temples .log trajectory: blocks of 'i i 0' + 4x4 wTc."""
    poses = []
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    i = 0
    while i + 4 < len(lines) + 1 and i + 4 <= len(lines):
        M = np.array([lines[i + 1 + r].split() for r in range(4)], np.float64)
        poses.append(M.astype(np.float32))
        i += 5
    return poses


class TanksAndTemplesLoader(LoaderBase):
    """T&T benchmark scene: images dir + COLMAP_SfM.log GT trajectory.

    Parity: loader/tanks_and_temples_loader.py (GT mesh/point-cloud hooks
    feed the synthetic correspondence generator; here exposed via
    gt_scene_path)."""

    def __init__(
        self,
        img_dir: str,
        poses_fpath: str,
        max_resolution: int = 760,
        max_frames=None,
        ply_alignment_fpath: Optional[str] = None,
        gt_scene_path: Optional[str] = None,
    ):
        super().__init__(max_resolution=max_resolution)
        self._image_paths = sorted(
            glob.glob(os.path.join(img_dir, "*.jpg")) + glob.glob(os.path.join(img_dir, "*.png"))
        )
        self._wTc = _read_tnt_log(poses_fpath)
        self.gt_scene_path = gt_scene_path
        n = min(len(self._image_paths), len(self._wTc))
        self._image_paths = self._image_paths[:n]
        self._wTc = self._wTc[:n]
        if max_frames:
            self._image_paths = self._image_paths[:max_frames]
            self._wTc = self._wTc[:max_frames]
        self.alignment = np.eye(4, dtype=np.float32)
        if ply_alignment_fpath and os.path.exists(ply_alignment_fpath):
            self.alignment = np.loadtxt(ply_alignment_fpath).astype(np.float32)

    def __len__(self):
        return len(self._image_paths)

    def _get_image_full_res(self, index):
        return read_image(self._image_paths[index])

    def _get_intrinsics_full_res(self, index):
        return None  # EXIF / default prior

    def get_camera_pose(self, index):
        M = self._wTc[index]
        return SE3(R=jnp.asarray(M[:3, :3]), t=jnp.asarray(M[:3, 3]))


class MobilebrickLoader(LoaderBase):
    """MobileBrick captures: image/ + intrinsic/*.txt (3x3 K) +
    pose/*.txt (4x4 wTc). Parity: loader/mobilebrick_loader.py."""

    def __init__(self, data_dir: str, max_resolution: int = 760, max_frames=None):
        super().__init__(max_resolution=max_resolution)
        self._image_paths = sorted(glob.glob(os.path.join(data_dir, "image", "*.jpg")))
        if max_frames:
            self._image_paths = self._image_paths[:max_frames]
        self.data_dir = data_dir

    def __len__(self):
        return len(self._image_paths)

    def _stem(self, index):
        return os.path.splitext(os.path.basename(self._image_paths[index]))[0]

    def _get_image_full_res(self, index):
        return read_image(self._image_paths[index])

    def _get_intrinsics_full_res(self, index):
        p = os.path.join(self.data_dir, "intrinsic", f"{self._stem(index)}.txt")
        if not os.path.exists(p):
            return None
        K = np.loadtxt(p).astype(np.float32)
        return Cal3_S2.create(
            float(K[0, 0]), float(K[1, 1]), float(K[0, 1]), float(K[0, 2]), float(K[1, 2])
        )

    def get_camera_pose(self, index):
        p = os.path.join(self.data_dir, "pose", f"{self._stem(index)}.txt")
        if not os.path.exists(p):
            return None
        M = np.loadtxt(p).astype(np.float32)  # wTc
        return SE3(R=jnp.asarray(M[:3, :3]), t=jnp.asarray(M[:3, 3]))


class OneDSFMLoader(LoaderBase):
    """1DSfM internet-photo datasets: unordered images with EXIF intrinsics.

    Parity: loader/onedsfm_loader.py (no GT poses; focal from EXIF, images
    without usable EXIF focal are skipped like the reference)."""

    def __init__(self, folder: str, max_resolution: int = 760, max_frames=None,
                 require_exif: bool = False):
        super().__init__(max_resolution=max_resolution)
        img_dir = os.path.join(folder, "images") if os.path.isdir(os.path.join(folder, "images")) else folder
        paths = sorted(glob.glob(os.path.join(img_dir, "*.jpg")) + glob.glob(os.path.join(img_dir, "*.JPG")))
        if require_exif:
            keep = []
            for p in paths:
                try:
                    if read_image(p).focal_length_from_exif():
                        keep.append(p)
                except Exception:
                    pass
            paths = keep
        self._image_paths = paths[:max_frames] if max_frames else paths

    def __len__(self):
        return len(self._image_paths)

    def _get_image_full_res(self, index):
        return read_image(self._image_paths[index])

    def _get_intrinsics_full_res(self, index):
        return None  # EXIF fallback in LoaderBase
