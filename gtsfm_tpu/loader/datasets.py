"""Additional dataset loaders.

Parity: /root/reference/gtsfm/loader/ — AstrovisionLoader (258),
TanksAndTemplesLoader (373), MobilebrickLoader (176), OneDSFMLoader (128),
ArgoverseDatasetLoader (168), YfccImbLoader (181). The 5-camera Hilti rig
loader lives in loader/hilti.py (rig between-factors in bundle/ba.py).
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import SE3, Cal3_S2, Cal3Bundler
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


def _quat_wxyz_to_R(q) -> np.ndarray:
    """Quaternion (w, x, y, z) -> rotation matrix, host-side numpy."""
    w, x, y, z = np.asarray(q, np.float64) / np.linalg.norm(q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


class ArgoverseLoader(LoaderBase):
    """Argoverse v1 tracking logs: one ring camera of a vehicle log.

    Parity: loader/argoverse_dataset_loader.py (stride subsampling, frame
    cap, lookahead-limited pairs, city-frame GT poses re-anchored to the
    first camera). Reads the raw log directory directly (poses/*.json +
    vehicle_calibration_info.json) instead of the argoverse SDK.
    """

    FRAME_RATE = 30  # ring camera Hz (argoverse_dataset_loader.py:20)

    def __init__(
        self,
        dataset_dir: str,
        log_id: str,
        stride: int = 5,
        max_num_imgs: int = 20,
        max_lookahead_sec: float = 2.0,
        camera_name: str = "ring_front_center",
        max_resolution: int = 760,
    ):
        super().__init__(max_resolution=max_resolution)
        log_dir = os.path.join(dataset_dir, log_id)
        self._log_dir = log_dir
        self._camera_name = camera_name
        self._max_lookahead = max_lookahead_sec * self.FRAME_RATE / stride

        # calibration: intrinsics + egovehicle_SE3_camera for this camera
        import json

        with open(os.path.join(log_dir, "vehicle_calibration_info.json")) as f:
            calib = json.load(f)
        cam = next(
            c["value"] for c in calib["camera_data_"]
            if c["key"] == f"image_raw_{camera_name}"
        )
        fx, fy = cam["focal_length_x_px_"], cam["focal_length_y_px_"]
        assert abs(fx - fy) < 0.1, "argoverse ring cameras have square pixels"
        self._cal = Cal3Bundler.create(
            float(fx), 0.0, 0.0,
            float(cam["focal_center_x_px_"]), float(cam["focal_center_y_px_"]),
        )
        ext = cam["vehicle_SE3_camera_"]
        R_vc = _quat_wxyz_to_R(ext["rotation"]["coefficients"])
        t_vc = np.asarray(ext["translation"], np.float64)
        self._ego_T_cam = (R_vc, t_vc)  # egovehicle_SE3_camera

        # ordered frames; keep only those with a GT egovehicle pose
        img_glob = os.path.join(log_dir, camera_name, f"{camera_name}_*.jpg")
        paths = sorted(glob.glob(img_glob))
        stamps = [int(os.path.splitext(os.path.basename(p))[0].split("_")[-1]) for p in paths]
        keep = [
            (p, ts) for p, ts in zip(paths, stamps)
            if os.path.exists(self._pose_path(ts))
        ]
        keep = keep[::stride][:max_num_imgs]
        self._image_paths = [p for p, _ in keep]
        self._timestamps = [ts for _, ts in keep]

        # anchor the world frame at the first camera (city frame otherwise)
        self._anchor = None
        if self._timestamps:
            R0, t0 = self._city_T_cam(self._timestamps[0])
            self._anchor = (R0.T, -R0.T @ t0)  # cam0_T_city

    def _pose_path(self, ts: int) -> str:
        return os.path.join(self._log_dir, "poses", f"city_SE3_egovehicle_{ts}.json")

    def _city_T_cam(self, ts: int):
        import json

        with open(self._pose_path(ts)) as f:
            d = json.load(f)
        R_ce = _quat_wxyz_to_R(d["rotation"])
        t_ce = np.asarray(d["translation"], np.float64)
        R_vc, t_vc = self._ego_T_cam
        return R_ce @ R_vc, R_ce @ t_vc + t_ce

    def __len__(self):
        return len(self._image_paths)

    def _get_image_full_res(self, index):
        return read_image(self._image_paths[index])

    def _get_intrinsics_full_res(self, index):
        return self._cal

    def get_camera_pose(self, index):
        R, t = self._city_T_cam(self._timestamps[index])
        Ra, ta = self._anchor
        return SE3(
            R=jnp.asarray(Ra @ R, jnp.float32), t=jnp.asarray(Ra @ t + ta, jnp.float32)
        )

    def is_valid_pair(self, idx1: int, idx2: int) -> bool:
        return super().is_valid_pair(idx1, idx2) and (idx2 < idx1 + self._max_lookahead)


class YfccImbLoader(LoaderBase):
    """Image-Matching-Benchmark YFCC scenes.

    Parity: loader/yfcc_imb_loader.py — the pair list comes from the
    benchmark's co-visibility files (new-vis-pairs/keys-th-X.X.npy with
    "name1-name2" entries), per-image calibration from
    calibration/calibration_<name>.h5 (R/T = cTw, K), poses inverted to
    wTi and K under-parameterized to Cal3Bundler with f = (fx + fy) / 2.
    """

    def __init__(
        self,
        dataset_dir: str,
        co_visibility_threshold: float = 0.1,
        max_resolution: int = 760,
    ):
        super().__init__(max_resolution=max_resolution)
        self._dataset_dir = dataset_dir
        vis_file = os.path.join(
            dataset_dir, "new-vis-pairs", f"keys-th-{co_visibility_threshold:0.1f}.npy"
        )
        names = set()
        pairs = set()
        for entry in np.load(vis_file):
            f1, f2 = str(entry).split("-")
            names.update((f1, f2))
            pairs.add((min(f1, f2), max(f1, f2)))
        self._image_names = sorted(names)
        idx = {n: i for i, n in enumerate(self._image_names)}
        self._pairs = {tuple(sorted((idx[a], idx[b]))) for a, b in pairs}
        self._calibrations = [self._read_calibration(n) for n in self._image_names]

    def _read_calibration(self, name: str):
        import h5py

        path = os.path.join(self._dataset_dir, "calibration", f"calibration_{name}.h5")
        with h5py.File(path, "r") as f:
            R_cw = np.asarray(f["R"], np.float64)
            t_cw = np.asarray(f["T"], np.float64).reshape(3)
            K = np.asarray(f["K"], np.float64)
        cal = Cal3Bundler.create(
            float(0.5 * (K[0, 0] + K[1, 1])), 0.0, 0.0, float(K[0, 2]), float(K[1, 2])
        )
        wTi = SE3(
            R=jnp.asarray(R_cw.T, jnp.float32),
            t=jnp.asarray(-R_cw.T @ t_cw, jnp.float32),
        )
        return cal, wTi

    def __len__(self):
        return len(self._image_names)

    def image_filenames(self):
        return list(self._image_names)

    def _get_image_full_res(self, index):
        path = os.path.join(self._dataset_dir, "images", f"{self._image_names[index]}.jpg")
        return read_image(path)

    def _get_intrinsics_full_res(self, index):
        return self._calibrations[index][0]

    def get_camera_pose(self, index):
        return self._calibrations[index][1]

    def is_valid_pair(self, idx1: int, idx2: int) -> bool:
        return super().is_valid_pair(idx1, idx2) and (idx1, idx2) in self._pairs
