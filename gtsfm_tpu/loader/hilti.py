"""Hilti SLAM multi-camera rig loader.

Parity: /root/reference/gtsfm/loader/hilti_loader.py:322 (5-camera rig,
Kalibr camchain calibration YAMLs, hard intra-rig constraints consumed by
RigBundleAdjustmentOptimizer / rig 1DSfM).

Image index convention (matches the reference): image i belongs to rig
timestamp i // cams_per_rig and physical camera i % cams_per_rig. The
loader exposes get_rig_constraints() -> (rel_edges, rel_meas, rel_weight)
feeding BundleAdjustment's between-factors.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from gtsfm_tpu.geometry import SE3, Cal3_S2
from gtsfm_tpu.loader.base import LoaderBase, read_image


def _load_camchain(calib_dir: str) -> dict:
    """Parse Kalibr camchain YAMLs -> {cam_idx: (T_cam_imu 4x4, intrinsics,
    resolution)}. Camera numbering follows the file naming (cam0-1, cam2..)."""
    cams = {}
    next_idx = 0
    for path in sorted(glob.glob(os.path.join(calib_dir, "*camchain-imucam.yaml"))):
        with open(path) as f:
            chain = yaml.safe_load(f)
        for key in sorted(chain.keys()):
            c = chain[key]
            T = np.asarray(c["T_cam_imu"], np.float64)
            intr = c.get("intrinsics")
            res = c.get("resolution", [1440, 1080])
            cams[next_idx] = (T, intr, res)
            next_idx += 1
    return cams


class HiltiLoader(LoaderBase):
    def __init__(
        self,
        base_folder: str,
        max_resolution: int = 760,
        max_frames: Optional[int] = None,
        cams_per_rig: Optional[int] = None,
    ):
        super().__init__(max_resolution=max_resolution)
        self.base_folder = base_folder
        paths = glob.glob(os.path.join(base_folder, "images", "*.jpg"))
        # numeric sort (0.jpg, 1.jpg, ...)
        self._image_paths = sorted(
            paths, key=lambda p: int(os.path.splitext(os.path.basename(p))[0])
        )
        if max_frames:
            self._image_paths = self._image_paths[: max_frames]
        self._calib = _load_camchain(os.path.join(base_folder, "calibration"))
        self.cams_per_rig = cams_per_rig or max(len(self._calib), 1)

    def __len__(self) -> int:
        return len(self._image_paths)

    def rig_index(self, index: int) -> int:
        return index // self.cams_per_rig

    def camera_index(self, index: int) -> int:
        return index % self.cams_per_rig

    def _get_image_full_res(self, index: int):
        return read_image(self._image_paths[index])

    def _get_intrinsics_full_res(self, index: int):
        cam = self._calib.get(self.camera_index(index))
        if cam is None or cam[1] is None:
            return None
        fx, fy, cx, cy = cam[1][:4]
        return Cal3_S2.create(float(fx), float(fy), 0.0, float(cx), float(cy))

    def get_camera_pose(self, index: int):
        return None  # no GT world poses; rig relatives come from calibration

    # ---- rig constraints ---------------------------------------------------
    def relative_pose_in_rig(self, cam_a: int, cam_b: int) -> SE3:
        """bTa between two physical cameras from T_cam_imu chains:
        bTa = (T_b_imu) (T_a_imu)^-1 as cam_b <- imu <- cam_a."""
        Ta = self._calib[cam_a][0]  # T_cam_imu: imu -> cam
        Tb = self._calib[cam_b][0]
        M = Tb @ np.linalg.inv(Ta)
        return SE3(R=jnp.asarray(M[:3, :3], jnp.float32), t=jnp.asarray(M[:3, 3], jnp.float32))

    def get_rig_constraints(self, weight: float = 1e4):
        """Hard intra-rig between-factors for every image pair sharing a rig
        timestamp: (rel_edges (F, 2), rel_meas SE3 [F], rel_weight (F,)).

        Convention matches BundleAdjustment.rel_*: residual uses measured
        bTa with edge (a, b)."""
        edges, Rs, ts = [], [], []
        n = len(self)
        for i in range(n):
            for j in range(i + 1, n):
                if self.rig_index(i) != self.rig_index(j):
                    continue
                rel = self.relative_pose_in_rig(self.camera_index(i), self.camera_index(j))
                # rel = (cam_j)T(cam_i) = bTa with a=i, b=j
                edges.append((i, j))
                Rs.append(np.asarray(rel.R))
                ts.append(np.asarray(rel.t))
        if not edges:
            return (
                np.zeros((1, 2), np.int32),
                SE3.identity((1,)),
                np.zeros(1, np.float32),
            )
        return (
            np.asarray(edges, np.int32),
            SE3(R=jnp.asarray(np.stack(Rs)), t=jnp.asarray(np.stack(ts))),
            np.full(len(edges), weight, np.float32),
        )
