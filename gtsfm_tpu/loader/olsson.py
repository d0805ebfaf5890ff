"""Olsson dataset loader: images/ + data.mat with P matrices.

Parity: /root/reference/gtsfm/loader/olsson_loader.py:22-36 (OlssonLoader).
data.mat holds 3x4 projection matrices P = K [R | t] (world->camera);
K/R/t are recovered by RQ decomposition, poses stored as wTi.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np
import scipy.io
import scipy.linalg

from gtsfm_tpu.geometry import SE3, Cal3Bundler
from gtsfm_tpu.loader.base import LoaderBase, read_image


def _decompose_projection(P: np.ndarray):
    """P = K [R | t] -> (K (3,3, upper-tri, K[2,2]=1), R, t) with det(R)=+1."""
    M = P[:, :3]
    K, R = scipy.linalg.rq(M)
    # enforce positive diagonal of K
    S = np.diag(np.sign(np.diag(K)))
    K = K @ S
    R = S @ R
    if np.linalg.det(R) < 0:
        K = -K  # keep P = K R unchanged... sign flip absorbed below
        R = -R
    K = K / K[2, 2]
    t = np.linalg.solve(K, P[:, 3])
    return K, R, t


class OlssonLoader(LoaderBase):
    def __init__(self, folder: str, max_resolution: int = 760, max_frames: Optional[int] = None):
        super().__init__(max_resolution=max_resolution)
        self.folder = folder
        exts = ("*.JPG", "*.jpg", "*.png", "*.jpeg")
        paths = []
        for e in exts:
            paths += glob.glob(os.path.join(folder, "images", e))
        self._image_paths = sorted(paths)
        if max_frames:
            self._image_paths = self._image_paths[:max_frames]

        self._K = None
        self._wTi = None
        mat_path = os.path.join(folder, "data.mat")
        if os.path.exists(mat_path):
            data = scipy.io.loadmat(mat_path)
            P = data["P"]
            n = min(P.shape[1], len(self._image_paths))
            Ks, Rs, ts = [], [], []
            for i in range(n):
                K, R_cw, t_cw = _decompose_projection(np.asarray(P[0, i], np.float64))
                Ks.append(K)
                # stored pose is cTw; invert to wTi
                Rs.append(R_cw.T)
                ts.append(-R_cw.T @ t_cw)
            self._K = Ks
            self._wTi = [
                SE3(R=jnp.asarray(R, jnp.float32), t=jnp.asarray(t, jnp.float32))
                for R, t in zip(Rs, ts)
            ]

    def __len__(self) -> int:
        return len(self._image_paths)

    def _get_image_full_res(self, index: int):
        return read_image(self._image_paths[index])

    def _get_intrinsics_full_res(self, index: int):
        if self._K is None:
            return None
        K = self._K[index]
        # Olsson K has fx ~ fy, tiny skew: map to Cal3Bundler (f, 0, 0, u0, v0)
        f = 0.5 * (K[0, 0] + K[1, 1])
        return Cal3Bundler.create(float(f), 0.0, 0.0, float(K[0, 2]), float(K[1, 2]))

    def get_camera_pose(self, index: int):
        if self._wTi is None:
            return None
        return self._wTi[index]
