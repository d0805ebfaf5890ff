"""BAL (Bundle Adjustment in the Large) problem file reader.

Parity: GtsfmData.read_bal (/root/reference/gtsfm/common/gtsfm_data.py:190,
which wraps gtsam.readBal). BAL cameras look down -z with projection
p = -P/P.z; we convert to +z-depth convention by conjugating with
F = diag(1,-1,-1) and negating the v measurement, which preserves
reprojection errors exactly.
"""

from __future__ import annotations

import bz2
import gzip

import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import SE3, Cal3Bundler, so3
from gtsfm_tpu.common.sfm_data import SfmData


def read_bal(path: str) -> SfmData:
    opener = open
    if path.endswith(".bz2"):
        opener = bz2.open
    elif path.endswith(".gz"):
        opener = gzip.open
    with opener(path, "rt") as f:
        tokens = f.read().split()
    it = iter(tokens)
    n_cam, n_pts, n_obs = int(next(it)), int(next(it)), int(next(it))
    meas_cam = np.zeros(n_obs, np.int32)
    meas_track = np.zeros(n_obs, np.int32)
    meas_uv = np.zeros((n_obs, 2), np.float32)
    for k in range(n_obs):
        meas_cam[k] = int(next(it))
        meas_track[k] = int(next(it))
        u = float(next(it))
        v = float(next(it))
        meas_uv[k] = (u, -v)  # flip v for +z convention (see module docstring)
    F = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    Rs = np.zeros((n_cam, 3, 3), np.float32)
    ts = np.zeros((n_cam, 3), np.float32)
    fs = np.zeros(n_cam, np.float32)
    k1s = np.zeros(n_cam, np.float32)
    k2s = np.zeros(n_cam, np.float32)
    for i in range(n_cam):
        w = np.array([float(next(it)) for _ in range(3)], np.float32)
        t = np.array([float(next(it)) for _ in range(3)], np.float32)
        fs[i] = float(next(it))
        k1s[i] = float(next(it))
        k2s[i] = float(next(it))
        R_cw = np.asarray(so3.expmap(jnp.asarray(w)))
        R_cw = F @ R_cw
        t_cw = F @ t
        Rs[i] = R_cw.T
        ts[i] = -R_cw.T @ t_cw
    points = np.array([float(next(it)) for _ in range(3 * n_pts)], np.float32).reshape(n_pts, 3)

    return SfmData(
        poses=SE3(R=jnp.asarray(Rs), t=jnp.asarray(ts)),
        cal=Cal3Bundler.create(
            jnp.asarray(fs), jnp.asarray(k1s), jnp.asarray(k2s), jnp.zeros(n_cam), jnp.zeros(n_cam)
        ),
        pose_mask=jnp.ones(n_cam, bool),
        points=jnp.asarray(points),
        track_mask=jnp.ones(n_pts, bool),
        meas_cam=jnp.asarray(meas_cam),
        meas_track=jnp.asarray(meas_track),
        meas_uv=jnp.asarray(meas_uv),
        meas_mask=jnp.ones(n_obs, bool),
    )
