"""SfmData — the central scene container, as a padded struct-of-arrays pytree.

Parity: /root/reference/gtsfm/common/gtsfm_data.py:75 (GtsfmData), re-designed
TPU-first. Where GtsfmData keeps dict[int, Camera] and a list of gtsam
SfmTracks, SfmData keeps dense padded arrays + validity masks so the whole
scene flows through jit/vmap/pjit and feeds bundle adjustment directly:

  poses       SE3 [N]         camera poses wTi (identity where absent)
  cal         calibration [N] batched (single model type per scene)
  pose_mask   bool [N]        camera i present
  points      f32 [T, 3]      track 3D points
  track_mask  bool [T]        track alive
  meas_cam    i32 [M]         measurement -> camera index
  meas_track  i32 [M]         measurement -> track index
  meas_uv     f32 [M, 2]      observed pixel
  meas_mask   bool [M]        measurement alive

Filtering = mask updates (device, O(M)); compaction/merge/io = host numpy.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gtsfm_tpu.geometry import SE3, Cal3Bundler, PinholeCamera
from gtsfm_tpu.geometry.sim3 import Sim3


@dataclasses.dataclass
class SceneMeta:
    """Static (non-pytree) scene metadata."""

    image_names: Optional[list] = None
    image_sizes: Optional[list] = None  # (width, height) per image


@struct.dataclass
class SfmData:
    poses: SE3
    cal: Any
    pose_mask: jnp.ndarray
    points: jnp.ndarray
    track_mask: jnp.ndarray
    meas_cam: jnp.ndarray
    meas_track: jnp.ndarray
    meas_uv: jnp.ndarray
    meas_mask: jnp.ndarray
    meta: SceneMeta = struct.field(pytree_node=False, default=None)

    # ---- shape properties --------------------------------------------------
    @property
    def max_cameras(self) -> int:
        return self.pose_mask.shape[0]

    @property
    def max_tracks(self) -> int:
        return self.track_mask.shape[0]

    @property
    def max_measurements(self) -> int:
        return self.meas_mask.shape[0]

    def number_images(self) -> int:
        return int(jnp.sum(self.pose_mask))

    def number_tracks(self) -> int:
        return int(jnp.sum(self.track_mask))

    def number_measurements(self) -> int:
        return int(jnp.sum(self.meas_mask))

    def cameras(self) -> PinholeCamera:
        return PinholeCamera(pose=self.poses, cal=self.cal)

    # ---- device-side computations -----------------------------------------
    def track_lengths(self) -> jnp.ndarray:
        """Valid measurement count per track: i32[T]."""
        ones = self.meas_mask.astype(jnp.int32)
        return jax.ops.segment_sum(ones, self.meas_track, num_segments=self.max_tracks)

    def reprojection_errors(self) -> jnp.ndarray:
        """Per-measurement pixel reprojection error f32[M] (inf at invalid /
        behind-camera measurements).

        Parity: gtsfm_data.py:758-837 reprojection stats.
        """
        cam = jax.tree.map(lambda a: a[self.meas_cam], self.cameras())
        pts = self.points[self.meas_track]
        uv, depth = cam.project(pts)
        err = jnp.linalg.norm(uv - self.meas_uv, axis=-1)
        bad = (~self.meas_mask) | (depth <= 0)
        return jnp.where(bad, jnp.inf, err)

    def filter_by_reprojection_error(self, thresh: float, min_track_len: int = 2) -> "SfmData":
        """Mask out measurements with error > thresh (or behind camera), then
        kill tracks with < min_track_len surviving measurements.

        Parity: GtsfmData.filter_landmark_measurements / filter_landmarks
        (gtsfm_data.py:854-931); pure mask update, jit-safe.
        """
        err = self.reprojection_errors()
        new_meas_mask = self.meas_mask & (err <= thresh)
        counts = jax.ops.segment_sum(
            new_meas_mask.astype(jnp.int32), self.meas_track, num_segments=self.max_tracks
        )
        new_track_mask = self.track_mask & (counts >= min_track_len)
        final_meas_mask = new_meas_mask & new_track_mask[self.meas_track]
        return self.replace(meas_mask=final_meas_mask, track_mask=new_track_mask)

    def filter_by_track_length(self, min_track_len: int) -> "SfmData":
        counts = self.track_lengths()
        new_track_mask = self.track_mask & (counts >= min_track_len)
        return self.replace(
            track_mask=new_track_mask,
            meas_mask=self.meas_mask & new_track_mask[self.meas_track],
        )

    def transform(self, sim: Sim3) -> "SfmData":
        """Apply a Sim3 to the whole scene (poses + points).

        Parity: GtsfmData.transform_with_sim3 (gtsfm_data.py:982).
        """
        return self.replace(
            poses=sim.transform_pose(self.poses),
            points=sim.transform(self.points),
        )

    def track_length_stats(self) -> tuple:
        """(mean, median) track length over valid tracks."""
        lengths = np.asarray(self.track_lengths())
        mask = np.asarray(self.track_mask)
        vals = lengths[mask]
        if vals.size == 0:
            return 0.0, 0.0
        return float(np.mean(vals)), float(np.median(vals))

    # ---- host-side ops -----------------------------------------------------
    def compact(self) -> "SfmData":
        """Drop masked-out cameras? No — camera indexing is positional and
        shared with loaders, so cameras stay. Compacts tracks/measurements
        to minimal padding (host)."""
        tm = np.asarray(self.track_mask)
        mm_ = np.asarray(self.meas_mask)
        track_old2new = np.cumsum(tm) - 1
        keep_meas = mm_ & tm[np.asarray(self.meas_track)]
        n_tracks = int(tm.sum())
        n_meas = int(keep_meas.sum())
        return SfmData(
            poses=self.poses,
            cal=self.cal,
            pose_mask=self.pose_mask,
            points=jnp.asarray(np.asarray(self.points)[tm]),
            track_mask=jnp.ones(n_tracks, bool),
            meas_cam=jnp.asarray(np.asarray(self.meas_cam)[keep_meas]),
            meas_track=jnp.asarray(track_old2new[np.asarray(self.meas_track)[keep_meas]]),
            meas_uv=jnp.asarray(np.asarray(self.meas_uv)[keep_meas]),
            meas_mask=jnp.ones(n_meas, bool),
            meta=self.meta,
        )

    def select_largest_connected_component(self) -> "SfmData":
        """Keep only cameras in the largest camera-connectivity component,
        where two cameras connect if they co-observe a track.

        Parity: GtsfmData.select_largest_connected_component
        (gtsfm_data.py:649). Host-side union-find.
        """
        n = self.max_cameras
        parent = np.arange(n)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        meas_cam = np.asarray(self.meas_cam)
        meas_track = np.asarray(self.meas_track)
        mm_ = np.asarray(self.meas_mask)
        # union consecutive cameras within each track
        order = np.argsort(meas_track[mm_], kind="stable")
        cams = meas_cam[mm_][order]
        tracks = meas_track[mm_][order]
        for i in range(1, len(cams)):
            if tracks[i] == tracks[i - 1]:
                ra, rb = find(cams[i]), find(cams[i - 1])
                if ra != rb:
                    parent[ra] = rb
        pose_mask = np.asarray(self.pose_mask)
        roots = np.array([find(i) if pose_mask[i] else -1 for i in range(n)])
        valid_roots = roots[roots >= 0]
        if valid_roots.size == 0:
            return self
        best = np.bincount(valid_roots).argmax()
        keep_cam = (roots == best) & pose_mask
        keep_meas = mm_ & keep_cam[meas_cam]
        counts = np.zeros(self.max_tracks, np.int32)
        np.add.at(counts, meas_track[keep_meas], 1)
        keep_track = np.asarray(self.track_mask) & (counts >= 2)
        keep_meas = keep_meas & keep_track[meas_track]
        return self.replace(
            pose_mask=jnp.asarray(keep_cam),
            track_mask=jnp.asarray(keep_track),
            meas_mask=jnp.asarray(keep_meas),
        )

    def downsample(self, max_tracks: int, seed: int = 0) -> "SfmData":
        """Random track subset (host). Parity: GtsfmData.downsample
        (gtsfm_data.py:1060) — used to bound export/visualization sizes."""
        tm = np.asarray(self.track_mask)
        alive = np.nonzero(tm)[0]
        if len(alive) <= max_tracks:
            return self
        keep_idx = np.random.default_rng(seed).permutation(alive)[:max_tracks]
        keep = np.zeros(self.max_tracks, bool)
        keep[keep_idx] = True
        return self.replace(
            track_mask=jnp.asarray(keep),
            meas_mask=self.meas_mask & jnp.asarray(keep)[self.meas_track],
        )

    # ---- constructors ------------------------------------------------------
    @classmethod
    def from_cameras_and_tracks(
        cls,
        poses: SE3,
        cal,
        tracks: Sequence,
        num_cameras: Optional[int] = None,
        pose_mask: Optional[np.ndarray] = None,
        meta: Optional[SceneMeta] = None,
        pad_tracks_to: Optional[int] = None,
        pad_meas_to: Optional[int] = None,
    ) -> "SfmData":
        """Host-side builder.

        tracks: sequence of (point_xyz, [(cam_idx, uv), ...]).
        """
        n = num_cameras if num_cameras is not None else poses.t.shape[0]
        t = len(tracks)
        pts = np.zeros((max(t, 1), 3), np.float32)
        mc, mt, muv = [], [], []
        for j, (xyz, obs) in enumerate(tracks):
            pts[j] = xyz
            for cam_idx, uv in obs:
                mc.append(cam_idx)
                mt.append(j)
                muv.append(uv)
        m = len(mc)
        T = pad_tracks_to or max(t, 1)
        M = pad_meas_to or max(m, 1)
        assert T >= t and M >= m
        points = np.zeros((T, 3), np.float32)
        points[:t] = pts[:t]
        meas_cam = np.zeros(M, np.int32)
        meas_track = np.zeros(M, np.int32)
        meas_uv = np.zeros((M, 2), np.float32)
        if m:
            meas_cam[:m] = mc
            meas_track[:m] = mt
            meas_uv[:m] = muv
        track_mask = np.arange(T) < t
        meas_mask = np.arange(M) < m
        if pose_mask is None:
            pose_mask = np.ones(n, bool)
        return cls(
            poses=poses,
            cal=cal,
            pose_mask=jnp.asarray(pose_mask),
            points=jnp.asarray(points),
            track_mask=jnp.asarray(track_mask),
            meas_cam=jnp.asarray(meas_cam),
            meas_track=jnp.asarray(meas_track),
            meas_uv=jnp.asarray(meas_uv),
            meas_mask=jnp.asarray(meas_mask),
            meta=meta,
        )

    @classmethod
    def empty(cls, num_cameras: int, meta: Optional[SceneMeta] = None) -> "SfmData":
        n = max(num_cameras, 1)
        return cls(
            poses=SE3.identity((n,)),
            cal=Cal3Bundler.create(jnp.ones(n), jnp.zeros(n), jnp.zeros(n), jnp.zeros(n), jnp.zeros(n)),
            pose_mask=jnp.zeros(n, bool),
            points=jnp.zeros((1, 3), jnp.float32),
            track_mask=jnp.zeros(1, bool),
            meas_cam=jnp.zeros(1, jnp.int32),
            meas_track=jnp.zeros(1, jnp.int32),
            meas_uv=jnp.zeros((1, 2), jnp.float32),
            meas_mask=jnp.zeros(1, bool),
            meta=meta,
        )
