"""Pinhole camera = SE3 pose (wTc) + calibration model.

Parity: gtsam PinholeCameraCal3* as used by the reference's GtsfmData and BA
(/root/reference/gtsfm/common/types.py, bundle/bundle_adjustment.py).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from gtsfm_tpu.geometry.se3 import SE3


@struct.dataclass
class PinholeCamera:
    """Camera with pose wTc (camera-to-world) and a calibration pytree.

    Batchable: stack poses/calibrations along leading dims and vmap.
    """

    pose: SE3  # wTc
    cal: object  # one of geometry.calibration models (pytree)

    def project(self, p_world: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """World point(s) (..., 3) -> (pixels (..., 2), depth (...)).

        Depth is the z coordinate in the camera frame; points behind the
        camera have negative depth (caller masks them — no exceptions in
        jit-land, unlike gtsam's CheiralityException).
        """
        p_cam = self.pose.transform_to(p_world)
        z = p_cam[..., 2]
        z_safe = jnp.where(jnp.abs(z) < 1e-9, jnp.full_like(z, 1e-9), z)
        p_intrinsic = p_cam[..., :2] / z_safe[..., None]
        return self.cal.uncalibrate(p_intrinsic), z

    def backproject(self, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
        """Pixel + depth -> world point."""
        p_intr = self.cal.calibrate(uv)
        ones = jnp.ones(p_intr.shape[:-1] + (1,), dtype=p_intr.dtype)
        ray = jnp.concatenate([p_intr, ones], axis=-1) * depth[..., None]
        return self.pose.transform(ray)

    def center(self) -> jnp.ndarray:
        return self.pose.t

    def reprojection_error(self, p_world: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
        """Euclidean pixel reprojection error (...)."""
        proj, _ = self.project(p_world)
        return jnp.linalg.norm(proj - uv, axis=-1)
