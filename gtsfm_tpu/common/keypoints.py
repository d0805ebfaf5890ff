"""Keypoints container.

Parity: /root/reference/gtsfm/common/keypoints.py:15 (Keypoints class), but
as a flax pytree with an explicit validity mask so fixed-size padded batches
of per-image keypoints flow straight through jit/vmap/pjit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Keypoints:
    """2D detections for one image (or a padded batch of images).

    coordinates: (..., K, 2) (x=col, y=row, pixel units)
    scales:      (..., K) detection scale (0 where unknown)
    responses:   (..., K) detection confidence (0 where unknown)
    mask:        (..., K) True for valid entries (padding is False)
    """

    coordinates: jnp.ndarray
    scales: jnp.ndarray
    responses: jnp.ndarray
    mask: jnp.ndarray

    @classmethod
    def create(cls, coordinates, scales=None, responses=None, mask=None) -> "Keypoints":
        coordinates = jnp.asarray(coordinates, jnp.float32)
        k = coordinates.shape[-2]
        batch = coordinates.shape[:-2]
        if scales is None:
            scales = jnp.zeros(batch + (k,), jnp.float32)
        if responses is None:
            responses = jnp.zeros(batch + (k,), jnp.float32)
        if mask is None:
            mask = jnp.ones(batch + (k,), dtype=bool)
        return cls(
            coordinates=coordinates,
            scales=jnp.asarray(scales, jnp.float32),
            responses=jnp.asarray(responses, jnp.float32),
            mask=jnp.asarray(mask, bool),
        )

    def __len__(self) -> int:
        return int(np.sum(np.asarray(self.mask)))

    @property
    def max_keypoints(self) -> int:
        return self.coordinates.shape[-2]

    def get_top_k(self, k: int) -> "Keypoints":
        """Keep the k highest-response valid keypoints (padded to k).

        Parity: reference Keypoints.get_top_k (keypoints.py:89).
        """
        score = jnp.where(self.mask, self.responses, -jnp.inf)
        idx = jnp.argsort(-score, axis=-1)[..., :k]
        take = lambda a: jnp.take_along_axis(a, idx, axis=-1)
        return Keypoints(
            coordinates=jnp.take_along_axis(self.coordinates, idx[..., None], axis=-2),
            scales=take(self.scales),
            responses=take(self.responses),
            mask=take(self.mask),
        )

    def filter_by_mask(self, keep: jnp.ndarray) -> "Keypoints":
        """AND an extra validity mask in (no compaction — stays padded)."""
        return self.replace(mask=self.mask & keep)

    def extract(self, indices: jnp.ndarray) -> "Keypoints":
        """Gather keypoints at given indices along the K axis."""
        take = lambda a: jnp.take_along_axis(a, indices, axis=-1)
        return Keypoints(
            coordinates=jnp.take_along_axis(self.coordinates, indices[..., None], axis=-2),
            scales=take(self.scales),
            responses=take(self.responses),
            mask=take(self.mask),
        )

    def pad_to(self, k: int) -> "Keypoints":
        cur = self.max_keypoints
        if cur >= k:
            return self
        pad = [(0, 0)] * (self.coordinates.ndim - 2) + [(0, k - cur)]
        return Keypoints(
            coordinates=jnp.pad(self.coordinates, pad + [(0, 0)]),
            scales=jnp.pad(self.scales, pad),
            responses=jnp.pad(self.responses, pad),
            mask=jnp.pad(self.mask, pad, constant_values=False),
        )

    # ---- host-side conveniences -------------------------------------------
    def valid_coordinates_np(self) -> np.ndarray:
        """(n_valid, 2) numpy array of valid coordinates (host)."""
        c = np.asarray(self.coordinates)
        m = np.asarray(self.mask)
        return c[m]
