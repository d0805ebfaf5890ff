"""In-memory synthetic scene loader.

Parity role: the reference validates its back-end at scale with GT-driven
synthetic correspondences (frontend/correspondence_generator/
synthetic_correspondence_generator.py:36 + configs/synthetic_front_end.yaml)
fed by a real loader's GT poses. When a benchmark dataset ships only its
*graph structure* (e.g. the palace-fine-arts-281 fixture: visibility graph +
NetVLAD similarity matrix, no images), this loader synthesizes a consistent
GT geometry so the same scene-scale pipeline runs end-to-end:

- ``spectral_ring_poses``: order the cameras by the visibility graph's
  Fiedler vector and place them on an inward-looking ring — graph-adjacent
  cameras become spatially adjacent, so correspondences synthesized along
  the REAL edges are geometrically plausible.
- ``SyntheticSceneLoader``: a LoaderBase over in-memory GT poses and flat
  gray images (detection never runs in the synthetic-correspondence path;
  images only size the keypoint canvas).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.common.image import Image
from gtsfm_tpu.geometry import SE3, Cal3Bundler
from gtsfm_tpu.loader.base import LoaderBase


def spectral_ring_poses(
    edges: np.ndarray,
    num_images: int,
    ring_radius: float = 20.0,
    z_noise: float = 0.5,
    seed: int = 0,
) -> SE3:
    """GT camera ring ordered by the graph's Fiedler vector.

    The Fiedler (2nd-smallest Laplacian eigen-) vector gives a 1-D embedding
    in which strongly-connected cameras land close together; sorting by it
    and walking a circle makes the real visibility edges short-baseline —
    the geometry a ring-capture scene (palace-fine-arts class) actually has.
    """
    n = num_images
    A = np.zeros((n, n), np.float64)
    e = np.asarray(edges, np.int64)
    A[e[:, 0], e[:, 1]] = 1.0
    A[e[:, 1], e[:, 0]] = 1.0
    L = np.diag(A.sum(1)) - A
    _, vecs = np.linalg.eigh(L)
    order = np.argsort(vecs[:, 1])  # Fiedler ordering
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n)

    rng = np.random.default_rng(seed)
    ang = 2.0 * np.pi * rank / n
    centers = np.stack(
        [
            ring_radius * np.cos(ang),
            ring_radius * np.sin(ang),
            rng.normal(0.0, z_noise, n),
        ],
        axis=1,
    ).astype(np.float32)
    Rs = []
    for c in centers:
        z = -c / np.linalg.norm(c)  # look at the origin
        x = np.cross([0.0, 0.0, 1.0], z)
        x /= np.linalg.norm(x)
        Rs.append(np.stack([x, np.cross(z, x), z], axis=1))
    return SE3(R=jnp.asarray(np.stack(Rs), jnp.float32), t=jnp.asarray(centers))


class SyntheticSceneLoader(LoaderBase):
    """LoaderBase over in-memory GT poses/calibrations (no files on disk)."""

    def __init__(
        self,
        poses: SE3,  # [N] camera-to-world GT
        cal=None,  # batched calibration [N]; default f=600 @ 640x480
        image_size: Tuple[int, int] = (480, 640),  # (h, w)
        max_resolution: int = 10_000,
        names: Optional[Sequence[str]] = None,
    ):
        super().__init__(max_resolution=max_resolution)
        self._poses = poses
        self._n = int(poses.t.shape[0])
        h, w = image_size
        if cal is None:
            cal = Cal3Bundler.create(
                jnp.full(self._n, 600.0),
                jnp.zeros(self._n),
                jnp.zeros(self._n),
                jnp.full(self._n, w / 2.0),
                jnp.full(self._n, h / 2.0),
            )
        self._cal = cal
        self._hw = (h, w)
        self._names = list(names) if names is not None else [
            f"synthetic_{i:04d}.jpg" for i in range(self._n)
        ]

    def __len__(self) -> int:
        return self._n

    def _get_image_full_res(self, index: int) -> Image:
        h, w = self._hw
        return Image(
            value_array=np.full((h, w), 128, np.uint8), file_name=self._names[index]
        )

    def _get_intrinsics_full_res(self, index: int):
        import jax

        return jax.tree.map(lambda a: a[index], self._cal)

    def get_camera_pose(self, index: int) -> Optional[SE3]:
        import jax

        return jax.tree.map(lambda a: a[index], self._poses)

    def get_gt_poses(self):
        return self._poses

    def get_all_intrinsics(self):
        return [self._get_intrinsics_full_res(i) for i in range(self._n)]
