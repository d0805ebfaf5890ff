"""Content-addressed disk caching.

Parity: /root/reference/gtsfm/utils/cache.py:14-35 (SHA1 content keys) and
the cacher components (frontend/cacher/*, two_view_estimator_cacher.py,
cluster_optimizer_cacher.py) — the reference realizes checkpoint/resume as
replayable per-stage caches keyed on input content; same scheme here.
"""

from __future__ import annotations

import bz2
import hashlib
import os
import pickle
from typing import Any, Callable, Optional

import numpy as np

DEFAULT_CACHE_ROOT = os.path.join(os.path.expanduser("~"), ".cache", "gtsfm_tpu")


def content_key(*parts) -> str:
    """SHA1 over arbitrary numpy arrays / bytes / strings / numbers."""
    h = hashlib.sha1()
    for p in parts:
        if isinstance(p, np.ndarray):
            h.update(p.tobytes())
            h.update(str(p.shape).encode())
            h.update(str(p.dtype).encode())
        elif isinstance(p, bytes):
            h.update(p)
        else:
            h.update(repr(p).encode())
    return h.hexdigest()


class DiskCache:
    """bz2-pickle store keyed by content hash, namespaced per stage."""

    def __init__(self, namespace: str, root: Optional[str] = None, enabled: bool = True):
        self.dir = os.path.join(root or DEFAULT_CACHE_ROOT, namespace)
        self.enabled = enabled
        if enabled:
            os.makedirs(self.dir, exist_ok=True)

    def _path(self, key: str) -> str:
        return os.path.join(self.dir, f"{key}.pbz2")

    def get(self, key: str) -> Optional[Any]:
        if not self.enabled:
            return None
        p = self._path(key)
        if not os.path.exists(p):
            return None
        try:
            with bz2.open(p, "rb") as f:
                return pickle.load(f)
        except Exception:
            return None

    def put(self, key: str, value: Any) -> None:
        if not self.enabled:
            return
        tmp = self._path(key) + ".tmp"
        with bz2.open(tmp, "wb") as f:
            pickle.dump(value, f)
        os.replace(tmp, self._path(key))

    def get_or_compute(self, key: str, fn: Callable[[], Any]) -> Any:
        hit = self.get(key)
        if hit is not None:
            return hit
        value = fn()
        self.put(key, value)
        return value


class DetectorCacher:
    """Wraps a detector-descriptor: cache keyed on image content + class
    name + options. Parity: detector_descriptor_cacher.py:29-70."""

    def __init__(self, detector, root: Optional[str] = None, enabled: bool = True):
        self.detector = detector
        tag = type(detector).__name__ + repr(getattr(detector, "options", ""))
        self.cache = DiskCache(f"detector/{hashlib.sha1(tag.encode()).hexdigest()[:12]}",
                               root=root, enabled=enabled)

    def __call__(self, image):
        import jax.numpy as jnp

        img_np = np.asarray(image)
        key = content_key(img_np)
        hit = self.cache.get(key)
        if hit is not None:
            kps_d, desc = hit
            from gtsfm_tpu.common.keypoints import Keypoints

            return (
                Keypoints(
                    coordinates=jnp.asarray(kps_d["coordinates"]),
                    scales=jnp.asarray(kps_d["scales"]),
                    responses=jnp.asarray(kps_d["responses"]),
                    mask=jnp.asarray(kps_d["mask"]),
                ),
                jnp.asarray(desc),
            )
        kps, desc = self.detector(image)
        self.cache.put(
            key,
            (
                {
                    "coordinates": np.asarray(kps.coordinates),
                    "scales": np.asarray(kps.scales),
                    "responses": np.asarray(kps.responses),
                    "mask": np.asarray(kps.mask),
                },
                np.asarray(desc),
            ),
        )
        return kps, desc
