"""Stage cachers for the matcher and global-descriptor stages.

Parity: /root/reference/gtsfm/frontend/cacher/matcher_cacher.py,
global_descriptor_cacher.py (bz2-pickle disk caches keyed on SHA1 of the
stage's input content + component class name). Together with the detector
cache, the two-view cacher (frontend/two_view_cacher.py) and the
whole-cluster cache (scene/hierarchical.py), every expensive stage of the
pipeline replays from disk on a re-run — the reference's resume story
(SURVEY §5 checkpoint/resume).
"""

from __future__ import annotations

import numpy as np

from gtsfm_tpu.utils.cache import DiskCache, content_key


class MatcherCacher:
    """Wraps a learned matcher's match_batch; key covers descriptor +
    coordinate content samples and the matcher class name, so swapping the
    verifier downstream never re-runs matching."""

    def __init__(self, matcher, root=None, enabled: bool = True):
        self.matcher = matcher
        self.cache = DiskCache("matcher", root=root, enabled=enabled)

    def _key(self, desc0, desc1, coords0, coords1, mask0, mask1) -> str:
        d0 = np.asarray(desc0)
        d1 = np.asarray(desc1)
        stride = max(1, d0.shape[1] // 32)
        return content_key(
            d0[:, ::stride, :8], d1[:, ::stride, :8],
            np.asarray(coords0)[:, ::stride], np.asarray(coords1)[:, ::stride],
            np.asarray(mask0).sum(axis=-1), np.asarray(mask1).sum(axis=-1),
            type(self.matcher).__name__,
        )

    def match_batch(self, desc0, desc1, coords0, coords1, mask0, mask1, **kw):
        key = self._key(desc0, desc1, coords0, coords1, mask0, mask1)
        hit = self.cache.get(key)
        if hit is not None:
            return hit
        out = self.matcher.match_batch(desc0, desc1, coords0, coords1, mask0, mask1, **kw)
        out_np = tuple(np.asarray(a) for a in out)
        self.cache.put(key, out_np)
        return out_np


class GlobalDescriptorCacher:
    """Wraps a global descriptor's describe_batch; key covers downsampled
    image content + the descriptor class name."""

    def __init__(self, descriptor, root=None, enabled: bool = True):
        self.descriptor = descriptor
        self.cache = DiskCache("global_descriptor", root=root, enabled=enabled)

    def describe_batch(self, images) -> np.ndarray:
        imgs = np.asarray(images)
        key = content_key(
            imgs[:, ::8, ::8], imgs.shape, type(self.descriptor).__name__
        )
        hit = self.cache.get(key)
        if hit is not None:
            return hit
        out = np.asarray(self.descriptor.describe_batch(images))
        self.cache.put(key, out)
        return out
