"""Disk cacher for the batched two-view stage.

Parity: /root/reference/gtsfm/two_view_estimator_cacher.py:21-60 (bz2
pickle cache keyed on SHA1 of sampled keypoints + correspondences).
Here the key covers the pair list, per-pair keypoint/descriptor content
samples, and the options repr — a re-run with identical front-end output
replays instantly (the reference's resume story).
"""

from __future__ import annotations

import numpy as np

from gtsfm_tpu.utils.cache import DiskCache, content_key


class TwoViewEstimatorCacher:
    def __init__(self, run_fn, options_repr: str = "", root=None, enabled: bool = True):
        """run_fn: callable(pairs, kp_xy, kp_mask, descs, cal) -> tvr dict."""
        self.run_fn = run_fn
        self.options_repr = options_repr
        self.cache = DiskCache("two_view", root=root, enabled=enabled)

    def _key(self, pairs, kp_xy, kp_mask, descs) -> str:
        # sample content rather than hashing everything (reference samples
        # keypoints for the same reason)
        stride = max(1, kp_xy.shape[1] // 32)
        return content_key(
            np.asarray(pairs),
            np.asarray(kp_xy)[:, ::stride],
            np.asarray(kp_mask).sum(axis=1),
            np.asarray(descs)[:, ::stride, :8],
            self.options_repr,
        )

    def run(self, pairs, kp_xy, kp_mask, descs, cal):
        key = self._key(pairs, kp_xy, kp_mask, descs)
        hit = self.cache.get(key)
        if hit is not None:
            return hit
        tvr = self.run_fn(pairs, kp_xy, kp_mask, descs, cal)
        self.cache.put(key, {k: np.asarray(v) for k, v in tvr.items()})
        return tvr
