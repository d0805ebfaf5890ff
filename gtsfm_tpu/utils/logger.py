"""Logging + timing utilities.

Parity: /root/reference/gtsfm/utils/logger.py:25-66 (per-process worker-id
tagged log lines) and common/timing.py. The Dask worker id becomes the
host/process + JAX backend tag — the analog identity in a single-program
TPU world.
"""

from __future__ import annotations

import contextlib
import logging
import os
import socket
import time

_CACHED_TAG = None


def _worker_tag() -> str:
    global _CACHED_TAG
    if _CACHED_TAG is None:
        backend = "cpu"
        try:
            import jax

            backend = jax.default_backend()
        except Exception:
            pass
        _CACHED_TAG = f"{socket.gethostname()}({os.getpid()}/{backend})"
    return _CACHED_TAG


def get_logger(name: str = "gtsfm_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(
            logging.Formatter(
                f"%(asctime)s [{_worker_tag()}] %(levelname)s %(name)s: %(message)s",
                datefmt="%H:%M:%S",
            )
        )
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


class StageTimer:
    """Collects named wall-clock stage timings (parity: the per-stage
    duration metrics embedded in the reference's GtsfmMetricsGroups)."""

    def __init__(self):
        self.timings: dict = {}

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timings[name] = self.timings.get(name, 0.0) + time.perf_counter() - t0

    def as_metrics(self):
        from gtsfm_tpu.evaluation.metrics import Metric

        return [Metric(f"{k}_sec", v) for k, v in self.timings.items()]
