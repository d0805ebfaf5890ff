"""Device-level trace capture (the analog of the reference's archived Dask
performance reports, /root/reference/gtsfm/scene_optimizer.py:275,408).

Set GTSFM_TPU_TRACE=<dir> to capture a jax.profiler trace (XPlane +
TensorBoard-loadable) around each wrapped region: bench metrics and the
SceneOptimizer run wrap themselves in device_trace(tag). Without the env
var the context is a zero-cost no-op. Traces are NOT nestable — inner
regions no-op while an outer capture is live.
"""

from __future__ import annotations

import contextlib
import os

_ACTIVE = False


@contextlib.contextmanager
def device_trace(tag: str):
    global _ACTIVE
    trace_dir = os.environ.get("GTSFM_TPU_TRACE")
    if not trace_dir or _ACTIVE:
        yield
        return
    import jax

    path = os.path.join(trace_dir, tag)
    os.makedirs(path, exist_ok=True)
    _ACTIVE = True
    try:
        with jax.profiler.trace(path):
            yield
    finally:
        _ACTIVE = False
