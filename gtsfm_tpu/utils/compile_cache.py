"""Persistent XLA compilation cache for the framework's jit stages.

The pipeline is a sequence of shape-stable jit units (detector batch,
two-view pair batch, averaging solves, BA) whose first compiles cost
10-60 s each on a remote TPU. Enabling JAX's persistent compilation cache
makes every later process start replay those executables from disk — the
TPU-native analog of the reference's content-addressed stage caches
("checkpoint/resume", SURVEY.md §5) applied to compilation instead of
data. Call enable_persistent_cache() once per process (the runner, bench
harness, and driver entry points do); set GTSFM_TPU_NO_COMPILE_CACHE=1 to
opt out.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/gtsfm_tpu/xla")
_enabled = False


def enable_persistent_cache(path: str | None = None) -> bool:
    """Idempotently turn on JAX's persistent compilation cache.

    Returns True when active (False when opted out or unsupported).
    """
    global _enabled
    if _enabled:
        return True
    if os.environ.get("GTSFM_TPU_NO_COMPILE_CACHE"):
        return False
    import jax

    cache_dir = path or os.environ.get("GTSFM_TPU_COMPILE_CACHE", _DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that takes noticeable time; tiny kernels stay out
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
        return True
    except Exception:  # pragma: no cover - older jax without the knobs
        return False
