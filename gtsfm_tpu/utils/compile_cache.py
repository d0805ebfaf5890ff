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


def _host_signature() -> str:
    """Short stable id of this host's CPU feature set (see enable docstring)."""
    import hashlib
    import platform

    sig = platform.machine()
    try:
        flags = model = ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                # flags alone are NOT enough: LLVM derives tuning features
                # (prefer-no-scatter/-gather) from the detected CPU MODEL,
                # so two hosts with identical flags can still produce
                # mutually-mistuned AOT executables. Include the model name.
                if not flags and line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                elif not model and line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                if flags and model:
                    break
        sig += " " + model + " " + flags
    except OSError:
        pass
    return "host-" + hashlib.sha1(sig.encode()).hexdigest()[:12]


def _platform_namespace() -> str:
    """Cache namespace for the process' default backend.

    TPU executables are host-independent, and the driver boxes rotate
    between rounds with different CPU models — host-namespacing them
    (round 4) made every driver bench compile cold (282 s Door e2e).
    Namespace TPU entries by device kind so all hosts share them. CPU AOT
    executables ARE keyed to the compile host's CPU model (loading a
    mismatched one is harmless — jax warns and recompiles, see
    jax._src.compiler._cache_read — but noisy), so keep those per-host.
    """
    import jax

    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover - backend init failure
        platform = "cpu"
    if platform == "cpu":
        return "cpu-" + _host_signature()
    kind = ""
    try:
        kind = jax.devices()[0].device_kind
    except Exception:  # pragma: no cover
        pass
    safe_kind = "".join(c if c.isalnum() else "-" for c in kind).strip("-")
    return f"{platform}-{safe_kind}" if safe_kind else platform


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
    cache_dir = os.path.join(cache_dir, _platform_namespace())
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache EVERYTHING: a remote-TPU (axon) compile round trip costs
        # ~0.6s even for tiny kernels, and a scene run issues hundreds of
        # them (round-4 palace profile: 1487 compiles = 940s of wall)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
        return True
    except Exception:  # pragma: no cover - older jax without the knobs
        return False
