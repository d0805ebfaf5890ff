"""Build-on-first-use for the native C++ extensions.

The host-side sequential algorithms (DSF track linking, MFAS ordering,
METIS-class multilevel bisection) live in small C++ shared objects built
from the sources in this directory (see Makefile). A fresh checkout has no
binaries; ensure_built() compiles a missing .so once with g++ (guarded by
an exclusive lock file so concurrent test workers don't race). Callers
fall back to their numpy implementations when no toolchain is available.
"""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SOURCES = {
    "libdsf.so": "dsf.cpp",
    "libmfas.so": "mfas.cpp",
    "libmetis_lite.so": "metis.cpp",
}


def ensure_built(so_name: str) -> str | None:
    """Return the absolute path of the shared object, compiling it from its
    C++ source if missing. None when it cannot be built."""
    so_path = os.path.join(_DIR, so_name)
    src = _SOURCES.get(so_name)
    src_path = os.path.join(_DIR, src) if src else None

    def _fresh() -> bool:
        # rebuild when the C++ source is newer than the binary
        return os.path.exists(so_path) and (
            src_path is None
            or not os.path.exists(src_path)
            or os.path.getmtime(so_path) >= os.path.getmtime(src_path)
        )

    if _fresh():
        return so_path
    if src_path is None or not os.path.exists(src_path):
        return so_path if os.path.exists(so_path) else None
    lock_path = so_path + ".lock"
    try:
        import fcntl

        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            if not _fresh():  # re-check under the lock
                tmp = so_path + ".tmp"
                subprocess.run(
                    ["g++", "-O3", "-fPIC", "-std=c++17", "-pthread",
                     "-shared", "-o", tmp, src_path],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp, so_path)  # atomic: readers never see partial
        return so_path
    except Exception:
        return so_path if os.path.exists(so_path) else None
