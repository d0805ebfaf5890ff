import os

import jax

from gtsfm_tpu.utils.compile_cache import enable_persistent_cache


def test_enable_persistent_cache(tmp_path):
    ok = enable_persistent_cache(str(tmp_path / "xla"))
    assert ok
    assert jax.config.jax_compilation_cache_dir.endswith("xla")
    # idempotent
    assert enable_persistent_cache()
