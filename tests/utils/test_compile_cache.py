import os

import jax

import gtsfm_tpu.utils.compile_cache as cc


def test_enable_persistent_cache(tmp_path):
    # conftest already enabled the cache for the suite; reset the module
    # latch so this test exercises a fresh enable with its own directory.
    prev_dir = jax.config.jax_compilation_cache_dir
    cc._enabled = False
    try:
        ok = cc.enable_persistent_cache(str(tmp_path / "xla"))
        assert ok
        got = jax.config.jax_compilation_cache_dir
        # dir is namespaced under the requested root: <tmp>/xla/<platform-host sig>
        assert got.startswith(str(tmp_path / "xla"))
        assert os.path.isdir(got)
        # idempotent
        assert cc.enable_persistent_cache()
    finally:
        cc._enabled = False
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        cc._enabled = True
