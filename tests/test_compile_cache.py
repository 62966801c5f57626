"""Persistent compilation cache helper (utils/compile_cache.py)."""

import jax

from quickvideo_tpu.utils.compile_cache import enable_persistent_cache


def test_enable_sets_config(monkeypatch, tmp_path):
    cache_dir = str(tmp_path / "xla_cache")
    monkeypatch.setenv("QV_COMPILE_CACHE_DIR", cache_dir)
    old = jax.config.jax_compilation_cache_dir
    try:
        assert enable_persistent_cache() == cache_dir
        assert jax.config.jax_compilation_cache_dir == cache_dir
        # a jit round-trip still works with the cache configured
        assert int(jax.jit(lambda x: x + 1)(1)) == 2
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


def test_opt_out(monkeypatch):
    monkeypatch.setenv("QV_COMPILE_CACHE", "0")
    old = jax.config.jax_compilation_cache_dir
    assert enable_persistent_cache() is None
    assert jax.config.jax_compilation_cache_dir == old
