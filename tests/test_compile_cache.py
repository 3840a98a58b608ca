"""Persistent XLA compilation cache wiring (runtime/compile_cache)."""
import os

import numpy as np

from mmdx_tpu.runtime import compile_cache


def test_disabled_by_env(monkeypatch):
    monkeypatch.setattr(compile_cache, "_ENABLED", None)
    monkeypatch.setenv("MMDX_COMPILE_CACHE", "0")
    assert compile_cache.enable_compile_cache() is None


def test_cache_writes_and_idempotent(tmp_path, monkeypatch):
    import jax

    monkeypatch.setattr(compile_cache, "_ENABLED", None)
    monkeypatch.setenv("MMDX_COMPILE_CACHE", str(tmp_path / "xla"))
    # JAX's cache singleton latches the first directory it initializes with
    # (an earlier test's engine construction may have pointed it at the
    # default); reset so THIS test's dir takes effect
    from jax.experimental.compilation_cache import compilation_cache as cc

    cc.reset_cache()
    path = compile_cache.enable_compile_cache()
    assert path == str(tmp_path / "xla") and os.path.isdir(path)
    # second call: same dir, no re-configuration
    assert compile_cache.enable_compile_cache() == path

    # drop the min-compile-time gate so a tiny CPU program qualifies, then
    # prove an executable actually lands in OUR directory
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    try:
        f = jax.jit(lambda x: (x @ x.T).sum() * 3)
        f(np.ones((32, 32), np.float32)).block_until_ready()
        assert os.listdir(path), "no cache entry written"
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # detach later tests from this soon-to-be-deleted tmp dir
        jax.config.update("jax_compilation_cache_dir", None)
        cc.reset_cache()
        monkeypatch.setattr(compile_cache, "_ENABLED", None)
