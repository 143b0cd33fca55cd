"""Persistent-compilation-cache hook (utils/compile_cache.py).

The framework enables JAX's disk-backed executable cache at import so
cold accelerator runs don't re-pay XLA compiles (RESULTS.md: cold wiki
DeepWalk example 208 s -> 8 s warm-disk). On CPU-only platform configs
(like this test process) it must stay OFF: XLA:CPU cache entries are
stamped with host CPU features and reloading them under a different
feature set risks SIGILL. These tests pin that contract; the
cross-process cache-hit behavior itself is JAX's.
"""

import jax

from graphembedding_tpu.utils.compile_cache import (
    _cpu_only,
    enable_persistent_cache,
)


def test_cpu_only_platform_detection():
    assert _cpu_only(None)
    assert _cpu_only("cpu")
    assert _cpu_only("CPU, cpu")
    assert not _cpu_only("axon,cpu")
    assert not _cpu_only("tpu")


def test_disabled_on_cpu_only_process():
    # conftest forces jax_platforms=cpu, so the import-time call (and
    # this one) must be a no-op here
    assert _cpu_only(jax.config.jax_platforms)
    assert enable_persistent_cache() is None
    assert not jax.config.jax_compilation_cache_dir


def test_respects_existing_config():
    before = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/preset-cache")
        # user configuration wins even off-CPU; nothing is overridden
        assert enable_persistent_cache("/tmp/other") == "/tmp/preset-cache"
        assert (
            jax.config.jax_compilation_cache_dir == "/tmp/preset-cache"
        )
    finally:
        jax.config.update("jax_compilation_cache_dir", before)


def test_opt_out_env(monkeypatch):
    monkeypatch.setenv("GETPU_NO_COMPILE_CACHE", "1")
    assert enable_persistent_cache() is None
