"""Persistent XLA compilation cache.

The reference's only "compile" cost is gensim's one-time Cython build;
ours is XLA program compilation, and on a tunneled TPU a cold
DeepWalk/Struc2Vec run spends minutes in compiles that are bit-identical
across processes (RESULTS.md: cold wiki DeepWalk example 208 s -> 8 s
once the disk cache is warm). JAX ships a disk-backed executable cache
for exactly this; enabling it is the framework's job, not each script's,
so `graphembedding_tpu` turns it on at import (opt out with
GETPU_NO_COMPILE_CACHE=1).

Scope: **accelerator platforms only.** XLA:CPU serializes AOT results
stamped with the build host's CPU features; reloading them under a
different feature set (another host, or even different XLA flags on
this one) logs feature-mismatch errors and risks SIGILL. CPU compiles
are local and fast — only the tunnel round-trip is worth persisting —
so when the configured platform list is CPU-only we leave the cache
off. The decision reads `jax.config.jax_platforms` (set in this image
by sitecustomize to "axon,cpu", and by tests/conftest.py to "cpu")
without initializing a backend.

User settings win: if the process already configured
`jax_compilation_cache_dir` (flag, env var, or code), we leave it alone.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "graphembedding_tpu", "xla_cache"
)


def _cpu_only(platforms: str | None) -> bool:
    if not platforms:
        # unset: JAX will pick the best available backend; this image's
        # sitecustomize always sets it, so unset means a stock install —
        # don't risk CPU AOT reloads, require an explicit platform list
        return True
    names = [p.strip().lower() for p in platforms.split(",") if p.strip()]
    return all(p == "cpu" for p in names)


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX's compilation cache at a disk directory. Idempotent.

    Returns the cache directory in effect, or None when disabled
    (GETPU_NO_COMPILE_CACHE=1, or a CPU-only platform configuration).
    """
    if os.environ.get("GETPU_NO_COMPILE_CACHE"):
        return None
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:  # already configured by the user/environment
        return current
    if _cpu_only(jax.config.jax_platforms):
        return None
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_DIR
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        # read-only filesystem / unset HOME: the cache is a pure
        # optimization — never let it break `import graphembedding_tpu`
        return None
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache every program: the tunnel round-trip makes even sub-second
    # compiles worth persisting, and entries are a few MB at most.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path
