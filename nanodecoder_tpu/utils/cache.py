"""Persistent XLA compilation cache.

First compiles of the big decode loops through this environment's
remote-compile relay run minutes (batch-256 greedy exceeded 9.5 min —
docs/PERF.md); a warm cache makes them seconds.  /tmp does not survive
the session, so the default cache lives in the repo workdir
(`<repo>/.jax_cache`, gitignored), which persists across sessions.

Call setup_compilation_cache() before the first jit (safe after
`import jax`, before any compilation).  An explicit
JAX_COMPILATION_CACHE_DIR in the environment always wins.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DEFAULT_CACHE_DIR = os.path.join(_REPO_ROOT, ".jax_cache")


def setup_compilation_cache(default_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at a directory that
    outlives the process (repo-local by default).  Returns the dir."""
    cache_dir = os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", default_dir or DEFAULT_CACHE_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache every program, however quick its compile: the relay's
    # round-trip, not local compile time, is what we are avoiding.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
