"""One shared home for the persistent-compile-cache setup.

Every entry point (bench.py, __graft_entry__.py, tests/conftest.py) needs
the same two facts encoded once, not three times (ADVICE r2):
  - the cache must be enabled via jax.config, because this image's
    sitecustomize imports jax at interpreter start, so the
    JAX_COMPILATION_CACHE_DIR env var alone arrives too late;
  - remote-TPU compiles cost 2-10 minutes per graph, so silently losing
    the cache (e.g. a renamed config option in a future jax) must WARN,
    never pass.
"""

from __future__ import annotations

import os
import sys

DEFAULT_CACHE_DIR = "/tmp/jaxcache"
ENV_VAR = "JAX_COMPILATION_CACHE_DIR"


def set_compile_cache() -> None:
    """Point jax's persistent compilation cache at $JAX_COMPILATION_CACHE_DIR
    (default /tmp/jaxcache). Safe to call repeatedly / after jax import."""
    import jax

    cache_dir = os.environ.get(ENV_VAR, DEFAULT_CACHE_DIR)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception as e:
        print(f"[pillars_tpu] WARNING: could not enable the persistent "
              f"compilation cache ({e!r}); every run will pay the full "
              f"XLA compile", file=sys.stderr)
