"""Persistent XLA compilation cache setup.

The fused warp+combine mega-kernel compiles in ~8-10 minutes on a
single-core host; a repo-local persistent cache turns every later
invocation into a ~1 minute run.  IMPORTANT: the JAX build in this
environment does NOT read the ``JAX_COMPILATION_CACHE_DIR`` /
``JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS`` environment variables
(``jax._src.config.compilation_cache_dir`` stays ``None``); the cache
only activates through ``jax.config.update``, which this helper does.
Call it after importing jax and before the first jit compile.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str,
                         min_compile_secs: float = 5.0) -> None:
    """Activate the persistent compile cache at ``cache_dir``."""
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
