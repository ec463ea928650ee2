"""Persistent-compilation-cache setup shared by every CLI/entry point.

Call enable_compilation_cache() BEFORE the first jit runs.  Two knobs:

  * JAX_COMPILATION_CACHE_DIR — where executables persist across runs.
  * JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0 — REQUIRED on the
    tunneled-TPU backend: its PJRT plugin defers the real compilation, so
    jax measures every "compile" at <1 s and the default 1-second threshold
    silently persists NOTHING (measured: a cold start that takes minutes
    end-to-end reported 0.4 s of "compile time").  With the threshold at 0
    the same program's second cold start dropped 265 s -> 1.0 s.
"""
from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compilation_cache(path: str | None = None) -> str:
    """Set the cache env defaults (no-ops if the user already set them).

    Safe to call before OR after `import jax`, but must run before the
    first compilation.  Returns the cache dir in effect.
    """
    cache_dir = os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", path or DEFAULT_CACHE_DIR
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    import sys

    if "jax" in sys.modules:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]),
        )
    return cache_dir
