"""Persistent XLA compilation cache.

The pipeline's jitted programs (hierarchical GME with lockstep searches)
take minutes to compile cold; caching compiled executables on disk makes
every process after the first start in seconds.  Safe to call always —
errors (read-only FS, unsupported backend) degrade to cold compiles.
"""

from __future__ import annotations

import os

_DONE = False


def enable(cache_dir: str = "~/.cache/gme_tpu_xla") -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    try:
        import jax

        path = os.path.expanduser(cache_dir)
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
