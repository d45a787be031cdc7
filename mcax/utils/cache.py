"""Persistent XLA compilation cache (on by default for mcax pipelines).

Streaming pipelines compile a handful of large programs and then run them
for hours; persisting compiled executables across processes removes the
60-300 s first-block compile (and hedges against compile-service latency on
remote-compile TPU backends).  Opt out with MCAX_NO_COMPILE_CACHE=1 or
redirect with MCAX_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import os

_enabled = False


def enable() -> None:
    """Idempotently enable the JAX persistent compilation cache."""
    global _enabled
    if _enabled or os.environ.get("MCAX_NO_COMPILE_CACHE") == "1":
        return
    import jax

    path = os.environ.get("MCAX_COMPILE_CACHE_DIR",
                          os.path.expanduser("~/.cache/mcax-jax"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:       # config name drift across jax versions
        return
    if os.environ.get("MCAX_DEBUG_NANS") == "1":   # numerics guard (SURVEY §5)
        jax.config.update("jax_debug_nans", True)
    _enabled = True
