"""Persistent XLA compilation cache (compiles through the axon remote-compile
tunnel take ~10 min for the full train step; the cache makes reruns and
repeated phases with identical shapes instant)."""
from __future__ import annotations

import os


def enable(path: str = None):
    import jax

    path = path or os.environ.get(
        "TENSOIR_COMPILE_CACHE", os.path.expanduser("~/.cache/tensoir_xla"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # older jax or read-only fs — not fatal
        print(f"[compile_cache] disabled: {e}")
