"""Backend selection helper.

TENSOIR_PLATFORM=cpu|tpu forces the JAX backend from the environment.
Needed because the container pre-registers a TPU plugin at interpreter start
(sitecustomize), which overrides JAX_PLATFORMS env vars — only a
jax.config.update after import wins.
"""
from __future__ import annotations

import os


def apply_platform_override():
    plat = os.environ.get("TENSOIR_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
