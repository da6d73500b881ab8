"""Positional encoding (matches tensorBase_rotated_lights.py:12-17).

Ordering: for input [..., D] and F freqs the intermediate is
[..., D*F] laid out dim-major (x_d * 2^0, x_d * 2^1, ...), then
concat(sin, cos) on the last axis -> [..., 2*D*F].
"""
from __future__ import annotations

import jax.numpy as jnp


def positional_encoding(x, freqs: int):
    if freqs <= 0:
        return jnp.zeros(x.shape[:-1] + (0,), x.dtype)
    bands = (2.0 ** jnp.arange(freqs)).astype(x.dtype)  # [F]
    pts = (x[..., None] * bands).reshape(*x.shape[:-1], x.shape[-1] * freqs)
    return jnp.concatenate([jnp.sin(pts), jnp.cos(pts)], axis=-1)
