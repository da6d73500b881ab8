"""Color-space conversion (matches reference relight_utils.py:489-515)."""
from __future__ import annotations

import jax.numpy as jnp

_SRGB_LINEAR_THRES = 0.0031308
_SRGB_LINEAR_COEFF = 12.92
_SRGB_EXP_COEFF = 1.055
_SRGB_EXPONENT = 2.4


def linear2srgb(x):
    """Linear -> sRGB with the reference's 1e-6-biased pow
    (relight_utils.py:489-515; input is clipped to [0,1] first)."""
    x = jnp.clip(x, 0.0, 1.0)
    lin = x * _SRGB_LINEAR_COEFF
    nonlin = _SRGB_EXP_COEFF * jnp.power(x + 1e-6, 1.0 / _SRGB_EXPONENT) - (
        _SRGB_EXP_COEFF - 1.0
    )
    return jnp.where(x <= _SRGB_LINEAR_THRES, lin, nonlin)


def srgb2linear(x):
    x = jnp.clip(x, 0.0, 1.0)
    lin = x / _SRGB_LINEAR_COEFF
    nonlin = jnp.power((x + (_SRGB_EXP_COEFF - 1.0)) / _SRGB_EXP_COEFF, _SRGB_EXPONENT)
    return jnp.where(x <= _SRGB_LINEAR_THRES * _SRGB_LINEAR_COEFF, lin, nonlin)
