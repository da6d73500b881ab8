"""Alpha compositing along rays.

TPU notes: the transmittance cumulative product runs along the (static)
sample axis; XLA lowers `jnp.cumprod` to a log-depth scan that fuses with the
surrounding elementwise ops, so no custom kernel is needed here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def raw2alpha(sigma: jax.Array, dist: jax.Array):
    """Volume-rendering weights from densities.

    Matches reference `raw2alpha` (tensorBase_rotated_lights.py:21-28):
      alpha   = 1 - exp(-sigma * dist)
      T       = cumprod([1, 1-alpha+1e-10])      (exclusive transmittance)
      weights = alpha * T[:, :-1]
      bg      = T[:, -1]                          (final transmittance)

    Args:
      sigma: [..., S]
      dist:  [..., S] (already scaled by distance_scale)
    Returns:
      (alpha [..., S], weights [..., S], bg_transmittance [..., 1])
    """
    alpha = 1.0 - jnp.exp(-sigma * dist)
    one_minus = 1.0 - alpha + 1e-10
    # exclusive cumprod: T_i = prod_{j<i} (1 - alpha_j)
    t_excl = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(one_minus[..., :1]), one_minus], axis=-1),
        axis=-1,
    )
    weights = alpha * t_excl[..., :-1]
    return alpha, weights, t_excl[..., -1:]


def raw2alpha_from_sigma(sigma: jax.Array, dist: jax.Array, distance_scale: float):
    return raw2alpha(sigma, dist * distance_scale)
