"""Cook-Torrance GGX specular term (matches relight_utils.py:17-50).

The reference's idiosyncrasies are preserved deliberately (they are part of
its trained behavior): the normal is flipped toward the camera via
``N * sign(NoV)``, Schlick's Fresnel uses the exponential approximation
``2^((-5.55473*VoH - 6.98316)*VoH)``, the geometry/denominator product is
clamped to [1e-6, 4*pi], and the half vector is normalize((L+V)/2).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tensoir_tpu.ops.rays import safe_l2_normalize


def ggx_specular(normal, pts2c, pts2l, roughness, fresnel):
    """GGX specular lobe.

    Args:
      normal:    [N, 3] surface normals.
      pts2c:     [N, 3] surface->camera dirs.
      pts2l:     [N, L, 3] surface->light dirs.
      roughness: [N, 1].
      fresnel:   [N, 3] (the reference uses a constant 0.04).
    Returns: [N, L, 3] specular reflectance.
    """
    L = safe_l2_normalize(pts2l, axis=-1)                     # [N, L, 3]
    V = safe_l2_normalize(pts2c, axis=-1)                     # [N, 3]
    H = safe_l2_normalize((L + V[:, None, :]) / 2.0, axis=-1)  # [N, L, 3]
    N = safe_l2_normalize(normal, axis=-1)                    # [N, 3]

    NoV = jnp.sum(V * N, axis=-1, keepdims=True)              # [N, 1]
    N = N * jnp.sign(NoV)                                     # flip toward camera

    NoL = jnp.clip(jnp.sum(N[:, None, :] * L, -1, keepdims=True), 1e-6, 1.0)
    NoV = jnp.clip(jnp.sum(N * V, -1, keepdims=True), 1e-6, 1.0)          # [N, 1]
    NoH = jnp.clip(jnp.sum(N[:, None, :] * H, -1, keepdims=True), 1e-6, 1.0)
    VoH = jnp.clip(jnp.sum(V[:, None, :] * H, -1, keepdims=True), 1e-6, 1.0)

    alpha = roughness * roughness                              # [N, 1]
    alpha2 = alpha * alpha
    k = (alpha + 2.0 * roughness + 1.0) / 8.0
    FMi = ((-5.55473) * VoH - 6.98316) * VoH
    frac0 = fresnel[:, None, :] + (1.0 - fresnel[:, None, :]) * jnp.power(2.0, FMi)

    frac = frac0 * alpha2[:, None, :]
    nom0 = NoH * NoH * (alpha2[:, None, :] - 1.0) + 1.0
    nom1 = NoV * (1.0 - k) + k                                 # [N, 1]
    nom2 = NoL * (1.0 - k[:, None, :]) + k[:, None, :]
    nom = jnp.clip(
        4.0 * np.pi * nom0 * nom0 * nom1[:, None, :] * nom2, 1e-6, 4.0 * np.pi
    )
    return frac / nom
