"""Ray generation / marching primitives (static shapes, jit-friendly).

Replaces the reference's sampling routines:
* `sample_ray` fixed-step AABB marching with per-ray train jitter
  (tensorBase_rotated_lights.py:705-724)
* `sample_ray_equally` for secondary visibility rays (relight_utils.py:707-722)
* `sample_pdf` inverse-CDF hierarchical sampling (dataLoader/ray_utils.py:130-172)
* `dda` ray-AABB test used by ray filtering (tensorBase_rotated_lights.py:794-800)
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def aabb_ray_tmin(rays_o, rays_d, aabb, near: float, far: float):
    """Entry distance of each ray into the AABB, clamped to [near, far].

    Matches tensorBase_rotated_lights.py:709-712.
    """
    vec = jnp.where(rays_d == 0, jnp.full_like(rays_d, 1e-6), rays_d)
    rate_a = (aabb[1] - rays_o) / vec
    rate_b = (aabb[0] - rays_o) / vec
    t_min = jnp.minimum(rate_a, rate_b).max(-1)
    return jnp.clip(t_min, near, far)


def aabb_intersect(rays_o, rays_d, aabb):
    """(t_min, t_max, hit) for ray/AABB — the `bbox_only` ray filter
    (tensorBase_rotated_lights.py:794-800)."""
    vec = jnp.where(rays_d == 0, jnp.full_like(rays_d, 1e-6), rays_d)
    rate_a = (aabb[1] - rays_o) / vec
    rate_b = (aabb[0] - rays_o) / vec
    t_min = jnp.minimum(rate_a, rate_b).max(-1)
    t_max = jnp.maximum(rate_a, rate_b).min(-1)
    return t_min, t_max, t_max > t_min


def sample_ray(rays_o, rays_d, aabb, near: float, far: float, step_size,
               n_samples: int, key=None):
    """Fixed-step ray marching from the AABB entry point.

    Train-time jitter adds ONE uniform offset per ray shared by all its
    samples (reference: `rng += torch.rand_like(rng[:, [0]])`,
    tensorBase_rotated_lights.py:714-717). Pass `key=None` for eval.

    Returns:
      xyz:    [N, S, 3] sample positions
      z_vals: [N, S] distances along the ray
      valid:  [N, S] bool, inside-AABB mask
    """
    N = rays_o.shape[0]
    t_min = aabb_ray_tmin(rays_o, rays_d, aabb, near, far)
    rng = jnp.arange(n_samples, dtype=rays_o.dtype)[None, :]
    if key is not None:
        rng = rng + jax.random.uniform(key, (N, 1), dtype=rays_o.dtype)
    step = step_size * rng
    z_vals = t_min[:, None] + step
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    valid = jnp.all((xyz >= aabb[0]) & (xyz <= aabb[1]), axis=-1)
    return xyz, z_vals, valid


def sample_ray_equally(rays_o, rays_d, aabb, vis_near: float, vis_far: float,
                       n_samples: int):
    """Equally spaced samples in [vis_near, vis_far] along secondary rays
    (relight_utils.py:707-722). No jitter, shared z grid.

    Returns (xyz [N,S,3], z_vals [1,S], valid [N,S])."""
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=rays_o.dtype)
    z_vals = (vis_near * (1.0 - t) + vis_far * t)[None, :]
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    valid = jnp.all((xyz >= aabb[0]) & (xyz <= aabb[1]), axis=-1)
    return xyz, z_vals, valid


def sample_ray_ndc(rays_o, rays_d, aabb, near: float, far: float,
                   n_samples: int, key=None):
    """NDC-space marching: uniform samples in [near, far] with optional
    per-sample jitter (sample_ray_ndc, tensorBase_rotated_lights.py:694-703).
    """
    N = rays_o.shape[0]
    interpx = jnp.linspace(near, far, n_samples, dtype=rays_o.dtype)[None, :]
    if key is not None:
        interpx = interpx + jax.random.uniform(
            key, (N, n_samples), dtype=rays_o.dtype) * ((far - near) / n_samples)
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * interpx[..., None]
    valid = jnp.all((xyz >= aabb[0]) & (xyz <= aabb[1]), axis=-1)
    return xyz, jnp.broadcast_to(interpx, (N, n_samples)), valid


def ndc_rays_blender(h: int, w: int, focal: float, near: float,
                     rays_o, rays_d):
    """Blender-convention NDC warp (dataLoader/ray_utils.py:91-108)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d
    o0 = -1.0 / (w / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (h / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]
    d0 = -1.0 / (w / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    d1 = -1.0 / (h / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    d2 = -2.0 * near / rays_o[..., 2]
    return (jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1))


def z_to_dists(z_vals):
    """Consecutive sample spacing with trailing zero
    (tensorBase_rotated_lights.py:887)."""
    return jnp.concatenate(
        [z_vals[..., 1:] - z_vals[..., :-1], jnp.zeros_like(z_vals[..., :1])],
        axis=-1,
    )


def sample_pdf(bins, weights, n_samples: int, key=None):
    """Inverse-CDF sampling (dataLoader/ray_utils.py:130-172).

    Args:
      bins: [B, M+1] bin edges; weights: [B, M]; key None => deterministic.
    Returns samples [B, n_samples].
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)

    if key is None:
        u = jnp.linspace(0.0, 1.0, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_g0 = jnp.take_along_axis(cdf, below, -1)
    cdf_g1 = jnp.take_along_axis(cdf, above, -1)
    bins_g0 = jnp.take_along_axis(bins, below, -1)
    bins_g1 = jnp.take_along_axis(bins, above, -1)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def safe_l2_normalize(x, axis=-1, eps: float = 1e-6):
    """Matches F.normalize(p=2, eps=1e-6): x / max(||x||, eps)
    (dataLoader/ray_utils.py:278-279).

    Gradient-safe at x = 0: sqrt is taken of max(|x|^2, eps^2), so the
    backward pass is exactly zero there instead of NaN (d sqrt at 0 is inf;
    zero vectors DO occur — derived normals of empty samples, grazing half
    vectors — and a single NaN would poison every parameter via the loss).
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, eps * eps))
    return x / norm


def convert_sph_conventions(pts_r_angle1_angle2, what2what: str):
    """Convert between spherical-coordinate conventions
    (relight_utils.py:537-567; numpy util used by light-probe tooling):

    * 'lat-lng': (r, latitude in [-pi/2, pi/2] from the equator,
      longitude in [-pi, pi]).
    * 'theta-phi': (r, polar angle theta in [0, pi] from +z,
      azimuth phi in [0, 2pi]).
    """
    import numpy as _np
    pts = _np.asarray(pts_r_angle1_angle2)
    out = _np.zeros(pts.shape)
    out[:, 0] = pts[:, 0]
    out[:, 1] = _np.pi / 2 - pts[:, 1]
    if what2what == "lat-lng_to_theta-phi":
        out[:, 2] = _np.where(pts[:, 2] < 0, 2 * _np.pi + pts[:, 2],
                              pts[:, 2])
        return out
    if what2what == "theta-phi_to_lat-lng":
        out[:, 2] = _np.where(pts[:, 2] > _np.pi, pts[:, 2] - 2 * _np.pi,
                              pts[:, 2])
        return out
    raise NotImplementedError(what2what)


def sph2cart(pts_sph, convention: str = "lat-lng"):
    """Spherical -> cartesian (relight_utils.py:569-593): z = r sin(lat),
    x = r cos(lat) cos(lng), y = r cos(lat) sin(lng)."""
    import numpy as _np
    pts_sph = _np.asarray(pts_sph)
    assert pts_sph.ndim == 2 and pts_sph.shape[-1] == 3, \
        "shape of input must be (n, 3)"
    assert (_np.abs(pts_sph[:, 1:]) <= 2 * _np.pi).all(), \
        "input angle falls out of [-2pi, 2pi]"
    if convention == "lat-lng":
        p = pts_sph
    elif convention == "theta-phi":
        p = convert_sph_conventions(pts_sph, "theta-phi_to_lat-lng")
    else:
        raise NotImplementedError(convention)
    r, lat, lng = p[:, 0], p[:, 1], p[:, 2]
    return _np.stack((r * _np.cos(lat) * _np.cos(lng),
                      r * _np.cos(lat) * _np.sin(lng),
                      r * _np.sin(lat)), axis=-1)
