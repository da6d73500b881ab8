"""Environment-light models: spherical Gaussians, learnable pixel maps, GT.

Covers the reference's three light kinds and both multi-light
parameterizations (tensorBase_rotated_lights.py:435-606 and the
general-multi-lights variant's per-light SG sets,
tensorBase_general_multi_lights.py):

* 'sg'    — M spherical Gaussians [M, 7] = (lobe xyz, lambda, mu rgb),
            fibonacci-sphere lobe init + energy normalization. Rotated
            multi-light reuses ONE SG set queried at z-rotated directions;
            general multi-light holds one SG set PER light.
* 'pixel' — learnable [envH*envW, 3] texture through softplus(beta=5).
* 'gt'    — frozen dataset light probe.

Incident-direction samplers (tensorBase_rotated_lights.py:492-574):
fixed_envirmap / stratified_sampling / stratifed_sample_equal_areas /
importance_sample (CDF inversion via searchsorted replaces
torch.multinomial).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensoir_tpu.ops.interp import bilerp_plane


# ---------------------------------------------------------------- directions

def envmap_dirs(envmap_h: int, envmap_w: int):
    """Texel-center lat-long directions + area weights.

    Matches generate_envir_map_dir (tensorBase_rotated_lights.py:435-453):
    phi from +pi/2 (top) to -pi/2, theta from +pi to -pi, dirs =
    (cos t cos p, sin t cos p, sin p), weights = 4*pi*sin(pi/2 - phi)/sum.
    Returns (area_weight [H*W], dirs [H*W, 3]) as numpy float32.
    """
    lat_step = np.pi / envmap_h
    lng_step = 2 * np.pi / envmap_w
    phi = np.linspace(np.pi / 2 - 0.5 * lat_step, -np.pi / 2 + 0.5 * lat_step,
                      envmap_h, dtype=np.float64)
    theta = np.linspace(np.pi - 0.5 * lng_step, -np.pi + 0.5 * lng_step,
                        envmap_w, dtype=np.float64)
    phi, theta = np.meshgrid(phi, theta, indexing="ij")
    sin_phi = np.sin(np.pi / 2 - phi)
    area = 4 * np.pi * sin_phi / np.sum(sin_phi)
    dirs = np.stack(
        [np.cos(theta) * np.cos(phi), np.sin(theta) * np.cos(phi), np.sin(phi)],
        axis=-1,
    )
    return (area.reshape(-1).astype(np.float32),
            dirs.reshape(-1, 3).astype(np.float32))


def stratified_dirs(key, envmap_h: int, envmap_w: int):
    """Jittered lat-long grid directions [H*W, 3]
    (tensorBase_rotated_lights.py:511-526)."""
    lat_step = np.pi / envmap_h
    lng_step = 2 * np.pi / envmap_w
    phi0 = jnp.linspace(np.pi / 2 - 0.5 * lat_step,
                        -np.pi / 2 + 0.5 * lat_step, envmap_h)
    th0 = jnp.linspace(np.pi - 0.5 * lng_step, -np.pi + 0.5 * lng_step,
                       envmap_w)
    phi0, th0 = jnp.meshgrid(phi0, th0, indexing="ij")
    kp, kt = jax.random.split(key)
    phi = phi0 + lat_step * (jax.random.uniform(kp, phi0.shape) - 0.5)
    theta = th0 + lng_step * (jax.random.uniform(kt, th0.shape) - 0.5)
    dirs = jnp.stack([jnp.cos(theta) * jnp.cos(phi),
                      jnp.sin(theta) * jnp.cos(phi),
                      jnp.sin(phi)], axis=-1)
    return dirs.reshape(-1, 3)


def stratified_equal_area_dirs(key, envmap_h: int, envmap_w: int):
    """Equal-area stratified sampling in sin(phi)
    (tensorBase_rotated_lights.py:528-544)."""
    sp_step = 2.0 / envmap_h
    lng_step = 2 * np.pi / envmap_w
    sp0 = jnp.linspace(1 - 0.5 * sp_step, -1 + 0.5 * sp_step, envmap_h)
    th0 = jnp.linspace(np.pi - 0.5 * lng_step, -np.pi + 0.5 * lng_step,
                       envmap_w)
    sp0, th0 = jnp.meshgrid(sp0, th0, indexing="ij")
    kp, kt = jax.random.split(key)
    sin_phi = sp0 + sp_step * (jax.random.uniform(kp, sp0.shape) - 0.5)
    theta = th0 + lng_step * (jax.random.uniform(kt, th0.shape) - 0.5)
    phi = jnp.arcsin(jnp.clip(sin_phi, -1.0, 1.0))
    dirs = jnp.stack([jnp.cos(theta) * jnp.cos(phi),
                      jnp.sin(theta) * jnp.cos(phi),
                      jnp.sin(phi)], axis=-1)
    return dirs.reshape(-1, 3)


def rotation_matrices(rotations_deg) -> np.ndarray:
    """Z-axis rotations for the rotated-lights setting
    (tensorBase_rotated_lights.py:478-488). [R, 3, 3] float32."""
    mats = []
    for deg in rotations_deg:
        a = float(deg) / 180.0 * np.pi
        mats.append(np.array([[np.cos(a), -np.sin(a), 0.0],
                              [np.sin(a), np.cos(a), 0.0],
                              [0.0, 0.0, 1.0]], dtype=np.float32))
    return np.stack(mats, axis=0)


# ---------------------------------------------------------------- SG lights

def fibonacci_sphere(samples: int) -> np.ndarray:
    """Uniform points on a sphere (tensorBase_rotated_lights.py:49-67)."""
    phi = np.pi * (3.0 - np.sqrt(5.0))
    i = np.arange(samples, dtype=np.float64)
    z = 1 - (i / float(samples - 1)) * 2
    radius = np.sqrt(np.maximum(1 - z * z, 0.0))
    theta = phi * i
    return np.stack([np.cos(theta) * radius, np.sin(theta) * radius, z],
                    axis=-1).astype(np.float32)


def sg_energy(lgt_sgs) -> jnp.ndarray:
    """Total energy per SG (tensorBase_rotated_lights.py:43-47)."""
    lam = jnp.abs(lgt_sgs[:, 3:4])
    mu = jnp.abs(lgt_sgs[:, 4:])
    return mu * 2.0 * np.pi / lam * (1.0 - jnp.exp(-2.0 * lam))


def init_sg_params(key, num_sgs: int) -> jnp.ndarray:
    """[M, 7] SG init matching tensorBase_rotated_lights.py:461-476."""
    sgs = jax.random.normal(key, (num_sgs, 7))
    # copy the mu red channel into g/b
    sgs = sgs.at[:, -2:].set(jnp.broadcast_to(sgs[:, -3:-2], (num_sgs, 2)))
    # lambda not too close to zero
    sgs = sgs.at[:, 3:4].set(10.0 + jnp.abs(sgs[:, 3:4] * 20.0))
    # normalize env energy to 2*pi*0.8
    energy = sg_energy(sgs)
    sgs = sgs.at[:, 4:].set(
        jnp.abs(sgs[:, 4:]) / jnp.sum(energy, axis=0, keepdims=True)
        * 2.0 * np.pi * 0.8
    )
    # deterministic fibonacci lobes, duplicated over both halves
    lobes = jnp.asarray(fibonacci_sphere(num_sgs // 2))
    sgs = sgs.at[: num_sgs // 2, :3].set(lobes)
    sgs = sgs.at[num_sgs // 2:, :3].set(lobes)
    return sgs.astype(jnp.float32)


def render_envmap_sg(lgt_sgs, viewdirs):
    """Evaluate an SG mixture at directions (tensorBase_rotated_lights.py:70-86).

    lgt_sgs: [M, 7]; viewdirs: [..., 3] -> [..., 3].
    """
    lobes = lgt_sgs[:, :3] / jnp.linalg.norm(lgt_sgs[:, :3], axis=-1,
                                             keepdims=True)
    lam = jnp.abs(lgt_sgs[:, 3:4])          # [M, 1]
    mu = jnp.abs(lgt_sgs[:, -3:])           # [M, 3]
    # [..., M] dot products
    dots = jnp.einsum("...d,md->...m", viewdirs, lobes)
    rgb = jnp.einsum("...m,mc->...c", jnp.exp(lam[:, 0] * (dots - 1.0)), mu)
    return rgb


# ------------------------------------------------------------- env lookups

def latlong_lookup(env_hw3, dirs, align_corners: bool, padding: str = "zeros"):
    """Query an [H, W, 3] lat-long env map at unit directions.

    Matches get_light_rgbs' pixel/gt branch (tensorBase_rotated_lights.py:
    597-605): phi = arccos(z) - 1e-6, theta = atan2(y, x),
    query_y = phi/pi*2-1, query_x = -theta/pi; grid_sample.
    """
    phi = jnp.arccos(jnp.clip(dirs[..., 2], -1.0, 1.0)) - 1e-6
    theta = jnp.arctan2(dirs[..., 1], dirs[..., 0])
    qy = (phi / np.pi) * 2.0 - 1.0
    qx = -theta / np.pi
    return bilerp_plane(env_hw3, qx, qy, align_corners=align_corners,
                        padding=padding)


def get_light_rgbs(light_params, cfg, dirs, gt_envmap=None):
    """Per-light radiance at query directions -> [light_num, S, 3].

    Matches tensorBase_rotated_lights.py:577-606 (rotated lights: rotate the
    query dirs per light) and the general-multi-lights variant (independent
    SG set per light, no rotation).

    Args:
      light_params: pytree with 'lgt_sgs' [M,7] or [L,M,7], or 'pixel' [H*W,3].
      cfg: FieldConfig (for light_kind / rotations / envmap size).
      dirs: [S, 3] query directions.
      gt_envmap: [envH, envW, 3] frozen probe for light_kind == 'gt'.
    """
    S = dirs.shape[0]
    if cfg.per_light_sg:
        # [L, M, 7] — general multi-light; dirs are NOT rotated
        out = jax.vmap(lambda sgs: render_envmap_sg(sgs, dirs))(
            light_params["lgt_sgs"])
        return out  # [L, S, 3]

    rots = jnp.asarray(rotation_matrices(cfg.light_rotations))  # [L, 3, 3]
    # remapped[l, s] = dirs[s] @ rots[l]  (reference matmul broadcasting)
    remapped = jnp.einsum("sd,lde->lse", dirs, rots)            # [L, S, 3]
    if cfg.light_kind == "sg":
        return render_envmap_sg(light_params["lgt_sgs"], remapped)
    if cfg.light_kind == "pixel":
        env = jax.nn.softplus(5.0 * light_params["light_pixel"]) / 5.0
        env = env.reshape(cfg.envmap_h, cfg.envmap_w, 3)
        return latlong_lookup(env, remapped, align_corners=False)
    if cfg.light_kind == "gt":
        assert gt_envmap is not None, "gt light kind needs a dataset probe"
        return latlong_lookup(gt_envmap, remapped, align_corners=False)
    raise ValueError(f"unknown light_kind {cfg.light_kind}")


# ---------------------------------------------------- importance sampling

def gen_light_incident_dirs_importance(light_params, cfg, key,
                                       sample_number: int,
                                       light_idx: int = 0,
                                       env_h: int = 128, env_w: int = 256,
                                       gt_envmap=None):
    """Importance-sample incident dirs from the LEARNED environment light.

    The reference's `gen_light_incident_dirs(method='importance_sample')`
    (tensorBase_rotated_lights.py:546-574): render the learned light on a
    jittered 128x256 lat-long grid, build pdf ∝ intensity * sin(theta),
    draw `sample_number` dirs by multinomial, and return
    (light_dir [n,3], light_rgb [n,3], light_pdf [n,1]).
    """
    k_jit, k_draw = jax.random.split(key)
    dirs = stratified_dirs(k_jit, env_h, env_w)      # is_jittor=True grid
    env = get_light_rgbs(light_params, cfg, jnp.asarray(dirs),
                         gt_envmap=gt_envmap)[light_idx]
    env = jax.lax.stop_gradient(env).reshape(env_h, env_w, 3)
    return importance_sample_env(k_draw, env, jnp.asarray(dirs),
                                 sample_number)


def importance_sample_env(key, env_map, env_dirs, n_samples: int):
    """Draw light dirs ~ intensity * sin(theta) via CDF inversion.

    Replaces torch.multinomial (tensorBase_rotated_lights.py:547-572):
    pdf_sample ∝ sum_rgb(env) * sin(theta); pdf_return = pdf_sample*H*W /
    (2*pi^2*sin(theta)).

    Args:
      env_map: [H, W, 3]; env_dirs: [H*W, 3] texel dirs; key: PRNG.
    Returns (light_dir [n,3], light_rgb [n,3], light_pdf [n,1]).
    """
    H, W, _ = env_map.shape
    intensity = jnp.sum(env_map, axis=2)                      # [H, W]
    h_int = 1.0 / H
    sin_theta = jnp.sin(jnp.linspace(0.5 * h_int, np.pi - 0.5 * h_int, H))
    pdf = intensity * sin_theta[:, None]
    pdf_sample = (pdf / jnp.sum(pdf)).reshape(-1)             # [H*W]
    pdf_return = (pdf_sample.reshape(H, W) * H * W
                  / (2.0 * np.pi * np.pi * sin_theta[:, None])).reshape(-1)

    cdf = jnp.cumsum(pdf_sample)
    u = jax.random.uniform(key, (n_samples,))
    idx = jnp.clip(jnp.searchsorted(cdf, u, side="right"), 0, H * W - 1)
    return (jnp.take(env_dirs, idx, axis=0),
            jnp.take(env_map.reshape(-1, 3), idx, axis=0),
            jnp.take(pdf_return, idx)[:, None])
