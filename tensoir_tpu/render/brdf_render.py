"""The rendering equation at surface points (render_with_BRDF,
relight_utils.py:403-483), TPU-static.

Given a G-buffer (depth/normal/albedo/roughness/fresnel per ray), sample
incident light directions, march secondary rays for visibility + indirect
light, evaluate the BRDF, and integrate the rendering equation.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tensoir_tpu.models import field as F
from tensoir_tpu.models import lighting
from tensoir_tpu.ops.brdf import ggx_specular
from tensoir_tpu.ops.color import linear2srgb
from tensoir_tpu.ops.rays import safe_l2_normalize
from tensoir_tpu.render.secondary import secondary_shading_tiled


def incident_light_dirs(cfg: F.FieldConfig, sample_method: str,
                        key: Optional[jax.Array],
                        params: Optional[Dict] = None,
                        gt_envmap=None):
    """Light-direction set for the integral (gen_light_incident_dirs,
    tensorBase_rotated_lights.py:492-574).

    Returns (dirs [L, 3], light_pdf [L, 1] or None). The pdf is non-None
    only for 'importance_sample' — dirs drawn from the LEARNED light's
    intensity*sin(theta) distribution (tensorBase_rotated_lights.py:
    546-574), which the caller must pair with the Monte Carlo estimator
    mean(brdf * L * cos / pdf) instead of the area-weighted sum. With
    key=None (deterministic eval) importance sampling degrades to the
    fixed lat-long grid, like the other stochastic modes.
    """
    if sample_method == "importance_sample" and key is not None:
        if params is None:
            raise ValueError("importance_sample needs the light params")
        dirs, _, pdf = lighting.gen_light_incident_dirs_importance(
            params, cfg, key, cfg.envmap_h * cfg.envmap_w,
            gt_envmap=gt_envmap)
        return dirs, pdf
    if sample_method in ("fixed_envirmap", "importance_sample") or key is None:
        _, dirs = lighting.envmap_dirs(cfg.envmap_h, cfg.envmap_w)
        return jnp.asarray(dirs), None
    if sample_method == "stratified_sampling":
        return lighting.stratified_dirs(key, cfg.envmap_h, cfg.envmap_w), None
    if sample_method == "stratifed_sample_equal_areas":
        return lighting.stratified_equal_area_dirs(key, cfg.envmap_h,
                                                   cfg.envmap_w), None
    raise ValueError(f"unknown light sample method {sample_method}")


def render_with_brdf(
    cfg: F.FieldConfig,
    params: Dict,
    scene: Dict,
    depth_map: jax.Array,      # [P]
    normal_map: jax.Array,     # [P, 3]
    albedo_map: jax.Array,     # [P, 3]
    roughness_map: jax.Array,  # [P, 1]
    fresnel_map: jax.Array,    # [P, 3]
    rays: jax.Array,           # [P, 6]
    light_idx: jax.Array,      # [P] int32
    *,
    sample_method: str = "stratified_sampling",
    key: Optional[jax.Array] = None,
    second_n_sample: int = 96,
    second_near: float = 0.05,
    second_far: float = 1.5,
    secondary_tile: int = 16384,
    second_march_cap: int = 32,
    secondary_use_baked: bool = True,
    secondary_bake_reso: int = 0,
    second_window: int = 0,
    second_window_back: int = 0,
    second_prepass_n: int = 18,
    coarse_dilate: int = 2,
    secondary_compact_frac: float = 0.0,
    second_march_group: int = 0,
    group_bake_reso: int = 0,
    app_bake_reso: int = 0,
    secondary_app_hoist: bool = False,
    second_app_cap: int = 16,
    app_pair_frac: float = 0.0,
    return_secondary_stats: bool = False,
    second_window_probe: int = 0,
    second_window_probe_back: int = 0,
    use_linear2srgb: bool = True,
) -> jax.Array:
    """Physically-based RGB per ray [P, 3] (relight_utils.py:403-483)."""
    P = rays.shape[0]
    rays_o, rays_d = rays[:, :3], rays[:, 3:6]
    surface_xyz = rays_o + depth_map[:, None] * rays_d          # [P, 3]

    area_weight, _ = lighting.envmap_dirs(cfg.envmap_h, cfg.envmap_w)
    area_weight = jnp.asarray(area_weight)                      # [L]

    in_dirs, light_pdf = incident_light_dirs(
        cfg, sample_method, key, params=params,
        gt_envmap=scene.get("gt_envmap"))                       # [L, 3]
    L = in_dirs.shape[0]
    surf2l = jnp.broadcast_to(in_dirs[None], (P, L, 3))
    surf2c = safe_l2_normalize(-rays_d, axis=-1)

    # hemisphere cosine mask (relight_utils.py:433-435)
    cosine = jnp.clip(jnp.einsum("plk,pk->pl", surf2l, normal_map), 0.0, None)
    cosine_mask = cosine > 1e-6

    if sample_method == "importance_sample":
        # Importance dirs concentrate around the learned light lobe, so the
        # cosine-valid pair fraction is NOT bounded near the ~0.5 that
        # grid/stratified lat-long dir sets guarantee (a tight lobe over a
        # facing surface validates nearly every pair). The hemisphere-pair
        # compaction capacity contract (secondary_compact_frac, tuned at
        # 0.5625 for lat-long sets) therefore does not hold — overflowed
        # pairs would silently get vis=0/indirect=0 and bias the MC
        # estimator dark. Run this mode uncompacted.
        secondary_compact_frac = 0.0

    sec = secondary_shading_tiled(
        cfg, params, scene, surface_xyz, surf2l, light_idx, cosine_mask,
        n_sample=second_n_sample, vis_near=second_near, vis_far=second_far,
        tile=secondary_tile, march_cap=second_march_cap,
        app_cap=second_app_cap,
        use_baked=secondary_use_baked, bake_reso=secondary_bake_reso,
        window=second_window, window_back=second_window_back,
        prepass_n=second_prepass_n,
        coarse_dilate=coarse_dilate,
        compact_frac=secondary_compact_frac,
        march_group=second_march_group,
        group_bake_reso=group_bake_reso,
        app_bake_reso=app_bake_reso,
        app_hoist=secondary_app_hoist,
        app_pair_frac=app_pair_frac,
        return_stats=return_secondary_stats,
        window_probe=second_window_probe,
        window_probe_back=second_window_probe_back)
    visibility, indirect = sec[0], sec[1]
    sec_stats = sec[2] if return_secondary_stats else None

    specular = ggx_specular(normal_map, surf2c, surf2l, roughness_map,
                            fresnel_map)                        # [P, L, 3]
    surface_brdf = albedo_map[:, None, :] / np.pi + specular

    env_rgbs = lighting.get_light_rgbs(
        params, cfg, in_dirs, gt_envmap=scene.get("gt_envmap"))  # [Ln, L, 3]
    direct = jnp.take(env_rgbs, light_idx, axis=0)               # [P, L, 3]

    light_rgbs = visibility * direct + indirect                  # [P, L, 3]

    if sample_method == "stratifed_sample_equal_areas":
        rgb = jnp.mean(4.0 * np.pi * surface_brdf * light_rgbs
                       * cosine[..., None], axis=1)
    elif light_pdf is not None:
        # importance-sampled Monte Carlo estimator: dirs were drawn from
        # pdf ∝ intensity*sin(theta) over the sphere, so the integral is
        # mean(brdf * L * cos / pdf) — the pdf-weighted analog of the
        # equal-area estimator at relight_utils.py:470-475 (the reference
        # implements the sampler at tensorBase_rotated_lights.py:546-574
        # but never wires this estimator; its relight pipeline uses the
        # same math per-point, scripts/relight_importance.py:119-144)
        inv_pdf = 1.0 / jnp.maximum(light_pdf[None, :, :], 1e-8)  # [1,L,1]
        rgb = jnp.mean(surface_brdf * light_rgbs * cosine[..., None]
                       * inv_pdf, axis=1)
    else:
        rgb = jnp.sum(surface_brdf * light_rgbs * cosine[..., None]
                      * area_weight[None, :, None], axis=1)
    rgb = jnp.clip(rgb, 0.0, 1.0)
    if use_linear2srgb:
        rgb = linear2srgb(rgb)
    if return_secondary_stats:
        return rgb, sec_stats
    return rgb
