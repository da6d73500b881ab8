"""Training-step renderer: primary forward + physically-based branch.

Equivalent of `Renderer_TensoIR_train` (renderer.py:57-127). The reference
runs `render_with_BRDF` only on rays with `acc_mask = acc > 0.5` (dynamic
count); here a fixed capacity `relight_ray_cap` of rays is selected
(acc-masked rays first via a stable argsort), rendered, and scattered back —
non-surface rays keep the white background exactly as renderer.py:95.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from tensoir_tpu.models import field as F
from tensoir_tpu.render.primary import render_rays
from tensoir_tpu.render.brdf_render import render_with_brdf


def render_train_batch(
    cfg: F.FieldConfig,
    params: Dict,
    scene: Dict,
    rays: jax.Array,        # [B, 6]
    light_idx: jax.Array,   # [B] int32
    *,
    n_samples: int,
    key: Optional[jax.Array],
    is_train: bool = True,
    is_relight: bool = True,
    white_bg: bool = True,
    sample_method: str = "stratified_sampling",
    app_cap: int = 32,
    march_cap: int = 0,
    march_select: str = "scatter",
    march_group: int = 0,
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
    secondary_stats: bool = False,
    second_window_probe: int = 0,
    second_window_probe_back: int = 0,
    ndc_ray: bool = False,
    relight_ray_cap: int = 1024,
    second_n_sample: int = 96,
    second_near: float = 0.05,
    second_far: float = 1.5,
    secondary_tile: int = 16384,
    normal_gt: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    if key is not None:
        key, k_fwd, k_light = jax.random.split(key, 3)
    else:
        k_fwd = k_light = None

    ret = render_rays(
        cfg, params, scene, rays, light_idx,
        n_samples=n_samples, key=k_fwd, is_train=is_train,
        is_relight=is_relight, white_bg=white_bg, app_cap=app_cap,
        march_cap=march_cap, march_select=march_select,
        march_group=march_group,
        ndc_ray=ndc_ray, normal_gt=normal_gt)

    if not is_relight:
        ret["rgb_with_brdf_map"] = jnp.ones_like(ret["rgb_map"])
        return ret

    B = rays.shape[0]
    acc_mask = ret["acc_mask"]
    normal_map = ret["normal_map"]
    if cfg.normals_kind == "gt_normals" and normal_gt is not None:
        normal_map = normal_gt  # renderer.py:82-83

    cap = min(relight_ray_cap, B) if relight_ray_cap > 0 else B
    if cap < B:
        # stable sort: acc-masked rays first
        order = jnp.argsort(jnp.logical_not(acc_mask), stable=True)
        sel = order[:cap]
    else:
        sel = jnp.arange(B)
    sel_valid = jnp.take(acc_mask, sel)

    rgb_sel = render_with_brdf(
        cfg, params, scene,
        jnp.take(ret["depth_map"], sel, axis=0),
        jnp.take(normal_map, sel, axis=0),
        jnp.take(ret["albedo_map"], sel, axis=0),
        jnp.take(ret["roughness_map"], sel, axis=0),
        jnp.take(ret["fresnel_map"], sel, axis=0),
        jnp.take(rays, sel, axis=0),
        jnp.take(light_idx, sel, axis=0),
        sample_method=sample_method,
        key=k_light,
        second_n_sample=second_n_sample,
        second_near=second_near,
        second_far=second_far,
        secondary_tile=secondary_tile,
        second_march_cap=second_march_cap,
        secondary_use_baked=secondary_use_baked,
        secondary_bake_reso=secondary_bake_reso,
        second_window=second_window,
        second_window_back=second_window_back,
        second_prepass_n=second_prepass_n,
        coarse_dilate=coarse_dilate,
        secondary_compact_frac=secondary_compact_frac,
        second_march_group=second_march_group,
        group_bake_reso=group_bake_reso,
        app_bake_reso=app_bake_reso,
        secondary_app_hoist=secondary_app_hoist,
        second_app_cap=second_app_cap,
        app_pair_frac=app_pair_frac,
        return_secondary_stats=secondary_stats,
        second_window_probe=second_window_probe,
        second_window_probe_back=second_window_probe_back,
    )
    if secondary_stats:
        rgb_sel, sec_stats = rgb_sel
        for k, v in (sec_stats or {}).items():
            ret[f"sec/{k}"] = v
    rgb_sel = jnp.where(sel_valid[:, None], rgb_sel, 1.0)

    # unselected rays keep the white background (renderer.py:95)
    rgb_with_brdf = jnp.ones((B, 3), rgb_sel.dtype).at[sel].set(rgb_sel)
    ret["rgb_with_brdf_map"] = rgb_with_brdf
    # rays whose rgb_with_brdf is meaningful for the loss: actually-relit
    # surface rays, plus non-surface rays (white vs ~white GT — matches the
    # reference, where EVERY acc_mask ray is relit). Capped-out surface rays
    # must not contribute a bogus white-vs-GT penalty.
    computed = jnp.zeros((B,), bool).at[sel].set(sel_valid)
    ret["relight_computed_mask"] = computed | jnp.logical_not(acc_mask)
    ret["normal_map"] = normal_map
    return ret
