"""Primary ray rendering: the field forward pass.

Re-designs `TensorBase.forward` (tensorBase_rotated_lights.py:868-1036) with
TPU-static shapes:

* The reference compacts samples with boolean masks (`xyz_sampled[ray_valid]`,
  `...[app_mask]`) — dynamic shapes XLA cannot compile. Here density is
  evaluated densely (masked to zero), and the expensive appearance/BRDF
  decoders run on a fixed per-ray top-k of samples by compositing weight
  (`app_cap`; 0 = dense over all samples). Dropped samples are the lowest
  weight ones below `raymarch_weight_thres` — the same set the reference
  skips, capped.
* Randomized white background and the per-ray march jitter consume explicit
  PRNG keys.

Returns a dict of per-ray maps identical in meaning to the reference's
12-tuple.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from tensoir_tpu.models import field as F
from tensoir_tpu.models import mlps
from tensoir_tpu.ops.compositing import raw2alpha
from tensoir_tpu.ops.color import linear2srgb
from tensoir_tpu.ops.rays import sample_ray, z_to_dists, safe_l2_normalize
from tensoir_tpu.ops.sh import eval_sh_bases


def shade_radiance(cfg: F.FieldConfig, params, pts, viewdirs, features):
    """Dispatch on shading mode (init_render_func,
    tensorBase_rotated_lights.py:405-434)."""
    if cfg.shading_mode == "MLP_Fea":
        x = mlps.render_fea_inputs(features, viewdirs, cfg.view_pe, cfg.fea_pe)
        return jax.nn.sigmoid(mlps.apply_mlp(params["render_mlp"], x, cfg.cdtype))
    if cfg.shading_mode == "MLP_PE":
        x = mlps.render_pe_inputs(pts, features, viewdirs, cfg.view_pe, cfg.pos_pe)
        return jax.nn.sigmoid(mlps.apply_mlp(params["render_mlp"], x, cfg.cdtype))
    if cfg.shading_mode == "MLP":
        x = mlps.render_plain_inputs(features, viewdirs, cfg.view_pe)
        return jax.nn.sigmoid(mlps.apply_mlp(params["render_mlp"], x, cfg.cdtype))
    if cfg.shading_mode == "SH":
        sh_mult = eval_sh_bases(2, viewdirs)[..., None, :]
        rgb_sh = features.reshape(*features.shape[:-1], 3, 9)
        return jax.nn.relu(jnp.sum(sh_mult * rgb_sh, axis=-1) + 0.5)
    if cfg.shading_mode == "RGB":
        return features
    raise ValueError(f"unknown shading mode {cfg.shading_mode}")


def select_occupied_samples(valid: jax.Array, cap: int):
    """Indices of the first `cap` occupied samples per ray (ascending depth).

    TPU-native replacement for the reference's dynamic boolean compaction of
    `ray_valid` (tensorBase_rotated_lights.py:915-919): marching evaluates
    the cheap occupancy mask densely, then the expensive VM field only on a
    fixed top-k of occupied samples. Exact whenever <= cap samples per ray
    are occupied (invalid samples contribute sigma = 0 either way; the
    transmittance product is over per-sample spacings, so skipping
    zero-sigma samples does not change it).

    Args:
      valid: [B, S] bool occupancy.
      cap: static k.
    Returns (idx [B, k] int32 ascending, sel_valid [B, k] bool).
    """
    B, S = valid.shape
    score = jnp.where(valid, (S - jax.lax.broadcasted_iota(
        jnp.int32, (B, S), 1)).astype(jnp.float32), -1.0)
    top, idx = jax.lax.top_k(score, cap)     # descending score = ascending depth
    return idx, top > 0.0


def select_occupied_samples_scatter(valid: jax.Array, cap: int):
    """Same contract as select_occupied_samples, via cumsum + one scatter
    instead of a [B, S] sort. Selection by ascending depth needs no ordering
    by value, so a slot-assignment scatter (B*S rows) replaces top_k — on TPU
    scatters are row-count-bound like gathers, while top_k lowers to a full
    variadic sort over S. Exact under the same condition (<= cap occupied
    samples per ray); overflow drops the DEEPEST samples, identical to the
    top_k variant (scores there are descending in depth)."""
    B, S = valid.shape
    pos = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1      # [B, S]
    pos = jnp.where(valid & (pos < cap), pos, cap)             # cap = dump slot
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    idx = jnp.full((B, cap + 1), S - 1, jnp.int32)
    idx = idx.at[jnp.arange(B)[:, None], pos].set(iota)
    idx = idx[:, :cap]
    count = jnp.sum(valid, axis=1)
    sel_valid = jax.lax.broadcasted_iota(jnp.int32, (B, cap), 1) \
        < count[:, None]
    return idx, sel_valid


def compact_nonzero(score: jax.Array, cap: int):
    """Indices of the first `cap` entries with score > 0 (1-D compaction via
    cumsum + scatter; the secondary pair-selection analog of
    select_occupied_samples_scatter). Returns (idx [cap], valid [cap])."""
    (N,) = score.shape
    nz = score > 0
    pos = jnp.cumsum(nz.astype(jnp.int32)) - 1
    pos = jnp.where(nz & (pos < cap), pos, cap)
    # unfilled slots keep the out-of-range marker N: gathers through them
    # clip (and are masked by `valid`); scatters through them must use
    # mode='drop' so they can't alias a real row
    idx = jnp.full((cap + 1,), N, jnp.int32).at[pos].set(
        jnp.arange(N, dtype=jnp.int32))
    count = jnp.sum(nz)
    valid = jnp.arange(cap) < jnp.minimum(count, cap)
    return idx[:cap], valid


def _relative_smoothness(values, values_jitter):
    """sum(((v - vj)/max(v, vj))^2) (tensorBase_rotated_lights.py:858-863)."""
    base = jnp.clip(jnp.maximum(values, values_jitter), 1e-6, None)
    return jnp.sum(((values - values_jitter) / base) ** 2, axis=-1,
                   keepdims=True)


def render_rays(
    cfg: F.FieldConfig,
    params: Dict,
    scene: Dict,
    rays: jax.Array,          # [B, 6]
    light_idx: jax.Array,     # [B] int32
    *,
    n_samples: int,
    key: Optional[jax.Array] = None,   # None => eval (no jitter / fixed bg)
    is_train: bool = False,
    is_relight: bool = True,
    white_bg: bool = True,
    app_cap: int = 32,
    march_cap: int = 0,   # 0 = dense march; >0 = occupancy-culled marching
    march_select: str = "scatter",  # occupied-sample selection:
                                    # 'scatter' (cumsum+scatter, default)
                                    # or 'topk' (sort) — bit-identical
    march_group: int = 0,  # grouped primary march: select GROUPS of g
                           # consecutive samples, density via one 16-corner
                           # block row per group (g x fewer gather/scatter
                           # rows on the march's density fwd+bwd)
    ndc_ray: bool = False,
    normal_gt: Optional[jax.Array] = None,  # [B, 3] for 'gt_normals'
) -> Dict[str, jax.Array]:
    B = rays.shape[0]
    rays_o, viewdirs = rays[:, :3], rays[:, 3:6]
    aabb = scene["aabb"]
    grid = F.grid_size_of(params)
    step = F.step_size(aabb, grid, cfg.step_ratio)
    near, far = cfg.near_far

    if key is not None:
        key, k_march, k_bg, k_jit = jax.random.split(key, 4)
    else:
        k_march = k_bg = k_jit = None

    if ndc_ray:
        # forward-facing NDC marching (tensorBase_rotated_lights.py:872-877):
        # uniform z in [near, far], dists scaled by the unnormalized ray
        # norm, viewdirs normalized afterwards
        from tensoir_tpu.ops.rays import sample_ray_ndc
        xyz, z_vals, ray_valid = sample_ray_ndc(
            rays_o, viewdirs, aabb, near, far, n_samples,
            key=k_march if is_train else None)
        dists = z_to_dists(z_vals)
        rays_norm = jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
        dists = dists * rays_norm
        viewdirs = viewdirs / jnp.maximum(rays_norm, 1e-12)
    else:
        xyz, z_vals, ray_valid = sample_ray(
            rays_o, viewdirs, aabb, near, far, step, n_samples,
            key=k_march if is_train else None)
        dists = z_to_dists(z_vals)

    coords = F.normalize_coord(aabb, xyz)                      # [B, S, 3]

    # occupancy-culled marching: ONE-gather nearest test on the dilated mask
    # selects the first march_cap candidate samples per ray; the exact
    # 8-gather trilinear mask (tensorBase_rotated_lights.py:892-897) then
    # gates only the kept samples — a strict superset of the reference's
    # culling, so results are identical (see select_occupied_samples)
    if 0 < march_cap < n_samples:
        if march_select not in ("scatter", "topk"):
            raise ValueError(f"unknown march_select {march_select!r} "
                             "(expected 'scatter' or 'topk')")
        occ = F.sample_alpha_mask_nearest(scene, xyz)
        select = (select_occupied_samples_scatter if march_select == "scatter"
                  else select_occupied_samples)
        valid_occ = ray_valid & occ
        if march_group > 1 and ndc_ray:
            # sample_ray_ndc spaces samples uniformly in [near, far] with
            # per-sample jitter — spacing is unrelated to step_ratio, so the
            # (g-1)*step_ratio block contract below proves nothing and the
            # 16-corner block query could silently drop corner weights
            raise ValueError(
                "march_group > 1 is not supported with ndc_ray=True: the "
                "NDC march's sample spacing is not step_ratio-based, so the "
                "3x3-cell block contract cannot be checked statically")
        if march_group > 1:
            # group-aligned selection: keep GROUPS of `g` raw-consecutive
            # samples (any member occupied). A superset of the per-sample
            # selection — false-positive members are masked to sigma=0 by
            # the gathered per-sample validity below — so results are
            # identical while the kept samples stay depth-adjacent, which
            # is what lets density use one block row per group
            # (field.density_feature_grouped). Overflow (> cap/g occupied
            # groups) drops the deepest groups, like the per-sample cap.
            g = march_group
            if march_cap % g:
                raise ValueError(f"march_group={g} must divide "
                                 f"march_cap={march_cap}")
            # block-row exactness contract: group members must stay within
            # a 3x3-cell block, i.e. per-axis span (g-1)*step <= 2 cells.
            # step = step_ratio * mean(units). This static check assumes
            # near-isotropic units (true for cubic init grids and after
            # every N_to_reso upsample); anisotropy after a non-uniform
            # shrink is the CALLER's contract — the train loop re-checks
            # against live units at each phase rebuild and downgrades
            # (loop.resolve_primary_march_group).
            if (g - 1) * cfg.step_ratio > 2.0:
                raise ValueError(
                    f"march_group={g} at step_ratio={cfg.step_ratio} "
                    f"violates the 16-corner block contract "
                    f"((g-1)*step_ratio = {(g - 1) * cfg.step_ratio:.2f} "
                    f"> 2 cells)")
            n_groups = -(-n_samples // g)
            vpad = jnp.pad(valid_occ,
                           ((0, 0), (0, n_groups * g - n_samples)))
            gvalid = jnp.any(vpad.reshape(B, n_groups, g), axis=2)
            # overflow monitor: grouped selection keeps march_cap/g OCCUPIED
            # GROUPS — with fragmented occupancy that can be up to g x fewer
            # occupied SAMPLES than the per-sample cap would keep. Exactness
            # vs the per-sample march holds only on non-overflowing rays, so
            # surface the rate (cheap adoption gate; see ADVICE r2)
            march_overflow_frac = jnp.mean(
                (jnp.sum(gvalid, axis=1) > march_cap // g)
                .astype(jnp.float32))
            gidx, gsel = select(gvalid, march_cap // g)
            midx_raw = (gidx[..., None] * g
                        + jnp.arange(g, dtype=jnp.int32)
                        ).reshape(B, march_cap)
            midx = jnp.minimum(midx_raw, n_samples - 1)
            ray_valid = (jnp.repeat(gsel, g, axis=1)
                         & (midx_raw < n_samples)
                         & jnp.take_along_axis(valid_occ, midx, axis=1))
        else:
            march_overflow_frac = jnp.mean(
                (jnp.sum(valid_occ, axis=1) > march_cap)
                .astype(jnp.float32))
            midx, ray_valid = select(valid_occ, march_cap)
        coords = jnp.take_along_axis(coords, midx[..., None], axis=1)
        z_vals = jnp.take_along_axis(z_vals, midx, axis=1)
        dists = jnp.take_along_axis(dists, midx, axis=1)
        xyz_sel = jnp.take_along_axis(xyz, midx[..., None], axis=1)
        ray_valid = ray_valid & (F.sample_alpha_mask(scene, xyz_sel) > 0)
    else:
        ray_valid = ray_valid & (F.sample_alpha_mask(scene, xyz) > 0)

    # density — dense masked compute on the (possibly culled) sample set
    if (march_group > 1 and 0 < march_cap < n_samples
            and cfg.decomp in ("vm", "vm_stacked")):
        sigma_feat = F.density_feature_grouped(
            cfg, params,
            coords.reshape(B, march_cap // march_group, march_group, 3)
        ).reshape(B, march_cap)
    else:
        sigma_feat = F.density_feature(cfg, params, coords)
    sigma = jnp.where(ray_valid, F.feature2density(cfg, sigma_feat), 0.0)

    alpha, weight, bg_weight = raw2alpha(sigma, dists * cfg.distance_scale)

    acc_map = jnp.sum(weight, -1)
    depth_map = jnp.sum(weight * z_vals, -1)

    # ---- appearance compaction: fixed-size top-k by weight ----
    S = weight.shape[1]
    k = app_cap if 0 < app_cap < S else S
    if k < S:
        masked_w = jnp.where(weight > cfg.raymarch_weight_thres, weight, -1.0)
        top_w, top_idx = jax.lax.top_k(masked_w, k)             # [B, k]
        sel_mask = top_w > 0.0
    else:
        top_idx = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
        top_w = weight
        sel_mask = weight > cfg.raymarch_weight_thres

    def gather(x):
        return jnp.take_along_axis(x, top_idx[..., None], axis=1)

    pts_sel = gather(coords)                                    # [B, k, 3]
    # top_w IS the gathered weight wherever sel_mask holds (and w_sel is
    # masked anyway) — no second [B, k] gather needed on the hot path
    w_sel = top_w * sel_mask
    vdirs_sel = jnp.broadcast_to(viewdirs[:, None, :], pts_sel.shape)
    lidx_sel = jnp.broadcast_to(light_idx[:, None], (B, pts_sel.shape[1]))

    rad_feat, intr_feat = F.both_features(cfg, params, pts_sel, lidx_sel)
    rgb = shade_radiance(cfg, params, pts_sel, vdirs_sel, rad_feat)  # [B,k,3]
    rgb_map = jnp.sum(w_sel[..., None] * rgb, axis=-2)

    out = {
        "rgb_map": rgb_map,
        "depth_map": depth_map,
        "acc_map": acc_map,
    }
    if 0 < march_cap < n_samples:
        out["march_overflow_frac"] = march_overflow_frac

    # background decision: white_bg or 50% random at train
    # (tensorBase_rotated_lights.py:979,1004)
    if white_bg:
        use_bg = jnp.asarray(True)
    elif is_train and k_bg is not None:
        use_bg = jax.random.uniform(k_bg, ()) < 0.5
    else:
        use_bg = jnp.asarray(False)
    bgw = use_bg.astype(rgb_map.dtype)

    if not is_relight:
        out["depth_map"] = depth_map + bgw * (1.0 - acc_map) * rays[:, -1]
        out["rgb_map"] = rgb_map + bgw * (1.0 - acc_map[..., None])
        return out

    # ---- relighting branch: BRDF + normals on the selected samples ----
    brdf_in = mlps.brdf_pe_fea_inputs(pts_sel, intr_feat, cfg.pos_pe, cfg.fea_pe)
    brdf = jax.nn.sigmoid(mlps.apply_mlp(params["brdf_mlp"], brdf_in, cfg.cdtype))
    albedo = brdf[..., :3]
    roughness = brdf[..., 3:4] * 0.9 + 0.09   # remap (tensorBase:933)

    # jittered BRDF smoothness (tensorBase_rotated_lights.py:937-943)
    if k_jit is not None:
        noise = jax.random.normal(k_jit, pts_sel.shape) * 0.01
    else:
        noise = jnp.zeros_like(pts_sel)
    pts_jit = pts_sel + noise
    intr_jit = F.intrin_feature(cfg, params, pts_jit)
    brdf_jit_in = mlps.brdf_pe_fea_inputs(pts_jit, intr_jit, cfg.pos_pe, cfg.fea_pe)
    brdf_jit = jax.nn.sigmoid(
        mlps.apply_mlp(params["brdf_mlp"], brdf_jit_in, cfg.cdtype))
    albedo_jit = brdf_jit[..., :3]
    roughness_jit = brdf_jit[..., 3:4] * 0.9 + 0.09

    albedo_sm = _relative_smoothness(albedo, albedo_jit) * sel_mask[..., None]
    roughness_sm = _relative_smoothness(roughness, roughness_jit) * sel_mask[..., None]

    # normals (tensorBase_rotated_lights.py:946-971)
    normals_diff = jnp.zeros_like(albedo_sm)
    normals_ori = jnp.zeros_like(albedo_sm)
    if cfg.normals_kind == "purely_predicted":
        nrm_in = mlps.brdf_pe_fea_inputs(pts_sel, intr_feat, cfg.pos_pe, cfg.fea_pe)
        normals = jnp.tanh(mlps.apply_mlp(params["normal_mlp"], nrm_in, cfg.cdtype))
    elif cfg.normals_kind == "purely_derived":
        normals = F.derived_normals(cfg, params, pts_sel.reshape(-1, 3)).reshape(pts_sel.shape)
    elif cfg.normals_kind == "gt_normals":
        normals = jnp.zeros_like(pts_sel)  # substituted by the renderer
    elif cfg.normals_kind in ("derived_plus_predicted", "residue_prediction"):
        derived = F.derived_normals(cfg, params, pts_sel.reshape(-1, 3)).reshape(pts_sel.shape)
        if cfg.normals_kind == "derived_plus_predicted":
            nrm_in = mlps.brdf_pe_fea_inputs(pts_sel, intr_feat, cfg.pos_pe, cfg.fea_pe)
        else:
            nrm_in = mlps.normal_residue_inputs(pts_sel, derived, intr_feat,
                                                cfg.pos_pe, cfg.fea_pe)
        normals = jnp.tanh(mlps.apply_mlp(params["normal_mlp"], nrm_in, cfg.cdtype))
        normals_diff = (jnp.sum((normals - derived) ** 2, -1, keepdims=True)
                        * sel_mask[..., None])
        normals_ori = (jnp.clip(jnp.sum(vdirs_sel * normals, -1, keepdims=True),
                                0.0, None) * sel_mask[..., None])
    else:
        raise ValueError(cfg.normals_kind)

    w1 = w_sel[..., None]
    normal_map = jnp.sum(w1 * normals, -2)
    albedo_map = jnp.sum(w1 * albedo, -2)
    roughness_map = jnp.sum(w1 * roughness, -2)
    fresnel_map = jnp.full_like(albedo_map, cfg.fixed_fresnel)
    normals_diff_map = jnp.sum(w1 * normals_diff, -2)
    normals_ori_map = jnp.sum(w1 * normals_ori, -2)
    albedo_sm_map = jnp.sum(w1 * albedo_sm, -2)
    roughness_sm_map = jnp.sum(w1 * roughness_sm, -2)

    acc1 = (1.0 - acc_map[..., None]) * bgw
    depth_map = depth_map + bgw * (1.0 - acc_map) * rays[:, -1]
    rgb_map = rgb_map + acc1
    normal_map = normal_map + acc1 * jnp.asarray([0.0, 0.0, 1.0])
    albedo_map = albedo_map + acc1
    roughness_map = roughness_map + acc1
    fresnel_map = fresnel_map + acc1

    rgb_map = linear2srgb(jnp.clip(rgb_map, 0.0, 1.0))

    out.update({
        "rgb_map": rgb_map,
        "depth_map": depth_map,
        "normal_map": safe_l2_normalize(normal_map, axis=-1),
        "albedo_map": jnp.clip(albedo_map, 0.0, 1.0),
        "roughness_map": jnp.clip(roughness_map, 0.0, 1.0),
        "fresnel_map": jnp.clip(fresnel_map, 0.0, 1.0),
        "normals_diff_map": normals_diff_map,
        "normals_orientation_loss_map": normals_ori_map,
        "albedo_smoothness_loss": jnp.mean(albedo_sm_map),
        "roughness_smoothness_loss": jnp.mean(roughness_sm_map),
        "acc_mask": acc_map > 0.5,
    })
    return out
