"""Secondary-ray marching: visibility + indirect radiance.

Re-designs relight_utils.py:344-399/657-705/777-834 with static shapes and a
scanned tiling over the (surface-point x light-dir) axis — the reference's
`chunk_size=15000` Python loop becomes a `lax.map` over fixed tiles inside
jit, and the whole pass is wrapped in stop_gradient at the call site
(reference: @torch.no_grad on compute_secondary_shading_effects).

This is the dominant hot loop of TensoIR training (SURVEY.md §3.1) and the
framework's "context parallel" axis: tiles shard cleanly over the data mesh
because every (point, dir) pair is independent.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tensoir_tpu.models import field as F
from tensoir_tpu.render import primary
from tensoir_tpu.ops.compositing import raw2alpha
from tensoir_tpu.ops.rays import sample_ray_equally, z_to_dists


def _march_window(cfg, baked, coarse, aabb, o, d, *, n_sample: int,
                  vis_near: float, vis_far: float, window: int,
                  prepass_n: int, window_back: int = 0, baked27=None,
                  group: int = 2):
    """Interval-culled secondary march: prepass the coarse occupancy to
    bound the occupied span [t_enter, t_exit], then fine-march only the
    `window` canonical sample positions inside it.

    Sample positions/dists inside the window are exactly those of the full
    n_sample march (sample_ray_equally's z grid), and the conservative
    coarse bake (field.bake_coarse_occupancy) guarantees every cell with
    non-negligible sigma lies inside the span, so the result matches the
    full march up to (a) the feature threshold (transmittance error <~2e-3)
    and (b) span truncation when the occupied span exceeds `window` samples
    — by which point the accumulated opacity has long saturated.

    window_back > 0 splits the budget into a FRONT window of
    (window - window_back) samples anchored at the span entry and a BACK
    window anchored at the span exit (clipped to never overlap the front).
    Same row count, strictly better coverage: still exact for any span up
    to `window` samples, and additionally covers the common two-interval
    case (near occluder + far surface with an empty gap — e.g. an object
    over a ground plane) that a single contiguous window truncates.
    Measured span distribution on the trained shadow scene: median 29 of
    96 but p90 = 90 — the tail IS the two-interval case.

    Gathers per pair: prepass_n (tiny coarse table) + window, vs n_sample
    for the full march — the row-count cut that matters on TPU.

    Returns (coords [N,K,3], sigma [N,K], dists [N,K]).
    """
    N = o.shape[0]
    S = n_sample
    dt = (vis_far - vis_near) / (S - 1)

    # --- prepass: conservative occupancy at prepass_n equally spaced ts,
    # placed over the ray's IN-AABB parameter range [t_lo, t_hi] rather
    # than the full [vis_near, vis_far]. Clamping the sample range (instead
    # of masking out-of-aabb samples with an in-bounds test) closes a
    # boundary hole: with masking, occupied cells between the last in-aabb
    # sample and the aabb exit got no prepass hit at all. Per-pair spacing
    # only SHRINKS vs the nominal, so the conservativeness contract
    # (half spacing <= dilation margin) keeps holding.
    eps = jnp.asarray(1e-9, o.dtype)
    t0b = (aabb[0] - o) / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    t1b = (aabb[1] - o) / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    t_en = jnp.max(jnp.minimum(t0b, t1b), axis=-1)               # [N]
    t_ex = jnp.min(jnp.maximum(t0b, t1b), axis=-1)               # [N]
    t_lo = jnp.clip(t_en, vis_near, vis_far)
    t_hi = jnp.clip(t_ex, vis_near, vis_far)
    hit = t_hi > t_lo + eps
    frac = jnp.linspace(0.0, 1.0, prepass_n, dtype=o.dtype)
    tp = t_lo[:, None] * (1.0 - frac[None]) + t_hi[:, None] * frac[None]
    s_p = ((t_hi - t_lo) / (prepass_n - 1))[:, None]             # [N, 1]
    xyz_p = o[:, None, :] + d[:, None, :] * tp[..., None]
    occ = F.coarse_occupancy_lookup(
        coarse, baked.shape, F.normalize_coord(aabb, xyz_p))     # [N, P]
    occ = occ & hit[:, None]

    big = jnp.asarray(1e9, o.dtype)
    t_ent = jnp.min(jnp.where(occ, tp - 0.5 * s_p, big), axis=1)
    t_exit = jnp.max(jnp.where(occ, tp + 0.5 * s_p, -big), axis=1)
    any_occ = jnp.any(occ, axis=1)

    j0 = jnp.clip(jnp.floor((t_ent - vis_near) / dt),
                  0, S - 1).astype(jnp.int32)
    j1 = jnp.clip(jnp.ceil((t_exit - vis_near) / dt),
                  0, S - 1).astype(jnp.int32)

    if 0 < window_back < window:
        k_front = window - window_back
        jj_f = j0[:, None] + jnp.arange(k_front, dtype=jnp.int32)[None, :]
        # back window ends at j1; never overlaps the front window
        start_b = jnp.maximum(j1 - window_back + 1, j0 + k_front)
        jj_b = start_b[:, None] + jnp.arange(window_back,
                                             dtype=jnp.int32)[None, :]
        jj = jnp.concatenate([jj_f, jj_b], axis=1)               # [N, K]
    else:
        jj = j0[:, None] + jnp.arange(window,
                                      dtype=jnp.int32)[None, :]  # [N, K]
    m = any_occ[:, None] & (jj <= j1[:, None]) & (jj <= S - 1)
    # canonical sample position of index j (identical to sample_ray_equally)
    tfrac = jj.astype(o.dtype) / (S - 1)
    z = vis_near * (1.0 - tfrac) + vis_far * tfrac
    xyz = o[:, None, :] + d[:, None, :] * z[..., None]
    valid = m & jnp.all((xyz >= aabb[0]) & (xyz <= aabb[1]), axis=-1)
    coords = F.normalize_coord(aabb, xyz)
    if baked27 is not None:
        # grouped march: `group` consecutive window samples span
        # (group-1) fine steps — under check_pair_contract their cells
        # differ <= 1 per axis, so ONE 27-corner block row serves the whole
        # group. The window is built from contiguous runs (front/back are
        # each group-divisible by construction in the caller), so reshaping
        # to [.., K/g, g] groups consecutive j's and never straddles the
        # front/back seam.
        N, K, _ = coords.shape
        feat = F.density_feature_group_packed(
            baked27, coords.reshape(N, K // group, group, 3)).reshape(N, K)
    else:
        feat = F.density_feature_packed(baked, coords)
    sigma = jnp.where(valid, F.feature2density(cfg, feat), 0.0)
    dists = jnp.where(jj >= S - 1, 0.0, dt).astype(o.dtype)
    return coords, sigma, dists


def compute_radiance(
    cfg: F.FieldConfig,
    params: Dict,
    scene: Dict,
    surf_pts: jax.Array,       # [N, 3] world-space surface points
    light_in_dir: jax.Array,   # [N, 3] surface->light unit dirs
    light_idx: jax.Array,      # [N] int32
    *,
    n_sample: int = 96,
    vis_near: float = 0.05,
    vis_far: float = 1.5,
    app_cap: int = 16,
    app_pair_cap: int = 0,
    march_cap: int = 0,
    baked=None,
    coarse=None,
    baked27=None,
    march_group: int = 2,
    app_baked=None,
    window: int = 0,
    window_back: int = 0,
    prepass_n: int = 18,
    pair_select: str = "compact",
    return_app_payload: bool = False,
    return_stats: bool = False,
    pair_ok: "jax.Array | None" = None,
    probe_window: int = 0,
    probe_window_back: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """March a secondary ray: (nerv_vis, nerfactor_vis, indirect_light).

    With return_app_payload=True the appearance stage is NOT evaluated
    here; the third return value is instead the dict of selected app
    inputs (pts/weights/dirs/light idx/pair idx) so the caller can run ONE
    global appearance batch across all tiles (secondary_shading_tiled's
    app-hoist mode): the per-tile lax.map body then contains only the
    march, and the appearance kernels run once at 36x the size instead of
    as 36 small sequenced instances (round-3 profile: the app stage costs
    21.4 ms per app sample ≈ 100x its gather+MLP cost — per-tile kernel
    sequencing is the prime suspect, BASELINE.md).

    Matches relight_utils.py:777-834: sigma march in [vis_near, vis_far],
    visibility = final transmittance ('nerv') or 1-acc ('nerfactor'),
    indirect = weight-composited radiance-field RGB along the ray (queried
    with `compute_appfeature`, i.e. the light-conditioned radiance).

    march_cap > 0 enables occupancy-culled marching: the dense VM density is
    only evaluated on the first march_cap alpha-mask-occupied samples
    (primary.select_occupied_samples) — the dominant-cost optimization for
    the visibility hot loop (SURVEY.md §3.1).
    """
    aabb = scene["aabb"]
    if baked is not None and coarse is not None and 0 < window < n_sample:
        # interval-culled march: prepass_n coarse + window fine gathers
        # instead of n_sample fine gathers per pair
        coords, sigma, dists = _march_window(
            cfg, baked, coarse, aabb, surf_pts, light_in_dir,
            n_sample=n_sample, vis_near=vis_near, vis_far=vis_far,
            window=window, prepass_n=prepass_n, window_back=window_back,
            baked27=baked27, group=march_group)
    else:
        xyz, z_vals, valid = sample_ray_equally(
            surf_pts, light_in_dir, aabb, vis_near, vis_far, n_sample)
        dists = z_to_dists(jnp.broadcast_to(z_vals, xyz.shape[:2]))
        coords = F.normalize_coord(aabb, xyz)
        if baked is not None:
            # corner-packed baked grid: ONE gather per sample; the alpha
            # mask is folded in at bake time, so no occupancy cull needed
            feat = F.density_feature_packed(baked, coords)
            sigma = jnp.where(valid, F.feature2density(cfg, feat), 0.0)
        else:  # exact (non-baked) VM march
            if 0 < march_cap < n_sample:
                occ = F.sample_alpha_mask_nearest(scene, xyz)
                midx, valid = primary.select_occupied_samples(valid & occ,
                                                              march_cap)
                coords = jnp.take_along_axis(coords, midx[..., None], axis=1)
                dists = jnp.take_along_axis(dists, midx, axis=1)
                xyz_sel = jnp.take_along_axis(xyz, midx[..., None], axis=1)
                valid = valid & (F.sample_alpha_mask(scene, xyz_sel) > 0)
            else:
                valid = valid & (F.sample_alpha_mask(scene, xyz) > 0)
            sigma = jnp.where(valid, F.density(cfg, params, coords), 0.0)
    alpha, weight, transmittance = raw2alpha(sigma, dists * cfg.distance_scale)

    # ---- window-truncation probe (fast_march_start auto mode) ----------
    # While the EXACT march is running, measure the weight mass that the
    # CONFIGURED front+back window WOULD truncate on the current density:
    # first/last occupied sample bound the span; mid-span samples outside
    # front [j0, j0+k_front) and back [j1-back+1, j1] carry the truncated
    # contribution (the mechanism behind the round-3 multilight collapse —
    # on a soft density transmittance does not saturate inside the front
    # window, BASELINE.md). Pure [N,S] elementwise/cumsum work on arrays
    # already in registers: no extra gathers. Slightly UNDER-estimates the
    # real window (which anchors at the dilated coarse interval entry, not
    # the fine first-occupied sample), hence the conservative default
    # threshold at the consumer (config.fast_march_auto_thres).
    probe_stats = None
    if (return_stats and probe_window > 0
            and not (baked is not None and coarse is not None
                     and 0 < window < n_sample)
            and not (baked is None and 0 < march_cap < n_sample)):
        S_probe = sigma.shape[1]
        occ = sigma > 0.0
        if pair_ok is not None:
            occ = occ & pair_ok[:, None]   # tile-padding junk rays
        any_occ = jnp.any(occ, axis=1)
        j0 = jnp.argmax(occ, axis=1)
        j1 = S_probe - 1 - jnp.argmax(occ[:, ::-1], axis=1)
        k_front = (probe_window - probe_window_back
                   if 0 < probe_window_back < probe_window else probe_window)
        front_end = j0 + k_front
        sidx = jnp.arange(S_probe)[None, :]
        if 0 < probe_window_back < probe_window:
            start_b = jnp.maximum(j1 - probe_window_back + 1, front_end)
            lost_mask = ((sidx >= front_end[:, None])
                         & (sidx < start_b[:, None]))
        else:
            lost_mask = sidx >= front_end[:, None]
        w_probe = jnp.where(any_occ[:, None], weight, 0.0)
        probe_stats = {
            "window_lost_w": jnp.sum(w_probe * lost_mask),
            "window_tot_w": jnp.sum(w_probe),
        }

    # ---- indirect light: two-stage compaction --------------------------
    # Stage 1 (pair level): most (point, dir) pairs hit nothing along the
    # secondary ray — only a fixed capacity of pairs with any
    # weight > thres sample gets appearance evaluation at all (the
    # reference's app_mask has the same effect, relight_utils.py:822-825).
    # Stage 2 (sample level): per selected pair, top app_cap samples.
    N, S = sigma.shape
    masked_w = jnp.where(weight > cfg.raymarch_weight_thres, weight, 0.0)
    if pair_ok is not None:
        # tile-padding / compaction-junk pairs march anyway (static shapes)
        # but must not claim app pair-cap slots: their results are masked by
        # the caller, so letting them through only burns capacity (and can
        # overflow REAL pairs out of the cap)
        masked_w = jnp.where(pair_ok[:, None], masked_w, 0.0)

    pair_cap = app_pair_cap if 0 < app_pair_cap < N else N
    if pair_cap < N:
        ray_score = jnp.max(masked_w, axis=1)                    # [N]
        if pair_select == "compact":
            # order-free selection: any pair with weight > thres, up to cap
            # (cumsum+scatter beats the [N] sort top_k lowers to)
            pair_idx, pair_valid = primary.compact_nonzero(ray_score, pair_cap)
        else:
            pair_score, pair_idx = jax.lax.top_k(ray_score, pair_cap)
            pair_valid = pair_score > 0.0
        sub_w = jnp.take(masked_w, pair_idx, axis=0)
        sub_coords = jnp.take(coords, pair_idx, axis=0)
        sub_dirs = jnp.take(light_in_dir, pair_idx, axis=0)
        sub_lidx = jnp.take(light_idx, pair_idx, axis=0)
    else:
        pair_idx = None
        pair_valid = jnp.ones((N,), bool)
        sub_w, sub_coords = masked_w, coords
        sub_dirs, sub_lidx = light_in_dir, light_idx

    k = app_cap if 0 < app_cap < S else S
    if k < S:
        top_w, top_idx = jax.lax.top_k(sub_w, k)
        sel_mask = top_w > 0.0
        pts_sel = jnp.take_along_axis(sub_coords, top_idx[..., None], axis=1)
        w_sel = top_w * sel_mask
    else:
        pts_sel = sub_coords
        w_sel = sub_w

    acc = jnp.sum(weight, -1)
    nerv_vis = transmittance[..., 0]
    nerfactor_vis = 1.0 - acc
    if return_app_payload:
        payload = {
            "pts_sel": pts_sel, "w_sel": w_sel,
            "dirs": sub_dirs, "lidx": sub_lidx,
            "pair_idx": (pair_idx if pair_idx is not None
                         else jnp.arange(N, dtype=jnp.int32)),
            "pair_valid": pair_valid,
        }
        return nerv_vis, nerfactor_vis, payload

    vdirs = jnp.broadcast_to(sub_dirs[:, None, :], pts_sel.shape)
    lidx = jnp.broadcast_to(sub_lidx[:, None], pts_sel.shape[:2])

    if app_baked is not None:
        # baked radiance feature: ONE row gather per app sample instead of
        # three packed plane gathers (bake_app_feature_grid)
        app_grid, app_cells = app_baked
        feat = F.app_feature_baked(app_grid, app_cells, pts_sel, lidx)
    else:
        feat = F.app_feature(cfg, params, pts_sel, lidx)
    rgb = primary.shade_radiance(cfg, params, pts_sel, vdirs, feat)
    sub_indirect = (jnp.sum(w_sel[..., None] * rgb, axis=-2)
                    * pair_valid[:, None])                       # [cap, 3]

    if pair_idx is not None:
        indirect = jnp.zeros((N, 3), sub_indirect.dtype).at[pair_idx].set(
            sub_indirect, mode="drop")
    else:
        indirect = sub_indirect

    if return_stats:
        # cap-occupancy telemetry (drives the app_pair_frac /
        # second_app_cap tightening decisions — BASELINE.md round-3 trace):
        #   valid_pairs  pairs with ANY weight > thres (pre pair-cap)
        #   kept_pairs   pairs that made it into the app stage
        #   valid_slots  nonzero w_sel slots among kept pairs (of k each)
        valid_pairs = jnp.sum((jnp.max(masked_w, axis=1) > 0.0)
                              .astype(jnp.float32))
        kept_pairs = jnp.sum(pair_valid.astype(jnp.float32))
        valid_slots = jnp.sum((w_sel > 0.0).astype(jnp.float32))
        # per-pair slot DEMAND, measured before the top-k cut (independent
        # of k): the honest signal for tightening second_app_cap — if no
        # kept pair demands more than k' slots, k' is bit-exact
        demand = jnp.sum((sub_w > 0.0).astype(jnp.int32), axis=1)
        demand = jnp.where(pair_valid, demand, 0)
        stats = {"valid_pairs": valid_pairs, "kept_pairs": kept_pairs,
                 "valid_slots": valid_slots,
                 "slot_demand_max": jnp.max(demand).astype(jnp.float32),
                 "slot_overflow_pairs": jnp.sum(
                     (demand > k).astype(jnp.float32)),
                 "pair_cap": jnp.float32(pair_cap),
                 "slot_cap": jnp.float32(k)}
        if probe_stats is not None:
            stats.update(probe_stats)
        return nerv_vis, nerfactor_vis, indirect, stats

    return nerv_vis, nerfactor_vis, indirect


def _app_stage_global(cfg: F.FieldConfig, params: Dict, payload: Dict,
                      app_baked, tile: int) -> jax.Array:
    """Global appearance batch over ALL tiles' selected pairs.

    Same math as compute_radiance's in-tile app stage (one app-feature
    query + shade_radiance per selected sample, weight-composited per
    pair) but evaluated ONCE on the stacked [T, pair_cap, k, ...] payload
    — identical results, 36x fewer (and 36x bigger) kernels. Returns the
    per-tile indirect light [T, tile, 3] scattered back through each
    tile's pair_idx.
    """
    pts_sel = payload["pts_sel"]                 # [T, cap, k, 3]
    w_sel = payload["w_sel"]                     # [T, cap, k]
    dirs = payload["dirs"]                       # [T, cap, 3]
    lidx = payload["lidx"]                       # [T, cap]
    pair_idx = payload["pair_idx"]               # [T, cap]
    pair_valid = payload["pair_valid"]           # [T, cap]
    T, cap, k, _ = pts_sel.shape

    pts = pts_sel.reshape(T * cap, k, 3)
    vdirs = jnp.broadcast_to(dirs.reshape(T * cap, 1, 3), pts.shape)
    li = jnp.broadcast_to(lidx.reshape(T * cap, 1), (T * cap, k))
    if app_baked is not None:
        app_grid, app_cells = app_baked
        feat = F.app_feature_baked(app_grid, app_cells, pts, li)
    else:
        feat = F.app_feature(cfg, params, pts, li)
    rgb = primary.shade_radiance(cfg, params, pts, vdirs, feat)
    sub_ind = (jnp.sum(w_sel.reshape(T * cap, k)[..., None] * rgb, axis=-2)
               .reshape(T, cap, 3) * pair_valid[..., None])

    # scatter back per tile; pair_idx == tile marks unfilled slots (out of
    # range for axis size `tile` -> dropped)
    ind = jnp.zeros((T, tile, 3), sub_ind.dtype)
    rows = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[:, None],
                            (T, cap))
    return ind.at[rows, pair_idx].set(sub_ind, mode="drop")


def compute_transmittance(
    cfg: F.FieldConfig,
    params: Dict,
    scene: Dict,
    surf_pts: jax.Array,
    light_in_dir: jax.Array,
    *,
    n_sample: int = 96,
    vis_near: float = 0.05,
    vis_far: float = 1.5,
    march_cap: int = 0,
    baked=None,
    coarse=None,
    baked27=None,
    march_group: int = 2,
    window: int = 0,
    window_back: int = 0,
    prepass_n: int = 18,
) -> Tuple[jax.Array, jax.Array]:
    """Visibility only (relight_utils.py:657-705), used at relighting eval."""
    aabb = scene["aabb"]
    if baked is not None and coarse is not None and 0 < window < n_sample:
        _, sigma, dists = _march_window(
            cfg, baked, coarse, aabb, surf_pts, light_in_dir,
            n_sample=n_sample, vis_near=vis_near, vis_far=vis_far,
            window=window, prepass_n=prepass_n, window_back=window_back,
            baked27=baked27, group=march_group)
        _, weight, transmittance = raw2alpha(sigma,
                                             dists * cfg.distance_scale)
        return transmittance[..., 0], 1.0 - jnp.sum(weight, -1)
    xyz, z_vals, valid = sample_ray_equally(
        surf_pts, light_in_dir, aabb, vis_near, vis_far, n_sample)
    dists = z_to_dists(jnp.broadcast_to(z_vals, xyz.shape[:2]))
    coords = F.normalize_coord(aabb, xyz)
    if baked is not None:
        sigma = jnp.where(valid, F.feature2density(
            cfg, F.density_feature_packed(baked, coords)), 0.0)
    else:
        if 0 < march_cap < n_sample:
            occ = F.sample_alpha_mask_nearest(scene, xyz)
            midx, valid = primary.select_occupied_samples(valid & occ,
                                                          march_cap)
            coords = jnp.take_along_axis(coords, midx[..., None], axis=1)
            dists = jnp.take_along_axis(dists, midx, axis=1)
            xyz_sel = jnp.take_along_axis(xyz, midx[..., None], axis=1)
            valid = valid & (F.sample_alpha_mask(scene, xyz_sel) > 0)
        else:
            valid = valid & (F.sample_alpha_mask(scene, xyz) > 0)
        sigma = jnp.where(valid, F.density(cfg, params, coords), 0.0)
    _, weight, transmittance = raw2alpha(sigma, dists * cfg.distance_scale)
    return transmittance[..., 0], 1.0 - jnp.sum(weight, -1)


def secondary_shading_tiled(
    cfg: F.FieldConfig,
    params: Dict,
    scene: Dict,
    surf_pts: jax.Array,      # [P, 3]
    surf2light: jax.Array,    # [P, L, 3]
    light_idx: jax.Array,     # [P] int32
    pair_mask: jax.Array,     # [P, L] bool (cosine mask)
    *,
    n_sample: int,
    vis_near: float,
    vis_far: float,
    tile: int = 16384,
    app_cap: int = 16,
    march_cap: int = 32,
    use_baked: bool = True,
    bake_reso: int = 0,
    window: int = 0,
    window_back: int = 0,
    prepass_n: int = 18,
    coarse_dilate: int = 2,
    compact_frac: float = 0.0,
    march_group: int = 0,
    group_bake_reso: int = 0,
    app_bake_reso: int = 0,
    app_hoist: bool = False,
    app_pair_frac: float = 0.0,
    return_stats: bool = False,
    window_probe: int = 0,
    window_probe_back: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Visibility + indirect light for every (surface point, light dir) pair.

    Equivalent to compute_secondary_shading_effects (relight_utils.py:344-399)
    but dense over the pair grid with masking, scanned in fixed tiles.
    Returns (visibility [P, L, 1], indirect [P, L, 3]); everything is
    stop_gradient'ed (the reference runs under torch.no_grad).

    compact_frac > 0 enables hemisphere-pair compaction: only
    cosine-masked-valid pairs are marched (the reference computes visibility
    solely for unmasked pairs, relight_utils.py:439-450 — the dense version
    here wastes ~half its rows on below-horizon dirs whose result is zeroed
    anyway). Valid pairs are compacted to a fixed capacity of
    ceil(P*L*compact_frac / tile) tiles via cumsum+scatter and results are
    scattered back; with stratified/fixed lat-long dir sets the valid
    fraction is ~0.5 per point, so the default canonical 0.5625 leaves
    12.5% headroom (overflow pairs — only possible for pathological dir
    sets — fall back to vis=0/indirect=0 and are counted nowhere else).
    """
    baked = None
    coarse = None
    baked27 = None
    app_baked = None
    if use_baked:
        # computed once; hoisted out of the lax.map body as a loop invariant
        baked = jax.lax.stop_gradient(
            F.bake_packed_sigma_grid(cfg, params, scene,
                                     max_reso=bake_reso))
        if 0 < window < n_sample:
            # conservativeness contract: half the prepass spacing must stay
            # <= coarse_dilate * coarse cell (see bake_coarse_occupancy) —
            # a larger dilate therefore buys a smaller prepass_n at the cost
            # of wider spans (more window truncation risk)
            coarse = jax.lax.stop_gradient(
                F.bake_coarse_occupancy(baked, dilate=coarse_dilate))
            if march_group > 1:
                # grouped fine march: one 27-corner block row per
                # march_group consecutive window samples (the caller is
                # responsible for check_pair_contract at phase build).
                # Front/back windows must each be group-divisible so groups
                # never straddle the non-contiguous front/back seam.
                kf = window - window_back
                if kf % march_group or window_back % march_group:
                    raise ValueError(
                        f"second_march_group={march_group} must divide both "
                        f"the front window ({kf}) and the back window "
                        f"({window_back})")
                baked27 = jax.lax.stop_gradient(
                    F.bake_pair_packed_sigma_grid(
                        cfg, params, scene,
                        max_reso=group_bake_reso or bake_reso))
        if app_bake_reso > 0 and cfg.decomp in ("vm", "vm_stacked"):
            grid = jax.lax.stop_gradient(F.bake_app_feature_grid(
                cfg, params, scene, max_reso=app_bake_reso))
            n_cells = grid.shape[1]
            side = round(n_cells ** (1.0 / 3.0))
            # cells are cubic only when every axis hit app_bake_reso; derive
            # the true cell counts from the factor shapes instead
            pl0, ln0 = F.app_factors(cfg, params, 0)
            Yc = min(pl0.shape[0], app_bake_reso) - 1
            Xc = min(pl0.shape[1], app_bake_reso) - 1
            Zc = min(ln0.shape[0], app_bake_reso) - 1
            assert Zc * Yc * Xc == n_cells, (Zc, Yc, Xc, n_cells, side)
            app_baked = (grid, (Zc, Yc, Xc))

    P, L, _ = surf2light.shape
    pts = jnp.broadcast_to(surf_pts[:, None, :], (P, L, 3)).reshape(-1, 3)
    dirs = surf2light.reshape(-1, 3)
    lidx = jnp.broadcast_to(light_idx[:, None], (P, L)).reshape(-1)
    mask = pair_mask.reshape(-1)

    total = P * L
    compact = 0.0 < compact_frac < 1.0
    n_valid_in = jnp.sum(mask.astype(jnp.float32)) if return_stats else None
    if compact:
        # hemisphere-pair compaction: march only cosine-valid pairs
        cap = -(-int(total * compact_frac) // tile) * tile
        cidx, cvalid = primary.compact_nonzero(mask, cap)
        pts = jnp.take(pts, jnp.minimum(cidx, total - 1), axis=0)
        dirs = jnp.take(dirs, jnp.minimum(cidx, total - 1), axis=0)
        lidx = jnp.take(lidx, jnp.minimum(cidx, total - 1), axis=0)
        mask = cvalid
        n_rows = cap
        app_pair_cap = tile // 2    # valid-pair density doubles per tile
    else:
        n_rows = total
        app_pair_cap = tile // 4
    if 0.0 < app_pair_frac <= 1.0:
        app_pair_cap = max(1, int(tile * app_pair_frac))

    n_tiles = -(-n_rows // tile)
    pad = n_tiles * tile - n_rows
    if pad:
        pts = jnp.pad(pts, ((0, pad), (0, 0)))
        dirs = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0)
        lidx = jnp.pad(lidx, (0, pad))
        mask = jnp.pad(mask, (0, pad))

    pts = pts.reshape(n_tiles, tile, 3)
    dirs = dirs.reshape(n_tiles, tile, 3)
    lidx = lidx.reshape(n_tiles, tile)
    mask = mask.reshape(n_tiles, tile)

    def one_tile(args):
        p, d, li, m = args
        out = compute_radiance(
            cfg, params, scene, p, d, li,
            n_sample=n_sample, vis_near=vis_near, vis_far=vis_far,
            app_cap=app_cap, app_pair_cap=app_pair_cap,
            march_cap=march_cap, baked=baked, coarse=coarse,
            baked27=baked27, march_group=max(march_group, 2),
            app_baked=app_baked,
            window=window, window_back=window_back, prepass_n=prepass_n,
            pair_ok=m, return_stats=return_stats,
            probe_window=window_probe,
            probe_window_back=window_probe_back)
        nerv, ind = out[0], out[2]
        mf = m.astype(nerv.dtype)
        if return_stats:
            return nerv * mf, ind * mf[..., None], out[3]
        return nerv * mf, ind * mf[..., None]

    def one_tile_march(args):
        # app-hoist mode: the map body marches only; the appearance stage
        # runs ONCE globally below (round-3 profile: per-tile app kernels
        # cost ~100x their compute — BASELINE.md phase table)
        p, d, li, m = args
        nerv, _, payload = compute_radiance(
            cfg, params, scene, p, d, li,
            n_sample=n_sample, vis_near=vis_near, vis_far=vis_far,
            app_cap=app_cap, app_pair_cap=app_pair_cap,
            march_cap=march_cap, baked=baked, coarse=coarse,
            baked27=baked27, march_group=max(march_group, 2),
            app_baked=app_baked,
            window=window, window_back=window_back, prepass_n=prepass_n,
            return_app_payload=True, pair_ok=m)
        return nerv * m.astype(nerv.dtype), payload

    stats = {}  # empty when the mode computes none (hoist path)
    if app_hoist:
        vis, payload = jax.lax.map(one_tile_march, (pts, dirs, lidx, mask))
        ind = _app_stage_global(cfg, params, payload, app_baked, tile)
        ind = ind * mask.astype(ind.dtype)[..., None]
    elif return_stats:
        vis, ind, tile_stats = jax.lax.map(one_tile,
                                           (pts, dirs, lidx, mask))
        valid = jnp.sum(tile_stats["valid_pairs"])
        kept = jnp.sum(tile_stats["kept_pairs"])
        slots = jnp.sum(tile_stats["valid_slots"])
        k_cap = tile_stats["slot_cap"][0]
        stats = {
            # max weight>thres samples demanded by any kept pair, and the
            # count of pairs whose demand exceeds second_app_cap (k): a
            # tightened k' is bit-exact iff demand_max <= k'
            "app_slot_demand_max": jnp.max(tile_stats["slot_demand_max"]),
            "app_slot_overflow_pairs": jnp.sum(
                tile_stats["slot_overflow_pairs"]),
            # pairs with any weight>thres that did NOT fit the per-tile
            # app pair cap (silently lose indirect light when > 0)
            "app_pair_overflow_frac":
                jnp.maximum(valid - kept, 0.0) / jnp.maximum(valid, 1.0),
            # how full the static app capacities actually run — the
            # headroom signal for app_pair_frac / second_app_cap cuts
            "app_pair_occupancy": valid / float(n_tiles * app_pair_cap),
            "app_slot_occupancy": slots / jnp.maximum(kept * k_cap, 1.0),
            # cosine-valid pairs dropped by the hemisphere compaction cap
            "compact_overflow_frac": (
                jnp.maximum(n_valid_in - jnp.sum(mask.astype(jnp.float32)),
                            0.0) / jnp.maximum(n_valid_in, 1.0)
                if compact else jnp.float32(0.0)),
        }
        if "window_lost_w" in tile_stats:
            # weight mass the CONFIGURED window would truncate on the
            # current density, relative to the marched total — the
            # fast_march_start auto-flip signal (healthy hardened density
            # ~0; the collapsed multilight runs measured 0.58)
            tot_w = jnp.sum(tile_stats["window_tot_w"])
            # no marched weight yet (e.g. empty relight batch) reads as
            # 1.0 — "not safe to flip" — never as a spurious 0.0
            stats["window_resid_rel"] = jnp.where(
                tot_w > 0.0,
                jnp.sum(tile_stats["window_lost_w"])
                / jnp.maximum(tot_w, 1e-6), 1.0)
    else:
        vis, ind = jax.lax.map(one_tile, (pts, dirs, lidx, mask))
    if compact:
        # ONE fused [cap, 4] scatter-back instead of separate vis [cap] and
        # ind [cap, 3] scatters: the two scatters were 93 ms/step at the
        # canonical config (round-3 trace, fusion.85/86) and scatter cost
        # is row-count bound, so fusing the row set halves it
        both = jnp.concatenate([vis.reshape(-1, 1)[:cap],
                                ind.reshape(-1, 3)[:cap]], axis=-1)
        out = jnp.zeros((total, 4), both.dtype).at[cidx].set(
            both, mode="drop")
        vis = out[:, :1].reshape(P, L, 1)
        ind = out[:, 1:].reshape(P, L, 3)
    else:
        vis = vis.reshape(-1)[:total].reshape(P, L, 1)
        ind = ind.reshape(-1, 3)[:total].reshape(P, L, 3)
    if return_stats:
        return (jax.lax.stop_gradient(vis), jax.lax.stop_gradient(ind),
                jax.lax.stop_gradient(stats))
    return jax.lax.stop_gradient(vis), jax.lax.stop_gradient(ind)
