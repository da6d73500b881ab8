"""Occupancy-culled marching must match dense marching exactly when the
per-ray occupied-sample count fits in the cap."""
import numpy as np
import jax
import jax.numpy as jnp

from tensoir_tpu.models.field import FieldConfig, init_field_params
from tensoir_tpu.models import lifecycle as LC
from tensoir_tpu.render.primary import render_rays, select_occupied_samples
from tensoir_tpu.render.secondary import compute_radiance, compute_transmittance


def _model_with_mask():
    cfg = FieldConfig(density_n_comp=(4, 4, 4), app_n_comp=(4, 4, 4),
                      app_dim=6, feature_c=32, num_sgs=16, envmap_h=4,
                      envmap_w=8, step_ratio=2.0,
                      normals_kind="purely_predicted")
    aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
    params, scene = init_field_params(jax.random.PRNGKey(0), cfg,
                                      (24, 24, 24), aabb)
    # concentrate density near the center so the mask is sparse
    params = dict(params)
    for i in range(3):
        g = params[f"density_plane_{i}"]
        H, W, R = g.shape
        yy, xx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                             indexing="ij")
        bump = np.exp(-((xx ** 2 + yy ** 2) / 0.08)).astype(np.float32)
        params[f"density_plane_{i}"] = g + 4.0 * jnp.asarray(bump)[..., None]
    scene, _ = LC.update_alpha_mask(cfg, params, scene, (24, 24, 24))
    return cfg, params, scene


def test_select_occupied_samples():
    valid = jnp.asarray(np.array([
        [0, 1, 1, 0, 0, 1, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
        [1, 1, 1, 1, 1, 1, 1, 1],
    ], bool))
    idx, sel = select_occupied_samples(valid, 4)
    idx, sel = np.asarray(idx), np.asarray(sel)
    assert list(idx[0][sel[0]]) == [1, 2, 5]
    assert not sel[1].any()
    assert list(idx[2]) == [0, 1, 2, 3]  # ascending depth


def test_primary_culled_matches_dense():
    cfg, params, scene = _model_with_mask()
    rng = np.random.default_rng(0)
    o = np.zeros((24, 3), np.float32)
    o[:, 2] = -4.0
    d = rng.normal(size=(24, 3)).astype(np.float32) * 0.1
    d[:, 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate([o, d], -1))
    lidx = jnp.zeros(24, jnp.int32)

    dense = render_rays(cfg, params, scene, rays, lidx, n_samples=64,
                        key=None, is_train=False, is_relight=True,
                        white_bg=True, app_cap=0, march_cap=0)
    culled = render_rays(cfg, params, scene, rays, lidx, n_samples=64,
                         key=None, is_train=False, is_relight=True,
                         white_bg=True, app_cap=0, march_cap=48)
    for k in ("rgb_map", "depth_map", "acc_map", "albedo_map", "normal_map"):
        np.testing.assert_allclose(np.asarray(culled[k]),
                                   np.asarray(dense[k]), atol=1e-5,
                                   rtol=1e-4, err_msg=k)


def test_render_rays_march_select_scatter_matches_topk():
    """march_select='scatter' (cumsum+scatter selection) must reproduce the
    top_k path bit-for-bit through the full forward."""
    cfg, params, scene = _model_with_mask()
    rng = np.random.default_rng(3)
    o = np.zeros((24, 3), np.float32)
    o[:, 2] = -4.0
    d = rng.normal(size=(24, 3)).astype(np.float32) * 0.1
    d[:, 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate([o, d], -1))
    lidx = jnp.zeros(24, jnp.int32)
    outs = {}
    for sel in ("topk", "scatter"):
        outs[sel] = render_rays(cfg, params, scene, rays, lidx, n_samples=64,
                                key=None, is_train=False, is_relight=True,
                                white_bg=True, march_cap=48, march_select=sel)
    for k in ("rgb_map", "depth_map", "acc_map", "albedo_map", "normal_map"):
        np.testing.assert_allclose(np.asarray(outs["scatter"][k]),
                                   np.asarray(outs["topk"][k]), atol=1e-6,
                                   err_msg=k)


def test_secondary_culled_matches_dense():
    cfg, params, scene = _model_with_mask()
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (32, 3)).astype(np.float32))
    dirs = rng.normal(size=(32, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs)
    lidx = jnp.zeros(32, jnp.int32)

    nerv_d, nf_d, ind_d = compute_radiance(cfg, params, scene, pts, dirs,
                                           lidx, n_sample=48, app_cap=0,
                                           march_cap=0)
    nerv_c, nf_c, ind_c = compute_radiance(cfg, params, scene, pts, dirs,
                                           lidx, n_sample=48, app_cap=0,
                                           march_cap=32)
    np.testing.assert_allclose(np.asarray(nerv_c), np.asarray(nerv_d),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ind_c), np.asarray(ind_d),
                               atol=1e-5, rtol=1e-4)

    t_d = compute_transmittance(cfg, params, scene, pts, dirs, n_sample=48,
                                march_cap=0)
    t_c = compute_transmittance(cfg, params, scene, pts, dirs, n_sample=48,
                                march_cap=32)
    np.testing.assert_allclose(np.asarray(t_c[0]), np.asarray(t_d[0]),
                               atol=1e-5, rtol=1e-4)


def test_select_occupied_samples_scatter_matches_topk():
    from tensoir_tpu.render.primary import select_occupied_samples_scatter
    rng = np.random.default_rng(3)
    valid = jnp.asarray(rng.random((64, 40)) < 0.2)
    idx_t, sel_t = select_occupied_samples(valid, 16)
    idx_s, sel_s = select_occupied_samples_scatter(valid, 16)
    np.testing.assert_array_equal(np.asarray(sel_s), np.asarray(sel_t))
    # selected indices agree wherever valid (dummy slots may differ)
    np.testing.assert_array_equal(np.asarray(idx_s)[np.asarray(sel_s)],
                                  np.asarray(idx_t)[np.asarray(sel_t)])
    # overflow: both keep the shallowest `cap` samples
    dense_valid = jnp.ones((4, 40), bool)
    idx_t, sel_t = select_occupied_samples(dense_valid, 8)
    idx_s, sel_s = select_occupied_samples_scatter(dense_valid, 8)
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_t))
    assert np.asarray(sel_s).all()


def test_compact_nonzero():
    from tensoir_tpu.render.primary import compact_nonzero
    score = jnp.asarray(np.array([0.0, 0.5, 0.0, 2.0, 0.1, 0.0], np.float32))
    idx, valid = compact_nonzero(score, 4)
    idx, valid = np.asarray(idx), np.asarray(valid)
    assert list(idx[valid]) == [1, 3, 4]
    idx, valid = compact_nonzero(jnp.zeros((6,), jnp.float32), 4)
    assert not np.asarray(valid).any()


def test_pair_select_compact_matches_topk():
    cfg, params, scene = _model_with_mask()
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (64, 3)).astype(np.float32))
    dirs = rng.normal(size=(64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs)
    lidx = jnp.zeros(64, jnp.int32)
    out_t = compute_radiance(cfg, params, scene, pts, dirs, lidx,
                             n_sample=48, app_cap=8, app_pair_cap=48,
                             pair_select="topk")
    out_c = compute_radiance(cfg, params, scene, pts, dirs, lidx,
                             n_sample=48, app_cap=8, app_pair_cap=48,
                             pair_select="compact")
    for a, b, name in zip(out_c, out_t, ("nerv", "nerfactor", "indirect")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-4, err_msg=name)


def test_secondary_window_matches_full():
    """Interval-culled (windowed) secondary march matches the full baked
    march: the conservative coarse-occupancy prepass only skips samples
    whose density is below the feature threshold (sigma < 5e-5)."""
    from tensoir_tpu.models import field as F
    cfg, params, scene = _model_with_mask()
    rng = np.random.default_rng(5)
    N = 64
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, (N, 3)).astype(np.float32))
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = jnp.asarray(d)
    lidx = jnp.zeros(N, jnp.int32)

    baked = F.bake_packed_sigma_grid(cfg, params, scene)
    coarse = F.bake_coarse_occupancy(baked, reso=16)

    kw = dict(n_sample=64, vis_near=0.05, vis_far=1.5, app_cap=8,
              app_pair_cap=48)
    nerv_f, nf_f, ind_f = compute_radiance(cfg, params, scene, pts, dirs,
                                           lidx, baked=baked, **kw)
    nerv_w, nf_w, ind_w = compute_radiance(cfg, params, scene, pts, dirs,
                                           lidx, baked=baked, coarse=coarse,
                                           window=56, prepass_n=24, **kw)
    np.testing.assert_allclose(np.asarray(nerv_w), np.asarray(nerv_f),
                               atol=6e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(nf_w), np.asarray(nf_f),
                               atol=6e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ind_w), np.asarray(ind_f),
                               atol=6e-3, rtol=1e-2)

    t_f = compute_transmittance(cfg, params, scene, pts, dirs,
                                n_sample=64, baked=baked)
    t_w = compute_transmittance(cfg, params, scene, pts, dirs,
                                n_sample=64, baked=baked, coarse=coarse,
                                window=56, prepass_n=24)
    np.testing.assert_allclose(np.asarray(t_w[0]), np.asarray(t_f[0]),
                               atol=6e-3, rtol=1e-3)


def test_secondary_tiled_window_runs():
    """secondary_shading_tiled with window enabled: shapes + closeness."""
    from tensoir_tpu.render.secondary import secondary_shading_tiled
    cfg, params, scene = _model_with_mask()
    rng = np.random.default_rng(6)
    P, L = 16, 8
    pts = jnp.asarray(rng.uniform(-0.3, 0.3, (P, 3)).astype(np.float32))
    d = rng.normal(size=(P, L, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = jnp.asarray(d)
    lidx = jnp.zeros(P, jnp.int32)
    mask = jnp.ones((P, L), bool)
    kw = dict(n_sample=64, vis_near=0.05, vis_far=1.5, tile=64, app_cap=8)
    vis_f, ind_f = secondary_shading_tiled(cfg, params, scene, pts, dirs,
                                           lidx, mask, **kw)
    vis_w, ind_w = secondary_shading_tiled(cfg, params, scene, pts, dirs,
                                           lidx, mask, window=56,
                                           prepass_n=24, **kw)
    np.testing.assert_allclose(np.asarray(vis_w), np.asarray(vis_f),
                               atol=6e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ind_w), np.asarray(ind_f),
                               atol=6e-3, rtol=1e-2)


def test_secondary_tiled_coarse_bake():
    """Coarse visibility bake (secondary_bake_reso) stays close to the
    full-resolution bake."""
    from tensoir_tpu.render.secondary import secondary_shading_tiled
    cfg, params, scene = _model_with_mask()
    rng = np.random.default_rng(4)
    P, L = 16, 8
    pts = jnp.asarray(rng.uniform(-0.3, 0.3, (P, 3)).astype(np.float32))
    d = rng.normal(size=(P, L, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = jnp.asarray(d)
    lidx = jnp.zeros(P, jnp.int32)
    mask = jnp.ones((P, L), bool)
    kw = dict(n_sample=32, vis_near=0.05, vis_far=1.5, tile=64, app_cap=8)
    vis_f, ind_f = secondary_shading_tiled(cfg, params, scene, pts, dirs,
                                           lidx, mask, **kw)
    vis_c, ind_c = secondary_shading_tiled(cfg, params, scene, pts, dirs,
                                           lidx, mask, bake_reso=16, **kw)
    assert vis_c.shape == vis_f.shape and ind_c.shape == ind_f.shape
    assert float(jnp.mean(jnp.abs(vis_c - vis_f))) < 0.15


def test_secondary_tiled_pair_compaction_exact():
    """compact_frac marches only cosine-valid pairs; with sufficient
    capacity the result must match the dense-masked path exactly (the
    same per-pair march runs, just reordered)."""
    from tensoir_tpu.render.secondary import secondary_shading_tiled
    cfg, params, scene = _model_with_mask()
    rng = np.random.default_rng(7)
    P, L = 24, 16
    pts = jnp.asarray(rng.uniform(-0.3, 0.3, (P, 3)).astype(np.float32))
    d = rng.normal(size=(P, L, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = jnp.asarray(d)
    lidx = jnp.zeros(P, jnp.int32)
    # a minority of pairs valid, like a hemisphere cosine mask; tile sized
    # so neither path's app_pair_cap (tile//4 dense, tile//2 compact) binds
    # — capacity-overflow behavior intentionally differs between the paths
    mask = jnp.asarray(rng.uniform(size=(P, L)) < 0.3)
    kw = dict(n_sample=32, vis_near=0.05, vis_far=1.5, tile=256, app_cap=8)
    vis_f, ind_f = secondary_shading_tiled(cfg, params, scene, pts, dirs,
                                           lidx, mask, **kw)
    vis_c, ind_c = secondary_shading_tiled(cfg, params, scene, pts, dirs,
                                           lidx, mask, compact_frac=0.6,
                                           **kw)
    np.testing.assert_allclose(np.asarray(vis_c), np.asarray(vis_f),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ind_c), np.asarray(ind_f),
                               atol=1e-6, rtol=1e-5)
    # composes with the interval-culled window march
    vis_cw, ind_cw = secondary_shading_tiled(cfg, params, scene, pts, dirs,
                                             lidx, mask, compact_frac=0.6,
                                             window=28, prepass_n=16, **kw)
    vis_w, ind_w = secondary_shading_tiled(cfg, params, scene, pts, dirs,
                                           lidx, mask, window=28,
                                           prepass_n=16, **kw)
    np.testing.assert_allclose(np.asarray(vis_cw), np.asarray(vis_w),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ind_cw), np.asarray(ind_w),
                               atol=1e-6, rtol=1e-5)


def _two_slab_model():
    """Two occupied slabs along z separated by a gap — the object-over-
    ground-plane span shape that a single contiguous window truncates."""
    from tensoir_tpu.models import field as F
    cfg = FieldConfig(density_n_comp=(4, 4, 4), app_n_comp=(4, 4, 4),
                      app_dim=6, feature_c=32, num_sgs=16, envmap_h=4,
                      envmap_w=8, step_ratio=2.0,
                      normals_kind="purely_predicted")
    aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
    params, scene = init_field_params(jax.random.PRNGKey(2), cfg,
                                      (32, 32, 32), aabb)
    params = dict(params)
    # single active VM term: plane_0 spans (x, y), line_0 is the z axis —
    # constant plane x two narrow z bumps = two slabs, uniform in x/y.
    # Amplitude tuned so the near slab is translucent (T ~ 0.3): the far
    # slab's occlusion must be visible in the transmittance.
    for i in range(3):
        params[f"density_plane_{i}"] = params[f"density_plane_{i}"] * 0 + (
            1.5 if i == 0 else 0.0)
        ln = params[f"density_line_{i}"]
        D, R = ln.shape
        z = np.linspace(-1, 1, D)
        two = (np.exp(-((z + 0.8) ** 2) / 0.004)
               + np.exp(-((z - 0.3) ** 2) / 0.004)).astype(np.float32)
        params[f"density_line_{i}"] = ln * 0 + (
            1.6 * jnp.asarray(two)[:, None] if i == 0 else 0.0)
    scene, _ = LC.update_alpha_mask(cfg, params, scene, (32, 32, 32))
    return cfg, params, scene


def test_double_window_covers_two_intervals():
    from tensoir_tpu.models import field as F
    cfg, params, scene = _two_slab_model()
    baked = F.bake_packed_sigma_grid(cfg, params, scene)
    coarse = F.bake_coarse_occupancy(baked)
    N = 32
    rng = np.random.default_rng(8)
    # rays along +z starting just before the first slab (z=-0.8): the far
    # slab (z=0.3) sits at t ~ 1.3 < vis_far; span ~ 72 of 96 samples
    o = np.stack([rng.uniform(-0.2, 0.2, N), rng.uniform(-0.2, 0.2, N),
                  np.full(N, -1.0)], -1).astype(np.float32)
    d = np.zeros((N, 3), np.float32)
    d[:, 2] = 1.0
    pts, dirs = jnp.asarray(o), jnp.asarray(d)

    kw = dict(n_sample=96, vis_near=0.05, vis_far=1.5)
    t_full, _ = compute_transmittance(cfg, params, scene, pts, dirs,
                                      baked=baked, **kw)
    t_single, _ = compute_transmittance(cfg, params, scene, pts, dirs,
                                        baked=baked, coarse=coarse,
                                        window=48, prepass_n=24, **kw)
    t_double, _ = compute_transmittance(cfg, params, scene, pts, dirs,
                                        baked=baked, coarse=coarse,
                                        window=48, window_back=16,
                                        prepass_n=24, **kw)
    t_full = np.asarray(t_full)
    err_single = np.abs(np.asarray(t_single) - t_full).max()
    err_double = np.abs(np.asarray(t_double) - t_full).max()
    # the single 48-window misses the far slab entirely (overestimates
    # visibility); the front+back split captures both slabs
    assert err_single > 0.05, err_single
    assert err_double < 6e-3, (err_double, err_single)


def test_double_window_exact_for_short_spans():
    """With one compact blob (span << window) front+back must equal the
    single window exactly."""
    from tensoir_tpu.models import field as F
    cfg, params, scene = _model_with_mask()
    baked = F.bake_packed_sigma_grid(cfg, params, scene)
    coarse = F.bake_coarse_occupancy(baked, reso=16)
    rng = np.random.default_rng(9)
    N = 48
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, (N, 3)).astype(np.float32))
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = jnp.asarray(d)
    kw = dict(n_sample=64, vis_near=0.05, vis_far=1.5)
    t_s, a_s = compute_transmittance(cfg, params, scene, pts, dirs,
                                     baked=baked, coarse=coarse,
                                     window=56, prepass_n=24, **kw)
    t_d, a_d = compute_transmittance(cfg, params, scene, pts, dirs,
                                     baked=baked, coarse=coarse,
                                     window=56, window_back=16,
                                     prepass_n=24, **kw)
    np.testing.assert_allclose(np.asarray(t_d), np.asarray(t_s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_d), np.asarray(a_s), atol=1e-6)


def test_march_contract_checker():
    """check_march_contract: canonical configs pass; a violating prepass
    raises (guards the interval-cull conservativeness at phase rebuilds)."""
    import numpy as np
    import pytest
    from tensoir_tpu.models.field import check_march_contract
    aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
    # canonical configs (bench d3p12 and legacy d2p18) are safe
    assert check_march_contract(aabb, prepass_n=12, dilate=3) >= 1.0
    assert check_march_contract(aabb, prepass_n=18, dilate=2) >= 1.0
    # shrunk demo-scene aabb (min extent ~1.4) still safe at canonical
    shrunk = np.array([[-0.7, -0.7, -0.7], [0.7, 0.7, 0.7]], np.float32)
    assert check_march_contract(shrunk, prepass_n=12, dilate=3) >= 1.0
    # too-sparse prepass on the shrunk aabb violates -> raises
    with pytest.raises(ValueError, match="contract violated"):
        check_march_contract(shrunk, prepass_n=6, dilate=2)


def test_relight_fast_vis_close_to_exact():
    """The relight benchmark's optional fast_vis path (baked + windowed
    march) tracks the exact VM transmittance closely in the mean; the
    default benchmark protocol stays exact (relight_pipeline.py)."""
    cfg, params, scene = _model_with_mask()
    rng = np.random.default_rng(5)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (128, 3)).astype(np.float32))
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    exact, _ = compute_transmittance(cfg, params, scene, pts, d,
                                     n_sample=96, march_cap=48)
    from tensoir_tpu.models import field as F
    baked = F.bake_packed_sigma_grid(cfg, params, scene, max_reso=128)
    coarse = F.bake_coarse_occupancy(baked, dilate=3)
    fast, _ = compute_transmittance(cfg, params, scene, pts, d,
                                    n_sample=96, baked=baked, coarse=coarse,
                                    window=48, window_back=16, prepass_n=12)
    err = np.abs(np.asarray(exact) - np.asarray(fast))
    assert err.mean() < 0.05, err.mean()


def test_window_covers_aabb_boundary_occupancy():
    """Regression: occupancy abutting the aabb exit face must be detected
    by the prepass (the old in-bounds masking missed occupied cells
    between the last in-aabb prepass sample and the aabb exit)."""
    from tensoir_tpu.models import field as F
    from tensoir_tpu.models.field import FieldConfig, init_field_params

    cfg = FieldConfig(density_n_comp=(4,) * 3, app_n_comp=(8,) * 3,
                      app_dim=6, feature_c=32, num_sgs=16, envmap_h=4,
                      envmap_w=8, step_ratio=2.0,
                      normals_kind="purely_predicted")
    aabb = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], np.float32)
    params, scene = init_field_params(jax.random.PRNGKey(0), cfg,
                                      (32, 32, 32), aabb)
    # a dense slab pressed against the +x aabb face, built from the
    # axis-2 factor pair (plane_2 over (y,z), line_2 over x): plane = 1,
    # line peaked in the last x rows -> feature ~20 there, sigma strong
    params["density_plane_2"] = params["density_plane_2"].at[..., 0].set(1.0)
    ln = params["density_line_2"]
    prof = np.zeros(ln.shape[0], np.float32)
    prof[-2:] = 30.0               # slab only in x ~ [0.94, 1.0]
    params["density_line_2"] = ln.at[:, 0].set(jnp.asarray(prof))

    baked = F.bake_packed_sigma_grid(cfg, params, scene)
    # dilate 1 at reso 32 (margin = 1/16): under the OLD in-bounds masking
    # the last in-aabb nominal prepass sample (t=0.855 of
    # linspace(0.05, 1.5, 10)) sat > margin away from the dilated slab
    # ([0.9, 1.0]) and the cull returned full transmittance; the clamped
    # range places samples up to the aabb exit and detects it
    coarse = F.bake_coarse_occupancy(baked, reso=32, dilate=1)

    pts = jnp.asarray(np.array([[0.0, 0.0, 0.0]], np.float32))
    dirs = jnp.asarray(np.array([[1.0, 0.0, 0.0]], np.float32))
    kw = dict(n_sample=64, vis_near=0.05, vis_far=1.5)
    full_v, _ = compute_transmittance(cfg, params, scene, pts, dirs,
                                      baked=baked, **kw)
    win_v, _ = compute_transmittance(cfg, params, scene, pts, dirs,
                                     baked=baked, coarse=coarse, window=32,
                                     window_back=8, prepass_n=10, **kw)
    np.testing.assert_allclose(np.asarray(win_v), np.asarray(full_v),
                               atol=5e-3)
    # the slab must actually occlude (guards against a vacuous pass)
    assert float(full_v[0]) < 0.6, float(full_v[0])
