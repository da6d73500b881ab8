"""Grouped secondary march (one 27-corner block row per group of adjacent
window samples) and the baked secondary appearance feature.

Both are row-count optimizations of the no-grad secondary pass
(reference hot loop relight_utils.py:777-834): results must match the
single-sample packed march / exact VM appearance query.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensoir_tpu.models.field import FieldConfig, init_field_params
from tensoir_tpu.models import field as F
from tensoir_tpu.models import lifecycle as LC
from tensoir_tpu.render.secondary import (compute_radiance,
                                          compute_transmittance,
                                          secondary_shading_tiled)


def _model():
    cfg = FieldConfig(density_n_comp=(4, 4, 4), app_n_comp=(4, 4, 4),
                      app_dim=6, feature_c=32, num_sgs=16, envmap_h=4,
                      envmap_w=8, step_ratio=2.0,
                      normals_kind="purely_predicted")
    aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
    params, scene = init_field_params(jax.random.PRNGKey(0), cfg,
                                      (24, 24, 24), aabb)
    params = dict(params)
    for i in range(3):
        g = params[f"density_plane_{i}"]
        H, W, _ = g.shape
        yy, xx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                             indexing="ij")
        bump = np.exp(-((xx ** 2 + yy ** 2) / 0.08)).astype(np.float32)
        params[f"density_plane_{i}"] = g + 4.0 * jnp.asarray(bump)[..., None]
    scene, _ = LC.update_alpha_mask(cfg, params, scene, (24, 24, 24))
    return cfg, params, scene


@pytest.mark.parametrize("group", [2, 4])
def test_group_packed_matches_single(group):
    """density_feature_group_packed == density_feature_packed per point for
    groups whose points lie within one cell of each other."""
    cfg, params, scene = _model()
    baked8 = F.bake_packed_sigma_grid(cfg, params, scene)
    baked27 = F.bake_pair_packed_sigma_grid(cfg, params, scene)
    Zc, Yc, Xc, _ = baked8.shape
    cell = 2.0 / min(Zc, Yc, Xc)          # normalized-coord cell size

    rng = np.random.default_rng(0)
    base = rng.uniform(-0.95, 0.95, (128, 1, 3)).astype(np.float32)
    # per-group jitter small enough that cells differ by <= 1 per axis
    jit = rng.uniform(0.0, 0.9 * cell / (group - 1), (128, group, 3))
    steps = np.cumsum(jit, axis=1) - jit   # monotone like march samples
    coords = jnp.asarray(np.clip(base + steps, -1.0, 1.0).astype(np.float32))

    single = F.density_feature_packed(baked8, coords)
    grouped = F.density_feature_group_packed(baked27, coords)
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(single),
                               atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("group", [2, 4])
def test_windowed_march_grouped_matches_single(group):
    """The grouped window march must reproduce the single-sample window
    march through compute_radiance and compute_transmittance."""
    cfg, params, scene = _model()
    baked = F.bake_packed_sigma_grid(cfg, params, scene)
    baked27 = F.bake_pair_packed_sigma_grid(cfg, params, scene)
    coarse = F.bake_coarse_occupancy(baked, reso=16)
    # contract: (group-1)*dt <= cell  (dt = 1.45/63 = 0.023, cell = 0.13)
    F.check_pair_contract(np.asarray(scene["aabb"]), baked27.shape,
                          n_sample=64, group=group)

    rng = np.random.default_rng(1)
    N = 64
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, (N, 3)).astype(np.float32))
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = jnp.asarray(d)
    lidx = jnp.zeros(N, jnp.int32)

    kw = dict(n_sample=64, vis_near=0.05, vis_far=1.5, baked=baked,
              coarse=coarse, window=48, window_back=16, prepass_n=24)
    nerv_s, nf_s, ind_s = compute_radiance(cfg, params, scene, pts, dirs,
                                           lidx, app_cap=8, app_pair_cap=48,
                                           **kw)
    nerv_g, nf_g, ind_g = compute_radiance(cfg, params, scene, pts, dirs,
                                           lidx, app_cap=8, app_pair_cap=48,
                                           baked27=baked27, march_group=group,
                                           **kw)
    np.testing.assert_allclose(np.asarray(nerv_g), np.asarray(nerv_s),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(nf_g), np.asarray(nf_s),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ind_g), np.asarray(ind_s),
                               atol=2e-4, rtol=1e-3)

    t_s = compute_transmittance(cfg, params, scene, pts, dirs, **kw)
    t_g = compute_transmittance(cfg, params, scene, pts, dirs,
                                baked27=baked27, march_group=group, **kw)
    np.testing.assert_allclose(np.asarray(t_g[0]), np.asarray(t_s[0]),
                               atol=2e-4, rtol=1e-4)


def test_pair_contract_checker():
    aabb = np.array([[-1.5] * 3, [1.5] * 3], np.float32)
    # bench geometry: bake 128 -> 126^3 blocks, 96 fine samples
    shape_128 = (126, 126, 126, 27)
    assert F.check_pair_contract(aabb, shape_128, n_sample=96, group=2) >= 1.0
    # group 4 at bake 128 violates (3 * 0.0153 > 0.0236)
    with pytest.raises(ValueError, match="contract violated"):
        F.check_pair_contract(aabb, shape_128, n_sample=96, group=4)
    # group 4 fits a 64^3 bake (cell 0.0476 > 0.0458)
    assert F.check_pair_contract(aabb, (61, 61, 61, 27), n_sample=96,
                                 group=4) >= 1.0
    # a shrunk aabb can break it
    shrunk = np.array([[-0.9] * 3, [0.9] * 3], np.float32)
    with pytest.raises(ValueError, match="contract violated"):
        F.check_pair_contract(shrunk, (61, 61, 61, 27), n_sample=96, group=4)


def test_app_bake_exact_at_nodes():
    """The baked radiance feature equals the exact VM app_feature at the
    bake's own grid nodes (up to bf16 storage)."""
    cfg, params, scene = _model()
    grid = F.bake_app_feature_grid(cfg, params, scene)
    pl0, _ = F.app_factors(cfg, params, 0)
    ln0 = params["app_line_0"]
    Yc, Xc = pl0.shape[0] - 1, pl0.shape[1] - 1
    Zc = ln0.shape[0] - 1
    # node coordinates (exclude the last node: packed cells are [0, C-1))
    rng = np.random.default_rng(2)
    iz = rng.integers(0, Zc, 64)
    iy = rng.integers(0, Yc, 64)
    ix = rng.integers(0, Xc, 64)
    coords = jnp.asarray(np.stack([ix / Xc, iy / Yc, iz / Zc],
                                  -1).astype(np.float32) * 2.0 - 1.0)
    lidx = jnp.zeros(64, jnp.int32)
    baked_f = F.app_feature_baked(grid, (Zc, Yc, Xc), coords, lidx)
    exact_f = F.app_feature(cfg, params, coords, lidx)
    scale = float(jnp.max(jnp.abs(exact_f))) + 1e-6
    err = float(jnp.max(jnp.abs(baked_f - exact_f))) / scale
    assert err < 2e-2, err    # bf16 storage of the baked rows


def test_app_bake_multi_light():
    """Per-light bake: light_idx selects the matching light_line row."""
    cfg = FieldConfig(density_n_comp=(4, 4, 4), app_n_comp=(4, 4, 4),
                      app_dim=6, feature_c=32, num_sgs=16, envmap_h=4,
                      envmap_w=8, step_ratio=2.0, light_num=3,
                      normals_kind="purely_predicted")
    aabb = np.array([[-1.5] * 3, [1.5] * 3], np.float32)
    params, scene = init_field_params(jax.random.PRNGKey(1), cfg,
                                      (16, 16, 16), aabb)
    grid = F.bake_app_feature_grid(cfg, params, scene)
    assert grid.shape[0] == params["light_line"].shape[0]
    rng = np.random.default_rng(3)
    coords = jnp.asarray(rng.uniform(-0.9, 0.9, (32, 3)).astype(np.float32))
    for li in range(grid.shape[0]):
        lidx = jnp.full((32,), li, jnp.int32)
        baked_f = F.app_feature_baked(grid, (15, 15, 15), coords, lidx)
        exact_f = F.app_feature(cfg, params, coords, lidx)
        scale = float(jnp.max(jnp.abs(exact_f))) + 1e-6
        # off-node trilinear proxy: loose but light-specific (a wrong light
        # row would be O(1) off)
        assert float(jnp.max(jnp.abs(baked_f - exact_f))) / scale < 0.35
        wrong = F.app_feature_baked(grid, (15, 15, 15), coords,
                                    jnp.full((32,), (li + 1) % 3, jnp.int32))
        assert float(jnp.max(jnp.abs(baked_f - wrong))) > 1e-4


def test_secondary_tiled_group_and_app_bake():
    """Full tiled secondary with march_group + app_bake_reso stays close to
    the plain windowed path and composes with hemisphere compaction."""
    cfg, params, scene = _model()
    rng = np.random.default_rng(6)
    P, L = 16, 8
    pts = jnp.asarray(rng.uniform(-0.3, 0.3, (P, 3)).astype(np.float32))
    d = rng.normal(size=(P, L, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = jnp.asarray(d)
    lidx = jnp.zeros(P, jnp.int32)
    mask = jnp.ones((P, L), bool)
    kw = dict(n_sample=64, vis_near=0.05, vis_far=1.5, tile=64, app_cap=8,
              window=48, window_back=16, prepass_n=24)
    vis_s, ind_s = secondary_shading_tiled(cfg, params, scene, pts, dirs,
                                           lidx, mask, **kw)
    vis_g, ind_g = secondary_shading_tiled(cfg, params, scene, pts, dirs,
                                           lidx, mask, march_group=2,
                                           app_bake_reso=24,
                                           compact_frac=0.9, **kw)
    # visibility identical up to the grouped-gather sum order
    np.testing.assert_allclose(np.asarray(vis_g), np.asarray(vis_s),
                               atol=3e-4, rtol=1e-3)
    # indirect light switches to the full-reso app-bake proxy: close, not
    # bit-equal (trilinear vs exact VM off-node)
    assert float(jnp.mean(jnp.abs(ind_g - ind_s))) < 2e-3


def test_secondary_tiled_group_rejects_odd_window():
    cfg, params, scene = _model()
    pts = jnp.zeros((4, 3), jnp.float32)
    dirs = jnp.ones((4, 4, 3), jnp.float32)
    lidx = jnp.zeros(4, jnp.int32)
    mask = jnp.ones((4, 4), bool)
    with pytest.raises(ValueError, match="must divide"):
        secondary_shading_tiled(cfg, params, scene, pts, dirs, lidx, mask,
                                n_sample=64, vis_near=0.05, vis_far=1.5,
                                tile=16, window=42, window_back=15,
                                prepass_n=24, march_group=2)


def test_resolve_march_group_downgrade_chain():
    """The loop downgrades group 4 -> 2 -> 0 against the live aabb instead
    of dropping the grouped march entirely (real scenes shrink mid-run)."""
    from tensoir_tpu.config import TensoIRConfig
    from tensoir_tpu.train.loop import resolve_march_group

    cfg = TensoIRConfig(
        second_march_group=4, group_bake_reso=64, secondary_bake_reso=128,
        second_nSample=96, second_window=48, second_window_back=16,
        second_near=0.05, second_far=1.5)
    grid = (200, 200, 200)
    aabb = np.array([[-1.5] * 3, [1.5] * 3], np.float32)
    # bench geometry: group 4 fits a 64^3 bake (cell 0.0476 >= 0.0458)
    assert resolve_march_group(cfg, aabb, grid) == 4
    # shrunk aabb: group-4 span breaks the cell, group 2 still fits
    shrunk = np.array([[-0.7] * 3, [0.7] * 3], np.float32)
    assert resolve_march_group(cfg, shrunk, grid) == 2
    # tiny aabb: nothing fits
    tiny = np.array([[-0.2] * 3, [0.2] * 3], np.float32)
    assert resolve_march_group(cfg, tiny, grid) == 0
    # window not divisible by 4: falls through to 2 immediately
    cfg_w = TensoIRConfig(
        second_march_group=4, group_bake_reso=64, secondary_bake_reso=128,
        second_nSample=96, second_window=46, second_window_back=16,
        second_near=0.05, second_far=1.5)
    assert resolve_march_group(cfg_w, aabb, grid) == 2
    # group disabled stays disabled
    cfg0 = TensoIRConfig(second_march_group=0)
    assert resolve_march_group(cfg0, aabb, grid) == 0
