"""Baked dense sigma grid: exact at grid nodes, close off-node."""
import numpy as np
import jax
import jax.numpy as jnp

from tensoir_tpu.models.field import (
    FieldConfig, init_field_params, bake_sigma_feature_grid,
    density_feature, density_feature_baked, normalize_coord,
)
from tensoir_tpu.render.secondary import compute_transmittance


def _model(grid=(20, 24, 28)):
    cfg = FieldConfig(density_n_comp=(4, 4, 4), app_n_comp=(4, 4, 4),
                      app_dim=6, feature_c=32, num_sgs=16, envmap_h=4,
                      envmap_w=8, step_ratio=2.0)
    aabb = np.array([[-1.5, -1.2, -1.0], [1.5, 1.2, 1.0]], np.float32)
    params, scene = init_field_params(jax.random.PRNGKey(0), cfg, grid, aabb)
    return cfg, params, scene


def test_baked_exact_at_grid_nodes():
    cfg, params, scene = _model()
    baked = bake_sigma_feature_grid(cfg, params)
    X, Y, Z = 20, 24, 28
    assert baked.shape == (Z, Y, X)

    # sample exactly at a few grid nodes
    rng = np.random.default_rng(0)
    ii = rng.integers(0, X, 50)
    jj = rng.integers(0, Y, 50)
    kk = rng.integers(0, Z, 50)
    coords = np.stack([
        -1 + 2 * ii / (X - 1), -1 + 2 * jj / (Y - 1), -1 + 2 * kk / (Z - 1),
    ], -1).astype(np.float32)

    exact = np.asarray(density_feature(cfg, params, jnp.asarray(coords)))
    baked_np = np.asarray(baked)
    got = baked_np[kk, jj, ii]
    np.testing.assert_allclose(got, exact, atol=1e-4, rtol=1e-4)


def test_baked_close_off_node():
    cfg, params, scene = _model()
    baked = bake_sigma_feature_grid(cfg, params)
    rng = np.random.default_rng(1)
    coords = rng.uniform(-0.95, 0.95, (500, 3)).astype(np.float32)
    exact = np.asarray(density_feature(cfg, params, jnp.asarray(coords)))
    aabb = scene["aabb"]
    xyz = np.asarray(aabb[0]) + (coords + 1) / 2 * (
        np.asarray(aabb[1]) - np.asarray(aabb[0]))
    approx = np.asarray(density_feature_baked(baked, aabb, jnp.asarray(xyz)))
    # sub-voxel cross terms only: small relative to the feature scale
    scale = np.abs(exact).mean()
    assert np.abs(approx - exact).mean() < 0.15 * scale


def test_transmittance_baked_close_to_exact():
    cfg, params, scene = _model(grid=(24, 24, 24))
    params = dict(params)
    for i in range(3):
        params[f"density_plane_{i}"] = params[f"density_plane_{i}"] + 2.0
    baked = bake_sigma_feature_grid(cfg, params)

    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (64, 3)).astype(np.float32))
    dirs = rng.normal(size=(64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs)

    from tensoir_tpu.models.field import bake_packed_sigma_grid
    packed = bake_packed_sigma_grid(cfg, params, scene, dtype=jnp.float32)
    t_exact, _ = compute_transmittance(cfg, params, scene, pts, dirs,
                                       n_sample=48)
    t_baked, _ = compute_transmittance(cfg, params, scene, pts, dirs,
                                       n_sample=48, baked=packed)
    np.testing.assert_allclose(np.asarray(t_baked), np.asarray(t_exact),
                               atol=0.05)


def test_packed_matches_plain_baked():
    from tensoir_tpu.models.field import (
        bake_packed_sigma_grid, density_feature_packed,
    )
    from tensoir_tpu.models import lifecycle as LC
    import jax.numpy as jnp

    cfg, params, scene = _model(grid=(20, 24, 28))
    params = dict(params)
    for i in range(3):
        params[f"density_plane_{i}"] = params[f"density_plane_{i}"] + 1.0
    scene, _ = LC.update_alpha_mask(cfg, params, scene, (16, 16, 16))

    baked = bake_sigma_feature_grid(cfg, params)
    packed = bake_packed_sigma_grid(cfg, params, scene, dtype=jnp.float32)
    assert packed.shape == (27, 23, 19, 8)

    rng = np.random.default_rng(3)
    coords = jnp.asarray(rng.uniform(-0.9, 0.9, (300, 3)).astype(np.float32))
    from tensoir_tpu.ops.interp import trilerp_volume
    plain = np.asarray(trilerp_volume(baked, coords))
    got = np.asarray(density_feature_packed(packed, coords))

    # where the mask keeps all 8 corners, packed == plain trilinear
    # (reuse `packed` — it is the same full-precision bake)
    mask_vals = np.asarray(trilerp_volume(
        jnp.asarray((np.asarray(packed) > -1e3).all(-1)
                    .astype(np.float32)), coords * (1 - 1e-6)))
    keep = mask_vals > 0.999
    np.testing.assert_allclose(got[keep], plain[keep], atol=1e-3, rtol=1e-3)


def test_packed_secondary_runs():
    from tensoir_tpu.render.secondary import secondary_shading_tiled
    cfg, params, scene = _model(grid=(16, 16, 16))
    rng = np.random.default_rng(4)
    P, L = 8, 16
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, (P, 3)).astype(np.float32))
    dirs = rng.normal(size=(P, L, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    vis, ind = secondary_shading_tiled(
        cfg, params, scene, pts, jnp.asarray(dirs),
        jnp.zeros((P,), jnp.int32), jnp.ones((P, L), bool),
        n_sample=16, vis_near=0.05, vis_far=1.5, tile=64,
        use_baked=True)
    assert vis.shape == (P, L, 1)
    assert np.isfinite(np.asarray(vis)).all()
    assert np.isfinite(np.asarray(ind)).all()
