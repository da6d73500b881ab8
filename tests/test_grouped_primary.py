"""Grouped primary march (march_group) must match the per-sample march
exactly: group-aligned selection keeps a superset of the occupied samples
(false positives masked to sigma=0) and the 16-corner block-row plane query
is the same bilinear math as the per-sample packed gather."""
import numpy as np
import jax
import jax.numpy as jnp

from tensoir_tpu.models.field import (FieldConfig, init_field_params,
                                      density_feature,
                                      density_feature_grouped)
from tensoir_tpu.models import lifecycle as LC
from tensoir_tpu.ops.interp import (bilerp_plane_packed,
                                    bilerp_plane_group_packed)
from tensoir_tpu.render.primary import render_rays


def test_group_packed_plane_matches_per_sample():
    """Adjacent samples (span <= 1.5 cells): block-row bilinear == packed."""
    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.normal(size=(17, 13, 5)).astype(np.float32))
    # groups of 4 points within 1.5 cells of a random base, incl. borders
    base = rng.uniform(-1.1, 1.1, size=(64, 2)).astype(np.float32)
    off = rng.uniform(0.0, 1.5, size=(64, 4, 2)).astype(np.float32)
    cell = np.array([2.0 / 12, 2.0 / 16], np.float32)  # x: W-1, y: H-1
    pts = base[:, None, :] + off * cell                  # [64, 4, 2]
    x, y = jnp.asarray(pts[..., 0]), jnp.asarray(pts[..., 1])
    got = bilerp_plane_group_packed(plane, x, y)
    want = bilerp_plane_packed(plane, x, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_group_packed_plane_grad_matches():
    """VJP w.r.t. the plane (the scatter path this exists to shrink) and the
    coords must match the per-sample packed variant."""
    rng = np.random.default_rng(1)
    plane = jnp.asarray(rng.normal(size=(9, 9, 3)).astype(np.float32))
    base = rng.uniform(-0.9, 0.9, size=(16, 2)).astype(np.float32)
    off = rng.uniform(0.0, 1.4, size=(16, 4, 2)).astype(np.float32) * (2.0 / 8)
    pts = jnp.asarray(base[:, None, :] + off)

    def f_group(p, c):
        return jnp.sum(jnp.sin(
            bilerp_plane_group_packed(p, c[..., 0], c[..., 1])))

    def f_plain(p, c):
        return jnp.sum(jnp.sin(
            bilerp_plane_packed(p, c[..., 0], c[..., 1])))

    gp_g, gc_g = jax.grad(f_group, argnums=(0, 1))(plane, pts)
    gp_p, gc_p = jax.grad(f_plain, argnums=(0, 1))(plane, pts)
    np.testing.assert_allclose(np.asarray(gp_g), np.asarray(gp_p),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gc_g), np.asarray(gc_p),
                               atol=1e-4, rtol=1e-4)


def _model_small_step():
    # step_ratio 0.5 => (g-1)*step = 1.5 cells: inside the block contract
    cfg = FieldConfig(density_n_comp=(4, 4, 4), app_n_comp=(4, 4, 4),
                      app_dim=6, feature_c=32, num_sgs=16, envmap_h=4,
                      envmap_w=8, step_ratio=0.5,
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


def test_density_feature_grouped_matches():
    cfg, params, _ = _model_small_step()
    rng = np.random.default_rng(2)
    base = rng.uniform(-0.95, 0.95, size=(32, 1, 3)).astype(np.float32)
    d = rng.normal(size=(32, 1, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # 4 consecutive samples, 0.5 cells apart along a ray
    t = np.arange(4, dtype=np.float32).reshape(1, 4, 1) * 0.5 * (2.0 / 23)
    coords = jnp.asarray(np.clip(base + d * t, -1.2, 1.2))
    got = density_feature_grouped(cfg, params, coords)
    want = density_feature(cfg, params, coords)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_render_rays_grouped_matches_ungrouped():
    cfg, params, scene = _model_small_step()
    rng = np.random.default_rng(3)
    o = np.zeros((16, 3), np.float32)
    o[:, 2] = -4.0
    d = rng.normal(size=(16, 3)).astype(np.float32) * 0.1
    d[:, 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate([o, d], -1))
    lidx = jnp.zeros(16, jnp.int32)
    # n_samples NOT divisible by 4: exercises the group padding/clip path;
    # cap generous so group-aligned selection never overflows
    kw = dict(n_samples=70, key=None, is_train=False, is_relight=True,
              white_bg=True, app_cap=0, march_cap=64)
    plain = render_rays(cfg, params, scene, rays, lidx, **kw)
    grouped = render_rays(cfg, params, scene, rays, lidx,
                          march_group=4, **kw)
    for k in ("rgb_map", "depth_map", "acc_map", "albedo_map", "normal_map"):
        np.testing.assert_allclose(np.asarray(grouped[k]),
                                   np.asarray(plain[k]), atol=1e-5,
                                   rtol=1e-4, err_msg=k)


def test_render_rays_grouped_gradients_match():
    """Param gradients through the grouped march must equal the per-sample
    march (the VJP block-scatter is the whole point of the optimization)."""
    cfg, params, scene = _model_small_step()
    rng = np.random.default_rng(4)
    o = np.zeros((8, 3), np.float32)
    o[:, 2] = -4.0
    d = rng.normal(size=(8, 3)).astype(np.float32) * 0.1
    d[:, 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate([o, d], -1))
    lidx = jnp.zeros(8, jnp.int32)

    def loss(p, group):
        out = render_rays(cfg, p, scene, rays, lidx, n_samples=64,
                          key=None, is_train=False, is_relight=False,
                          white_bg=True, app_cap=0, march_cap=48,
                          march_group=group)
        return jnp.sum(out["rgb_map"] ** 2) + jnp.sum(out["depth_map"])

    g_plain = jax.grad(loss)(params, 0)
    g_group = jax.grad(loss)(params, 4)
    flat_p = jax.tree_util.tree_leaves_with_path(g_plain)
    flat_g = jax.tree.leaves(g_group)
    for (path, a), b in zip(flat_p, flat_g):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5,
                                   rtol=1e-4, err_msg=str(path))


def test_march_group_contract_rejected():
    cfg, params, scene = _model_small_step()
    import dataclasses
    bad_cfg = dataclasses.replace(cfg, step_ratio=2.0)
    rays = jnp.zeros((4, 6), jnp.float32).at[:, 5].set(1.0)
    lidx = jnp.zeros(4, jnp.int32)
    try:
        render_rays(bad_cfg, params, scene, rays, lidx, n_samples=32,
                    key=None, is_relight=False, march_cap=16, march_group=4)
    except ValueError as e:
        assert "block contract" in str(e)
    else:
        raise AssertionError("contract violation not rejected")


def test_resolve_primary_march_group_downgrades():
    from tensoir_tpu.config import TensoIRConfig
    from tensoir_tpu.train.loop import resolve_primary_march_group
    cfg = TensoIRConfig(march_group=4, march_cap_primary=192)
    iso = np.array([[-1.5] * 3, [1.5] * 3], np.float32)
    # isotropic units at step_ratio 0.5: (4-1)*0.5 = 1.5 <= 2 -> keep 4
    assert resolve_primary_march_group(cfg, iso, (200, 200, 200), 0.5) == 4
    # anisotropic shrink (x-axis halved, grid kept): worst axis
    # 1.5 * mean/min ~ 2.5 > 2 -> downgrade to 2
    aniso = np.array([[-0.6, -1.5, -1.5], [0.6, 1.5, 1.5]], np.float32)
    assert resolve_primary_march_group(cfg, aniso, (200, 200, 200), 0.5) == 2
    # huge step: no group legal
    assert resolve_primary_march_group(cfg, iso, (200, 200, 200), 2.0) == 0
    # cap not divisible by 4 -> falls to 2
    cfg2 = TensoIRConfig(march_group=4, march_cap_primary=190)
    assert resolve_primary_march_group(cfg2, iso, (200, 200, 200), 0.5) == 2
