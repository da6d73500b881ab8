"""Smoke coverage for the less-used shading modes (MLP_PE / plain MLP /
SH / RGB, tensorBase_rotated_lights.py:291-340,31-41 + init_render_func
:405-434) and light kinds (pixel / gt, :459-476,590-596): forward renders
must be finite and gradients must reach the relevant parameters."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensoir_tpu.models.field import FieldConfig, init_field_params
from tensoir_tpu.models import lifecycle as LC
from tensoir_tpu.render.primary import render_rays
from tensoir_tpu.utils.bench_scene import seed_solid_blob


def _model(**kw):
    kw.setdefault("app_dim", 6)
    cfg = FieldConfig(density_n_comp=(4, 4, 4), app_n_comp=(4, 4, 4),
                      feature_c=32, num_sgs=16, envmap_h=4,
                      envmap_w=8, step_ratio=2.0,
                      normals_kind="purely_predicted", **kw)
    aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
    params, scene = init_field_params(
        jax.random.PRNGKey(0), cfg, (16, 16, 16), aabb,
        gt_envmap=(np.full((4, 8, 3), 0.5, np.float32)
                   if kw.get("light_kind") == "gt" else None))
    params = seed_solid_blob(dict(params), amp=8.0, sharp=0.2)
    scene, _ = LC.update_alpha_mask(cfg, params, scene, (16, 16, 16))
    return cfg, params, scene


def _rays(n=16):
    rng = np.random.default_rng(0)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = -4.0
    d = rng.normal(size=(n, 3)).astype(np.float32) * 0.05
    d[:, 2] = 1.0
    return jnp.asarray(np.concatenate([o, d], -1))


@pytest.mark.parametrize("mode", ["MLP_PE", "MLP", "SH", "RGB"])
def test_shading_modes_forward(mode):
    app_dim = 27 if mode == "SH" else 3 if mode == "RGB" else 6
    cfg, params, scene = _model(shading_mode=mode, app_dim=app_dim)
    out = render_rays(cfg, params, scene, _rays(), jnp.zeros(16, jnp.int32),
                      n_samples=32, is_train=False, is_relight=False,
                      white_bg=True)
    rgb = np.asarray(out["rgb_map"])
    assert np.isfinite(rgb).all() and rgb.shape == (16, 3)

    def loss(p):
        o = render_rays(cfg, p, scene, _rays(), jnp.zeros(16, jnp.int32),
                        n_samples=32, is_train=False, is_relight=False,
                        white_bg=True)
        return jnp.mean(o["rgb_map"] ** 2)

    g = jax.grad(loss)(params)
    ga = np.asarray(g["app_line_0"])
    assert np.isfinite(ga).all() and np.abs(ga).max() > 0


@pytest.mark.parametrize("kind", ["pixel", "gt"])
def test_light_kinds_relight(kind):
    cfg, params, scene = _model(light_kind=kind)
    out = render_rays(cfg, params, scene, _rays(), jnp.zeros(16, jnp.int32),
                      n_samples=32, is_train=False, is_relight=True,
                      white_bg=True)
    assert np.isfinite(np.asarray(out["albedo_map"])).all()

    from tensoir_tpu.models.lighting import get_light_rgbs
    dirs = jnp.asarray(np.eye(3, dtype=np.float32))
    env = get_light_rgbs(params, cfg, dirs,
                         gt_envmap=scene.get("gt_envmap"))
    env = np.asarray(env)
    assert env.shape == (cfg.light_num, 3, 3)
    assert np.isfinite(env).all() and (env >= 0).all()
    if kind == "pixel":
        # learnable: gradient flows into the pixel texture
        def loss(p):
            e = get_light_rgbs(p, cfg, dirs)
            return jnp.sum(e ** 2)
        g = jax.grad(loss)(params)
        assert np.abs(np.asarray(g["light_pixel"])).max() > 0
