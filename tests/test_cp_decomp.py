"""TensorCP decomposition (lines-only rank factorization,
tensoRF_init.py:308-436): forward render, gradients, and the
coarse-to-fine lifecycle must work like the VM path."""
import numpy as np
import jax
import jax.numpy as jnp

from tensoir_tpu.models.field import FieldConfig, init_field_params
from tensoir_tpu.models import lifecycle as LC
from tensoir_tpu.render.primary import render_rays


def _cp_model():
    cfg = FieldConfig(decomp="cp", density_n_comp=(8, 8, 8),
                      app_n_comp=(8, 8, 8), app_dim=6, feature_c=32,
                      num_sgs=16, envmap_h=4, envmap_w=8, step_ratio=2.0,
                      normals_kind="purely_predicted")
    aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
    params, scene = init_field_params(jax.random.PRNGKey(0), cfg,
                                      (20, 20, 20), aabb)
    return cfg, params, scene


def _rays(n=16, seed=0):
    rng = np.random.default_rng(seed)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = -4.0
    d = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    d[:, 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(np.concatenate([o, d], -1))


def test_cp_forward_and_grad():
    cfg, params, scene = _cp_model()
    rays = _rays()
    lidx = jnp.zeros(16, jnp.int32)
    out = render_rays(cfg, params, scene, rays, lidx, n_samples=48,
                      is_train=False, is_relight=True, white_bg=True)
    for k in ("rgb_map", "depth_map", "acc_map", "normal_map", "albedo_map"):
        assert np.isfinite(np.asarray(out[k])).all(), k

    def loss(p):
        o = render_rays(cfg, p, scene, rays, lidx, n_samples=48,
                        is_train=False, is_relight=False, white_bg=True)
        return jnp.mean(o["rgb_map"] ** 2)

    g = jax.grad(loss)(params)
    # gradients reach the CP line factors
    gl = np.asarray(g["density_line_0"])
    assert np.isfinite(gl).all() and np.abs(gl).max() > 0


def test_cp_lifecycle():
    cfg, params, scene = _cp_model()
    # alpha mask + shrink + upsample, as the phase schedule does
    scene, aabb_new = LC.update_alpha_mask(cfg, params, scene, (16, 16, 16))
    params2, scene2 = LC.shrink(cfg, params, scene, np.asarray(aabb_new))
    params3 = LC.upsample(params2, (28, 28, 28))
    assert params3["density_line_0"].shape[0] == 28
    out = render_rays(cfg, params3, scene2, _rays(), jnp.zeros(16, jnp.int32),
                      n_samples=48, is_train=False, is_relight=False,
                      white_bg=True)
    assert np.isfinite(np.asarray(out["rgb_map"])).all()
