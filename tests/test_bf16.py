"""bfloat16 compute-dtype path: forward + grads stay finite and close to
fp32 (the MLP/basis matmuls run on the MXU in bf16 with fp32 accumulation).
"""
import numpy as np
import jax
import jax.numpy as jnp

from tensoir_tpu.models.field import FieldConfig, init_field_params
from tensoir_tpu.render.primary import render_rays


def _pair():
    kw = dict(density_n_comp=(4, 4, 4), app_n_comp=(4, 4, 4), app_dim=6,
              feature_c=32, num_sgs=16, envmap_h=4, envmap_w=8,
              step_ratio=2.0, normals_kind="purely_predicted")
    cfg32 = FieldConfig(**kw)
    cfg16 = FieldConfig(compute_dtype="bfloat16", **kw)
    aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
    params, scene = init_field_params(jax.random.PRNGKey(0), cfg32,
                                      (16, 16, 16), aabb)
    return cfg32, cfg16, params, scene


def test_bf16_forward_close_to_fp32():
    cfg32, cfg16, params, scene = _pair()
    rng = np.random.default_rng(0)
    o = np.zeros((16, 3), np.float32)
    o[:, 2] = -4.0
    d = rng.normal(size=(16, 3)).astype(np.float32) * 0.1
    d[:, 2] = 1.0
    rays = jnp.asarray(np.concatenate([o, d], -1))
    lidx = jnp.zeros(16, jnp.int32)

    out32 = render_rays(cfg32, params, scene, rays, lidx, n_samples=24,
                        key=None, is_relight=True, white_bg=True, app_cap=8)
    out16 = render_rays(cfg16, params, scene, rays, lidx, n_samples=24,
                        key=None, is_relight=True, white_bg=True, app_cap=8)
    np.testing.assert_allclose(np.asarray(out16["rgb_map"]),
                               np.asarray(out32["rgb_map"]), atol=0.03)
    assert np.isfinite(np.asarray(out16["normal_map"])).all()


def test_bf16_grads_finite():
    cfg32, cfg16, params, scene = _pair()
    rays = jnp.concatenate([
        jnp.zeros((8, 2)), jnp.full((8, 1), -4.0),
        jnp.zeros((8, 2)), jnp.ones((8, 1))], -1)

    def loss(p):
        out = render_rays(cfg16, p, scene, rays, jnp.zeros(8, jnp.int32),
                          n_samples=16, key=None, is_relight=True,
                          white_bg=True, app_cap=8)
        return jnp.mean(out["rgb_map"] ** 2) + jnp.mean(out["albedo_map"])

    grads = jax.grad(loss)(params)
    for g in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(g)).all()
