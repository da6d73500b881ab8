"""Material-editing path: loader (hardcoded city image,
tensoIR_material_editing_test.py:160) + edited re-render through the
relight pipeline (albedo tint via the rescale input, roughness_scale)."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from tensoir_tpu.data import get_dataset
from tensoir_tpu.data.hdr import write_hdr
from tests.test_data_loaders import _make_tensoir_fixture


def _tiny_model():
    from tensoir_tpu.models.field import FieldConfig, init_field_params
    from tensoir_tpu.models import lifecycle as LC
    cfg = FieldConfig(density_n_comp=(4, 4, 4), app_n_comp=(4, 4, 4),
                      app_dim=6, feature_c=32, num_sgs=16, envmap_h=4,
                      envmap_w=8, step_ratio=2.0,
                      normals_kind="purely_predicted")
    aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
    params, scene = init_field_params(jax.random.PRNGKey(0), cfg,
                                      (16, 16, 16), aabb)
    from tensoir_tpu.utils.bench_scene import seed_solid_blob
    params = seed_solid_blob(dict(params), amp=8.0, sharp=0.2)
    scene, _ = LC.update_alpha_mask(cfg, params, scene, (16, 16, 16))
    return cfg, params, scene


def test_material_editing_loader_and_edit(tmp_path):
    root = os.path.join(tmp_path, "scene")
    _make_tensoir_fixture(root, general_names=("city", "bridge"))
    hdr_dir = os.path.join(tmp_path, "hdr")
    os.makedirs(hdr_dir)
    rng = np.random.default_rng(0)
    for name in ("city", "bridge"):
        write_hdr(os.path.join(hdr_dir, f"{name}.hdr"),
                  rng.random((8, 16, 3)).astype(np.float32))

    # loader always reads the city-lit image regardless of light name
    cls = get_dataset("tensoIR_material_editing_test")
    ds = cls(root, hdr_dir, split="test", light_names=["bridge"])
    item = ds[0]
    assert item["rgbs"].shape == (1, 256, 3)
    ds_city = cls(root, hdr_dir, split="test", light_names=["city"])
    np.testing.assert_array_equal(np.asarray(item["rgbs"]),
                                  np.asarray(ds_city[0]["rgbs"]))

    # edited re-render: tint flows through the rescale input, roughness
    # scaling changes the specular lobe
    from tensoir_tpu.models.env_light import EnvironmentLight
    from tensoir_tpu.render.relight_pipeline import make_relight_chunk_fn
    cfg, params, scene = _tiny_model()
    env = EnvironmentLight(hdr_dir)
    key = jax.random.PRNGKey(1)
    # center rows of the 16x16 image so rays hit the centered blob
    rays = np.asarray(item["rays"], np.float32)[96:160]

    fn_plain = make_relight_chunk_fn(cfg, env, "city", n_samples=32,
                                     n_light_samples=16, second_n_sample=12)
    fn_rough = make_relight_chunk_fn(cfg, env, "city", n_samples=32,
                                     n_light_samples=16, second_n_sample=12,
                                     roughness_scale=0.25)
    ones = jnp.ones((3,), jnp.float32)
    tint = jnp.asarray([1.0, 0.2, 0.2], jnp.float32)
    base = fn_plain(params, scene, jnp.asarray(rays), key, ones)
    tinted = fn_plain(params, scene, jnp.asarray(rays), key, tint)
    rough = fn_rough(params, scene, jnp.asarray(rays), key, ones)

    acc = np.asarray(base[2])
    hit = acc > 0.5
    assert hit.any()
    b, t, r = (np.asarray(x[0]) for x in (base, tinted, rough))
    # tint changes the relit color on surface rays (red kept, green cut)
    assert np.abs(t[hit] - b[hit]).max() > 1e-4
    assert float(np.mean(t[hit, 1])) < float(np.mean(b[hit, 1])) + 1e-6
    # roughness edit changes the specular response
    assert np.abs(r[hit] - b[hit]).max() > 1e-6
