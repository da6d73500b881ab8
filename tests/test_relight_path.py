"""Relighting branch: forward + gradient smoke tests (tiny shapes).

Covers the inverse-rendering stack: BRDF/normal decoding, derived normals
(double differentiation through the density sampler — SURVEY.md §7.3 #1),
secondary visibility marching, and the rendering-equation integral.
"""
import numpy as np
import jax
import jax.numpy as jnp

from tensoir_tpu.models.field import FieldConfig, init_field_params
from tensoir_tpu.render.train_render import render_train_batch
from tensoir_tpu.train.step import LossWeights, StepStatic, compute_loss


def _tiny_model(normals_kind="derived_plus_predicted", light_kind="sg",
                per_light_sg=False, light_num=1):
    cfg = FieldConfig(
        density_n_comp=(4, 4, 4), app_n_comp=(4, 4, 4), app_dim=6,
        shading_mode="MLP_Fea", normals_kind=normals_kind,
        light_kind=light_kind, per_light_sg=per_light_sg,
        light_num=light_num,
        light_rotations=tuple(int(120 * i) for i in range(light_num)),
        num_sgs=16, envmap_h=4, envmap_w=8, feature_c=32, step_ratio=2.0,
    )
    aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
    params, scene = init_field_params(
        jax.random.PRNGKey(0), cfg, (16, 16, 16), aabb)
    return cfg, params, scene


def _rays(n=24):
    rng = np.random.default_rng(0)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = -4.0
    d = rng.normal(size=(n, 3)).astype(np.float32) * 0.05
    d[:, 2] = 1.0
    return jnp.asarray(np.concatenate([o, d], -1))


def test_relight_forward_outputs():
    cfg, params, scene = _tiny_model()
    rays = _rays()
    out = render_train_batch(
        cfg, params, scene, rays, jnp.zeros(rays.shape[0], jnp.int32),
        n_samples=24, key=jax.random.PRNGKey(1), is_train=True,
        is_relight=True, white_bg=True, app_cap=8, relight_ray_cap=8,
        second_n_sample=12, secondary_tile=64)
    for k in ("rgb_map", "rgb_with_brdf_map", "normal_map", "albedo_map",
              "roughness_map", "normals_diff_map",
              "normals_orientation_loss_map"):
        assert np.isfinite(np.asarray(out[k])).all(), k
    assert out["rgb_with_brdf_map"].shape == (24, 3)


def test_relight_loss_grads_finite():
    cfg, params, scene = _tiny_model()
    rays = _rays()
    batch = {
        "rays": rays,
        "rgbs": jnp.ones((rays.shape[0], 3)) * 0.5,
        "light_idx": jnp.zeros(rays.shape[0], jnp.int32),
    }
    st = StepStatic(n_samples=24, is_relight=True, white_bg=True, app_cap=8,
                    relight_ray_cap=8, second_n_sample=12, secondary_tile=64)
    w = LossWeights(ortho=1e-3, l1=1e-4, tv_density=0.01, tv_app=0.01,
                    lr_factor=0.999, n_iters=100, relight_start=0)

    def loss(p):
        total, _ = compute_loss(cfg, p, scene, batch, jax.random.PRNGKey(2),
                                jnp.asarray(5), st, w)
        return total

    grads = jax.grad(loss)(params)
    flat, _ = jax.tree.flatten(grads)
    for g in flat:
        assert np.isfinite(np.asarray(g)).all()
    # derived-normals second-order path must reach the density factors
    g_plane = np.asarray(grads["density_plane_0"])
    assert np.abs(g_plane).sum() > 0


def test_relight_multi_light_rotated():
    cfg, params, scene = _tiny_model(light_num=3)
    rays = _rays(12)
    lidx = jnp.asarray(np.array([0, 1, 2] * 4, np.int32))
    out = render_train_batch(
        cfg, params, scene, rays, lidx,
        n_samples=16, key=jax.random.PRNGKey(3), is_train=True,
        is_relight=True, white_bg=True, app_cap=4, relight_ray_cap=4,
        second_n_sample=8, secondary_tile=64)
    assert np.isfinite(np.asarray(out["rgb_with_brdf_map"])).all()


def test_relight_general_multi_light_per_sg():
    cfg, params, scene = _tiny_model(light_num=2, per_light_sg=True)
    assert params["lgt_sgs"].shape == (2, 16, 7)
    rays = _rays(8)
    lidx = jnp.asarray(np.array([0, 1] * 4, np.int32))
    out = render_train_batch(
        cfg, params, scene, rays, lidx,
        n_samples=16, key=jax.random.PRNGKey(4), is_train=True,
        is_relight=True, white_bg=True, app_cap=4, relight_ray_cap=4,
        second_n_sample=8, secondary_tile=64)
    assert np.isfinite(np.asarray(out["rgb_with_brdf_map"])).all()


def test_normals_kinds_run():
    for kind in ("purely_predicted", "purely_derived", "residue_prediction",
                 "derived_plus_predicted", "gt_normals"):
        cfg, params, scene = _tiny_model(normals_kind=kind)
        rays = _rays(8)
        normal_gt = None
        if kind == "gt_normals":
            g = np.zeros((8, 3), np.float32)
            g[:, 2] = -1.0
            normal_gt = jnp.asarray(g)
        out = render_train_batch(
            cfg, params, scene, rays, jnp.zeros(8, jnp.int32),
            n_samples=16, key=jax.random.PRNGKey(5), is_train=True,
            is_relight=True, white_bg=True, app_cap=4, relight_ray_cap=4,
            second_n_sample=8, secondary_tile=64, normal_gt=normal_gt)
        assert np.isfinite(np.asarray(out["normal_map"])).all(), kind


def test_brdf_warmup_ramp():
    """rgb_brdf_warmup_iters: the BRDF term enters the total with a traced
    linear ramp — 0 before relight_start, the EXACT reference weight from
    relight_start + warmup onward (collapse guard for compressed schedules;
    BASELINE.md r4 matrix reading)."""
    cfg, params, scene = _tiny_model()
    rays = _rays()
    batch = {
        "rays": rays,
        "rgbs": jnp.ones((rays.shape[0], 3)) * 0.5,
        "light_idx": jnp.zeros(rays.shape[0], jnp.int32),
    }
    st = StepStatic(n_samples=24, is_relight=True, white_bg=True, app_cap=8,
                    relight_ray_cap=8, second_n_sample=12, secondary_tile=64,
                    deterministic=True)
    base = dict(ortho=0.0, l1=0.0, tv_density=0.0, tv_app=0.0,
                rgb_brdf=0.2, n_iters=100, relight_start=10)
    w0 = LossWeights(**base)                            # constant weight
    ww = LossWeights(**base, rgb_brdf_warmup_iters=20)  # 20-iter ramp

    def total(w, it):
        t, aux = compute_loss(cfg, params, scene, batch,
                              jax.random.PRNGKey(2), jnp.asarray(it), st, w)
        return float(t), float(aux["loss_rgb_brdf"])

    for it, frac in ((10, 1.0 / 20), (19, 0.5), (29, 1.0), (60, 1.0)):
        t0, b = total(w0, it)
        tw, bw = total(ww, it)
        assert np.isclose(b, bw, rtol=1e-6)          # loss METRIC unscaled
        # ramp only changes the brdf contribution to the total
        np.testing.assert_allclose(tw - (t0 - 0.2 * b),
                                   0.2 * frac * b, rtol=2e-3,
                                   err_msg=f"it={it}")


def test_brdf_loss_fullcap_is_reference_fullbatch_mean():
    """At relight_ray_cap >= batch, the masked-mean BRDF loss equals the
    reference's FULL-batch mean over rgb_with_brdf_map (every masked ray
    relit, white background rows included —
    train_tensoIR_rotated_multi_lights.py:305 + renderer.py:95). This pins
    cap>=batch as the reference-faithful pressure (BASELINE.md r4)."""
    cfg, params, scene = _tiny_model()
    rays = _rays(24)
    gt = jnp.ones((24, 3)) * 0.5
    batch = {"rays": rays, "rgbs": gt,
             "light_idx": jnp.zeros(24, jnp.int32)}
    st = StepStatic(n_samples=24, is_relight=True, white_bg=True, app_cap=8,
                    relight_ray_cap=24, second_n_sample=12,
                    secondary_tile=64, deterministic=True)
    w = LossWeights(ortho=0.0, l1=0.0, tv_density=0.0, tv_app=0.0,
                    rgb_brdf=0.2, n_iters=100, relight_start=0)
    _, aux = compute_loss(cfg, params, scene, batch, jax.random.PRNGKey(2),
                          jnp.asarray(5), st, w)
    out = render_train_batch(
        cfg, params, scene, rays, batch["light_idx"],
        n_samples=24, key=None, is_train=False,
        is_relight=True, white_bg=True, app_cap=8, relight_ray_cap=24,
        second_n_sample=12, secondary_tile=64)
    ref_loss = float(jnp.mean((out["rgb_with_brdf_map"] - gt) ** 2))
    np.testing.assert_allclose(float(aux["loss_rgb_brdf"]), ref_loss,
                               rtol=1e-5)
