"""Fast secondary march in the eval suite + orbit-path rendering.

The reference eval protocol (renderer.py:225-250) marches the exact field;
`evaluation_iter(fast_march=True)` / `make_eval_chunk_fn`'s window knobs
trade that for the canonical quality-gated fast config (BASELINE.md). These
tests pin (a) the fast chunk fn stays PSNR-neutral vs the exact one on a
solid scene, (b) `evaluation_path` renders a full orbit video from the
synthetic-pose machinery (train_tensoIR.py:455-462 / tensoIR_simple.py:
84-155).
"""
import json
import os

import numpy as np
import pytest

from tensoir_tpu.models.field import FieldConfig, init_field_params
from tensoir_tpu.models.lifecycle import update_alpha_mask
from tensoir_tpu.render.eval import make_eval_chunk_fn, evaluation_path
from tensoir_tpu.utils.bench_scene import bench_rays, seed_solid_blob


def _tiny_scene(grid=48, mask_reso=24):
    import jax
    cfg = FieldConfig(
        density_n_comp=(4, 4, 4), app_n_comp=(8, 8, 8), app_dim=9,
        shading_mode="MLP_Fea", normals_kind="derived_plus_predicted",
        light_kind="sg", num_sgs=16, envmap_h=4, envmap_w=8,
        feature_c=32, step_ratio=0.5)
    aabb = np.array([[-1.5] * 3, [1.5] * 3], np.float32)
    params, scene = init_field_params(
        jax.random.PRNGKey(0), cfg, (grid,) * 3, aabb)
    params = seed_solid_blob(params)
    scene, _ = update_alpha_mask(cfg, params, scene, (mask_reso,) * 3)
    return cfg, params, scene


def test_fast_march_chunk_fn_psnr_neutral():
    """Windowed/compacted/baked eval march vs the exact full march on a
    solid-occupancy scene: primary maps identical, relit map within the
    window-march error bound (transmittance err <~2e-3 per the
    secondary._march_window contract)."""
    import jax.numpy as jnp
    cfg, params, scene = _tiny_scene()
    rays = jnp.asarray(bench_rays(64))
    lidx = jnp.zeros((64,), jnp.int32)

    # secondary_tile chosen so the per-tile app-pair capacity (tile/4 dense,
    # tile/2 compacted) never overflows at 16 rays x 32 dirs = 512 pairs:
    # otherwise the two paths drop DIFFERENT overflow pairs and the diff
    # measures capacity policy, not march accuracy (the canonical on-chip
    # config has tile 32768 and modest overflow — BASELINE.md)
    common = dict(n_samples=96, chunk=64, app_cap=16, relight_ray_cap=16,
                  second_n_sample=32, secondary_tile=2048,
                  march_cap=64, second_march_cap=16)
    exact_fn, _ = make_eval_chunk_fn(cfg, **common)
    # scaled-down analog of FAST_MARCH_KNOBS (the canonical window sizes
    # assume second_n_sample=96; contract: half prepass spacing 0.104 <=
    # dilate 2 x coarse cell 0.094 = 0.1875 at bake 32 over aabb width 3)
    fast_fn, _ = make_eval_chunk_fn(
        cfg, **common, second_window=12, second_window_back=4,
        second_prepass_n=8, coarse_dilate=2,
        secondary_compact_frac=0.5625, secondary_bake_reso=32,
        app_bake_reso=32)

    out_e = exact_fn(params, scene, rays, lidx)
    out_f = fast_fn(params, scene, rays, lidx)

    # primary maps are untouched by secondary knobs
    np.testing.assert_allclose(np.asarray(out_f["rgb_map"]),
                               np.asarray(out_e["rgb_map"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_f["normal_map"]),
                               np.asarray(out_e["normal_map"]), atol=1e-6)
    # relit map: agreement PSNR between fast and exact renders. At this
    # deliberately coarse toy scale (bake 32 of grid 48, window 12 of 32)
    # the analog is LESS accurate than the canonical config (bake 128 of
    # 200, window 48 of 96); >33 dB agreement bounds the effect on a
    # reported ~30 dB metric to ~0.1 dB. The canonical knobs are verified
    # on-chip against the exact path (BASELINE.md round-3 gate).
    e = np.asarray(out_e["rgb_with_brdf_map"])
    f = np.asarray(out_f["rgb_with_brdf_map"])
    mse = float(np.mean((e - f) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    assert psnr > 33.0, f"fast-march eval diverges: {psnr:.1f} dB vs exact"


def test_evaluation_path_renders_orbit(tmp_path):
    """evaluation_path writes one frame set + videos per orbit pose."""
    from PIL import Image
    from tensoir_tpu.data import get_dataset
    from tensoir_tpu.data.ray_utils import look_at

    root = os.path.join(tmp_path, "own")
    os.makedirs(root)
    frames = {}
    for k in range(3):
        c2w = look_at([4 * np.cos(k), 4 * np.sin(k), 1.0])
        m = np.concatenate([c2w, [[0, 0, 0, 1]]], 0).tolist()
        frames[str(k)] = {"file_path": f"img_{k}.png",
                          "transform_matrix": m, "light_idx": 0}
        rng = np.random.default_rng(k)
        arr = (rng.random((16, 16, 4)) * 255).astype(np.uint8)
        Image.fromarray(arr, "RGBA").save(os.path.join(root, f"img_{k}.png"))
    meta = {"camera_angle_x": 0.69, "frames": frames}
    with open(os.path.join(root, "transforms_test.json"), "w") as f:
        json.dump(meta, f)

    ds = get_dataset("tensoIR_simple")(
        root, split="test", light_rotation=["000"], test_new_pose=True,
        n_orbit=4)
    cfg, params, scene = _tiny_scene()
    out_dir = os.path.join(tmp_path, "imgs_path_all")
    n = evaluation_path(cfg, params, scene, ds, n_samples=48,
                        save_path=out_dir, chunk=256, second_n_sample=16,
                        secondary_tile=256, fast_march=False)
    assert n == 4
    for sub in ("rgb", "brdf", "normal"):
        files = os.listdir(os.path.join(out_dir, sub))
        assert len([f for f in files if f.endswith(".png")]) == 4
    # a video (mp4 or gif fallback) exists per stream
    vids = [f for f in os.listdir(out_dir)
            if f.endswith((".mp4", ".gif"))]
    assert len(vids) == 3


def test_secondary_app_hoist_exact():
    """The global (cross-tile) appearance stage must reproduce the in-tile
    app stage exactly: same selection, same math, only the batching and
    scatter-back differ (render/secondary.py app_hoist)."""
    import jax
    import jax.numpy as jnp
    from tensoir_tpu.render.secondary import secondary_shading_tiled

    cfg, params, scene = _tiny_scene()
    P, L = 48, 16
    k = jax.random.PRNGKey(3)
    pts = jax.random.uniform(k, (P, 3), minval=-0.4, maxval=0.4)
    dirs = jax.random.normal(jax.random.fold_in(k, 1), (P, L, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    lidx = jnp.zeros((P,), jnp.int32)
    mask = jax.random.uniform(jax.random.fold_in(k, 2), (P, L)) > 0.4

    outs = {}
    for hoist in (False, True):
        for compact in (0.0, 0.75):
            vis, ind = secondary_shading_tiled(
                cfg, params, scene, pts, dirs, lidx, mask,
                n_sample=24, vis_near=0.05, vis_far=1.5, tile=256,
                app_cap=8, march_cap=12, use_baked=True, bake_reso=32,
                window=8, window_back=4, prepass_n=8, coarse_dilate=2,
                compact_frac=compact, app_bake_reso=32, app_hoist=hoist)
            outs[(hoist, compact)] = (np.asarray(vis), np.asarray(ind))
    for compact in (0.0, 0.75):
        v0, i0 = outs[(False, compact)]
        v1, i1 = outs[(True, compact)]
        np.testing.assert_allclose(v1, v0, atol=1e-6)
        np.testing.assert_allclose(i1, i0, atol=1e-6)
