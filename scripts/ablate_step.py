"""Phase-level ablation of the canonical bench step (scalar-synced).

Times each cost center of the training step at bench.py's exact config so
perf work targets the real bottleneck:
  full        entire train step (fwd+bwd+adam)
  radiance    is_relight=False step (primary fwd+bwd+adam, no secondary)
  bake        packed sigma-grid bake alone
  secondary   secondary_shading_tiled alone (vis+indirect, no grad)
  primary_fwd render_rays forward only (relight branch on)
  prim_nograd radiance-only forward (no grad) — march+density+shading cost

Run detached on the TPU (CLAUDE.md: never under timeout):
  nohup python scripts/ablate_step.py > /tmp/ablate_r2.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# escape hatch for queue scripts: near a round boundary a queued profile
# must not hold the serialized axon tunnel while the driver's end-of-round
# bench wants it — touch /tmp/skip_ablate to turn a queued run into a no-op
if os.path.exists("/tmp/skip_ablate"):
    print("skipped: /tmp/skip_ablate present", flush=True)
    sys.exit(0)


def main():
    import jax
    import jax.numpy as jnp
    from tensoir_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    from tensoir_tpu.utils.compile_cache import enable as _cc
    _cc()

    from tensoir_tpu.models.field import FieldConfig, init_field_params
    from tensoir_tpu.models import field as F
    from tensoir_tpu.models.lifecycle import update_alpha_mask
    from tensoir_tpu.render import primary, secondary
    from tensoir_tpu.train.optim import make_optimizer
    from tensoir_tpu.train.step import LossWeights, StepStatic, make_train_step

    platform = jax.devices()[0].platform
    B, GRID, N_SAMPLES, RELIGHT_CAP = 4096, 200, 700, 4096
    ENV_H, ENV_W, SECOND_N, TILE = 16, 32, 96, 32768
    WINDOW, WINDOW_BACK, COMPACT = 48, 16, 0.5625
    MASK_RESO = 128
    if platform == "cpu":
        B, GRID, N_SAMPLES, RELIGHT_CAP = 256, 48, 64, 32
        ENV_H, ENV_W, SECOND_N, TILE = 4, 8, 16, 1024
        WINDOW, WINDOW_BACK = 12, 4
        MASK_RESO = 24

    cfg = FieldConfig(density_n_comp=(16, 16, 16), app_n_comp=(48, 48, 48),
                      app_dim=27, shading_mode="MLP_Fea",
                      normals_kind="derived_plus_predicted", light_kind="sg",
                      num_sgs=128, envmap_h=ENV_H, envmap_w=ENV_W,
                      feature_c=128, step_ratio=0.5)
    aabb = np.array([[-1.5] * 3, [1.5] * 3], np.float32)
    params, scene = init_field_params(
        jax.random.PRNGKey(0), cfg, (GRID, GRID, GRID), aabb)
    from tensoir_tpu.utils.bench_scene import bench_rays, seed_solid_blob
    params = seed_solid_blob(params)
    scene, _ = update_alpha_mask(cfg, params, scene,
                                 (MASK_RESO,) * 3)

    optimizer = make_optimizer(params, 0.02, 1e-3, 0.999971)
    opt_state = optimizer.init(params)
    st = StepStatic(n_samples=N_SAMPLES, is_relight=True, white_bg=True,
                    app_cap=32, relight_ray_cap=RELIGHT_CAP,
                    march_cap=192, march_select="scatter",
                    second_march_cap=32,
                    secondary_use_baked=True, secondary_bake_reso=128,
                    second_window=WINDOW, second_window_back=WINDOW_BACK,
                    second_prepass_n=12, coarse_dilate=3,
                    secondary_compact_frac=COMPACT,
                    second_march_group=4 if platform != "cpu" else 0,
                    group_bake_reso=64,
                    app_bake_reso=64,
                    second_n_sample=SECOND_N, secondary_tile=TILE)
    w = LossWeights(ortho=0.0, l1=4e-5, tv_density=0.0, tv_app=0.0,
                    lr_factor=0.999971, n_iters=80000, relight_start=10000)

    batch = {"rays": jnp.asarray(bench_rays(B)),
             "rgbs": jnp.full((B, 3), 0.5, jnp.float32),
             "light_idx": jnp.zeros((B,), jnp.int32)}
    key = jax.random.PRNGKey(1)
    n_iters = 8 if platform != "cpu" else 2

    def timeit(name, fn, sync):
        out = fn(0)
        sync(out)
        t0 = time.perf_counter()
        for i in range(n_iters):
            out = fn(i + 1)
        sync(out)
        ms = (time.perf_counter() - t0) / n_iters * 1e3
        print(json.dumps({"phase": name, "ms": round(ms, 1)}), flush=True)
        return ms

    # 1) full step
    step_fn = make_train_step(cfg, optimizer, st, w, donate=False)
    timeit("full", lambda i: step_fn(params, opt_state, scene, batch,
                                     jax.random.fold_in(key, i),
                                     jnp.asarray(i))[2],
           lambda m: float(m["total_loss"]))

    # 2) radiance-only step
    st_rad = StepStatic(**{**st.__dict__, "is_relight": False})
    step_rad = make_train_step(cfg, optimizer, st_rad, w, donate=False)
    timeit("radiance", lambda i: step_rad(params, opt_state, scene, batch,
                                          jax.random.fold_in(key, i),
                                          jnp.asarray(i))[2],
           lambda m: float(m["total_loss"]))

    # 3) bake alone
    bake = jax.jit(lambda p: F.bake_packed_sigma_grid(
        cfg, p, scene, max_reso=st.secondary_bake_reso))
    timeit("bake", lambda i: bake(params),
           lambda b: float(b.astype(jnp.float32).ravel()[0]))
    baked = bake(params)

    # 4) secondary alone (vis+indirect over cap x L pairs, baked path)
    L = ENV_H * ENV_W
    pts = jnp.zeros((RELIGHT_CAP, 3), jnp.float32)
    dirs = jax.random.normal(jax.random.PRNGKey(2), (RELIGHT_CAP, L, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    lidx = jnp.zeros((RELIGHT_CAP,), jnp.int32)
    pmask = jnp.ones((RELIGHT_CAP, L), bool)

    def make_sec(app_cap):
        return jax.jit(lambda p: secondary.secondary_shading_tiled(
            cfg, p, scene, pts, dirs, lidx, pmask,
            n_sample=SECOND_N, vis_near=st.second_near,
            vis_far=st.second_far,
            tile=TILE, app_cap=app_cap, march_cap=st.second_march_cap,
            use_baked=True, bake_reso=st.secondary_bake_reso,
            window=WINDOW, window_back=WINDOW_BACK,
            prepass_n=st.second_prepass_n, coarse_dilate=st.coarse_dilate,
            compact_frac=COMPACT,
            march_group=st.second_march_group,
            group_bake_reso=st.group_bake_reso,
            app_bake_reso=st.app_bake_reso))
    timeit("secondary", lambda i, f=make_sec(16): f(params),
           lambda vi: float(vi[0].ravel()[0]))
    # app-stage slope: (secondary - secondary_app4) / 12 = ms per app sample
    timeit("secondary_app4", lambda i, f=make_sec(4): f(params),
           lambda vi: float(vi[0].ravel()[0]))

    # 5) primary forward only (relight branch on)
    fwd = jax.jit(lambda p, k: primary.render_rays(
        cfg, p, scene, batch["rays"], batch["light_idx"],
        n_samples=N_SAMPLES, key=k, is_train=True, is_relight=True,
        white_bg=True, app_cap=st.app_cap, march_cap=st.march_cap))
    timeit("primary_fwd", lambda i: fwd(params, jax.random.fold_in(key, i)),
           lambda r: float(r["rgb_map"].ravel()[0]))

    # 6) radiance-only forward (march+density+shading, no BRDF/normals)
    fwd_rad = jax.jit(lambda p, k: primary.render_rays(
        cfg, p, scene, batch["rays"], batch["light_idx"],
        n_samples=N_SAMPLES, key=k, is_train=True, is_relight=False,
        white_bg=True, app_cap=st.app_cap, march_cap=st.march_cap))
    timeit("prim_rad_fwd", lambda i: fwd_rad(params, jax.random.fold_in(key, i)),
           lambda r: float(r["rgb_map"].ravel()[0]))

    print("done", flush=True)


if __name__ == "__main__":
    main()
