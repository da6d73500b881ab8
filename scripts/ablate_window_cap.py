"""A/B harness for the canonical bench step (scalar-synced).

The run list evolves with the round's open question — earlier revisions
swept second_window and relight_ray_cap (those results are recorded in
BASELINE.md's round-2 A/B tables); the current list A/Bs the primary
sample-selection kernel, the coarse-occupancy dilate/prepass pairing, and
the visibility-bake resolution against the canonical config. Edit run()
calls at the bottom to measure a new variant.

Run detached on the TPU (CLAUDE.md: never under timeout):
  nohup python scripts/ablate_window_cap.py > /tmp/ablate_wc.log 2>&1 &
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tensoir_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    from tensoir_tpu.utils.compile_cache import enable as _cc
    _cc()

    from tensoir_tpu.models.field import FieldConfig, init_field_params
    from tensoir_tpu.models.lifecycle import update_alpha_mask
    from tensoir_tpu.train.optim import make_optimizer
    from tensoir_tpu.train.step import LossWeights, StepStatic, make_train_step

    platform = jax.devices()[0].platform
    B, GRID, N_SAMPLES = 4096, 200, 700
    ENV_H, ENV_W, SECOND_N, TILE = 16, 32, 96, 32768
    MASK_RESO = 128
    if platform == "cpu":
        B, GRID, N_SAMPLES = 256, 48, 64
        ENV_H, ENV_W, SECOND_N, TILE = 4, 8, 16, 1024
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
    scene, _ = update_alpha_mask(cfg, params, scene, (MASK_RESO,) * 3)

    optimizer = make_optimizer(params, 0.02, 1e-3, 0.999971)
    opt_state = optimizer.init(params)
    w = LossWeights(ortho=0.0, l1=4e-5, tv_density=0.0, tv_app=0.0,
                    lr_factor=0.999971, n_iters=80000, relight_start=10000)

    batch = {"rays": jnp.asarray(bench_rays(B)),
             "rgbs": jnp.full((B, 3), 0.5, jnp.float32),
             "light_idx": jnp.zeros((B,), jnp.int32)}
    key = jax.random.PRNGKey(1)
    n_iters = 8 if platform != "cpu" else 2

    def run(name, window, cap, compact=0.0, wb=0, prepass=18,
            march_select="topk", dilate=2, bake=128):
        if platform == "cpu":
            window = min(window, 12)
            wb = min(wb, 4)
            cap = min(cap, 64)
        st = StepStatic(n_samples=N_SAMPLES, is_relight=True, white_bg=True,
                        app_cap=32, relight_ray_cap=cap,
                        march_cap=192, march_select=march_select,
                        second_march_cap=32,
                        secondary_use_baked=True, secondary_bake_reso=bake,
                        second_window=window, second_window_back=wb,
                        second_prepass_n=prepass, coarse_dilate=dilate,
                        secondary_compact_frac=compact,
                        second_n_sample=SECOND_N, secondary_tile=TILE)
        step_fn = make_train_step(cfg, optimizer, st, w, donate=False)
        m = step_fn(params, opt_state, scene, batch, key, jnp.asarray(0))[2]
        loss0 = float(m["total_loss"])
        t0 = time.perf_counter()
        for i in range(n_iters):
            m = step_fn(params, opt_state, scene, batch,
                        jax.random.fold_in(key, i + 1), jnp.asarray(i + 1))[2]
        _ = float(m["total_loss"])
        ms = (time.perf_counter() - t0) / n_iters * 1e3
        n_masked = int(m["n_acc_masked"])
        rays = B + min(n_masked, cap) * ENV_H * ENV_W
        print(json.dumps({"phase": name, "ms": round(ms, 1),
                          "rays_per_s": round(rays / (ms / 1e3)),
                          "n_acc_masked": n_masked,
                          "loss0": round(loss0, 5)}), flush=True)

    run("canonical", 48, 4096, 0.5625, wb=16)      # w48b16 pre18 d2 bake128
    run("scatter_sel", 48, 4096, 0.5625, wb=16, march_select="scatter")
    run("dilate3_pre12", 48, 4096, 0.5625, wb=16, prepass=12, dilate=3)
    run("bake96", 48, 4096, 0.5625, wb=16, bake=96)
    run("all3", 48, 4096, 0.5625, wb=16, prepass=12, dilate=3, bake=96,
        march_select="scatter")
    print("done", flush=True)


if __name__ == "__main__":
    main()
