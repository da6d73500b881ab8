"""Capture a jax.profiler trace of the canonical train step on-chip.

Round-3 phase profile found the secondary APP stage costs 21.4 ms per app
sample (~100x its gather+MLP compute, BASELINE.md) — this trace is the
ground truth for WHERE that time goes (per-kernel timeline, viewable in
XProf/TensorBoard). Writes to log/trace_r3/ (or argv[1]).

  nohup python scripts/trace_step.py > /tmp/trace_step.log 2>&1 &
"""
from __future__ import annotations

import sys


def main():
    import jax
    import jax.numpy as jnp
    from tensoir_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    from tensoir_tpu.utils.compile_cache import enable as _cc
    _cc()
    import numpy as np

    from tensoir_tpu.models.field import FieldConfig, init_field_params
    from tensoir_tpu.models.lifecycle import update_alpha_mask
    from tensoir_tpu.profiling import profile_trace
    from tensoir_tpu.train.optim import make_optimizer
    from tensoir_tpu.train.step import LossWeights, StepStatic, make_train_step
    from tensoir_tpu.utils.bench_scene import bench_rays, seed_solid_blob

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "./log/trace_r3"
    hoist = len(sys.argv) > 2 and sys.argv[2] == "hoist"

    platform = jax.devices()[0].platform
    B, GRID, N_SAMPLES, CAP = 4096, 200, 700, 4096
    if platform == "cpu":
        B, GRID, N_SAMPLES, CAP = 256, 48, 64, 256

    cfg = FieldConfig(density_n_comp=(16, 16, 16), app_n_comp=(48, 48, 48),
                      app_dim=27, shading_mode="MLP_Fea",
                      normals_kind="derived_plus_predicted", light_kind="sg",
                      num_sgs=128, envmap_h=16, envmap_w=32,
                      feature_c=128, step_ratio=0.5)
    aabb = np.array([[-1.5] * 3, [1.5] * 3], np.float32)
    params, scene = init_field_params(
        jax.random.PRNGKey(0), cfg, (GRID,) * 3, aabb)
    params = seed_solid_blob(params)
    scene, _ = update_alpha_mask(
        cfg, params, scene, (128 if platform != "cpu" else 24,) * 3)
    optimizer = make_optimizer(params, 0.02, 1e-3, 0.999971)
    opt_state = optimizer.init(params)
    st = StepStatic(n_samples=N_SAMPLES, is_relight=True, white_bg=True,
                    app_cap=32, relight_ray_cap=CAP, march_cap=192,
                    second_march_cap=32, secondary_use_baked=True,
                    secondary_bake_reso=128, second_window=48,
                    second_window_back=16, second_prepass_n=12,
                    coarse_dilate=3, secondary_compact_frac=0.5625,
                    app_bake_reso=64, secondary_app_hoist=hoist,
                    second_n_sample=96, secondary_tile=32768)
    w = LossWeights(l1=4e-5, lr_factor=0.999971, n_iters=80000,
                    relight_start=10000)
    step_fn = make_train_step(cfg, optimizer, st, w, donate=False)
    batch = {"rays": jnp.asarray(bench_rays(B)),
             "rgbs": jnp.full((B, 3), 0.5, jnp.float32),
             "light_idx": jnp.zeros((B,), jnp.int32)}
    key = jax.random.PRNGKey(1)

    m = step_fn(params, opt_state, scene, batch, key, jnp.asarray(0))[2]
    float(m["total_loss"])  # compile + warm

    with profile_trace(out_dir):
        for i in range(3):
            m = step_fn(params, opt_state, scene, batch,
                        jax.random.fold_in(key, i + 1), jnp.asarray(i + 1))[2]
        float(m["total_loss"])
    print(f"trace written to {out_dir} (hoist={hoist})")


if __name__ == "__main__":
    main()
