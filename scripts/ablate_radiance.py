"""Fine-grained ablation of the radiance fwd+bwd step (137ms of the 582ms
bench step per scripts/ablate_step.py) at bench.py's exact config.

Hypothesis under test: the backward pass is dominated by the VM-plane VJP
scatter-adds (measured XLA scatter-add floor ~20M rows/s; the step issues
~2.4M density-plane + ~0.4M app-plane rows).

Phases (scalar-synced):
  rad_step            full radiance train step (fwd+bwd+Adam) — anchor
  rad_grad_all        value_and_grad only (no optimizer update)
  rad_grad_stop_all_planes   grads with density+app planes stop_gradiented
                             (plane scatter VJPs removed from the graph)
  rad_grad_stop_density      density planes only stopped
  rad_fwd             forward only
  scatter_sol         raw .at[].add speed-of-light: 2.36M x 64-wide rows
                      into a (39601, 64) table (= the density-plane VJP shape)
  scatter_sol_sorted  same rows pre-sorted + indices_are_sorted=True
  scatter_sol_w8      scatter via 8 sequential 295k-row chunks (pipelining?)

Run detached on the TPU (CLAUDE.md: never under timeout):
  nohup python scripts/ablate_radiance.py > /tmp/ablate_rad.log 2>&1 &
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
    from tensoir_tpu.train.step import (LossWeights, StepStatic,
                                        compute_loss, make_train_step)

    platform = jax.devices()[0].platform
    B, GRID, N_SAMPLES = 4096, 200, 700
    MASK_RESO = 128
    if platform == "cpu":
        B, GRID, N_SAMPLES, MASK_RESO = 256, 48, 64, 24

    cfg = FieldConfig(density_n_comp=(16, 16, 16), app_n_comp=(48, 48, 48),
                      app_dim=27, shading_mode="MLP_Fea",
                      normals_kind="derived_plus_predicted", light_kind="sg",
                      num_sgs=128, envmap_h=16, envmap_w=32,
                      feature_c=128, step_ratio=0.5)
    aabb = np.array([[-1.5] * 3, [1.5] * 3], np.float32)
    params, scene = init_field_params(
        jax.random.PRNGKey(0), cfg, (GRID, GRID, GRID), aabb)
    for i in range(3):
        g = params[f"density_plane_{i}"]
        H, W, _ = g.shape
        yy, xx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                             indexing="ij")
        bump = np.exp(-((xx ** 2 + yy ** 2) / 0.18)).astype(np.float32)
        params[f"density_plane_{i}"] = g + 5.0 * jnp.asarray(bump)[..., None]
    scene, _ = update_alpha_mask(cfg, params, scene, (MASK_RESO,) * 3)

    st = StepStatic(n_samples=N_SAMPLES, is_relight=False, white_bg=True,
                    app_cap=32, march_cap=192, second_march_cap=32,
                    secondary_bake_reso=128)
    w = LossWeights(ortho=0.0, l1=4e-5, tv_density=0.0, tv_app=0.0,
                    lr_factor=0.999971, n_iters=80000, relight_start=10000)

    rng = np.random.default_rng(0)
    o = np.zeros((B, 3), np.float32)
    o[:, 2] = -4.0
    d = rng.normal(size=(B, 3)).astype(np.float32) * 0.15
    d[:, 2] = 1.0
    batch = {"rays": jnp.asarray(np.concatenate([o, d], -1)),
             "rgbs": jnp.full((B, 3), 0.5, jnp.float32),
             "light_idx": jnp.zeros((B,), jnp.int32)}
    key = jax.random.PRNGKey(1)
    step = jnp.asarray(0)

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

    import os
    if os.environ.get("ABLATE_SCATTER_ONLY"):
        _scatter_phases(jax, jnp, timeit, GRID, B, st)
        return

    optimizer = make_optimizer(params, 0.02, 1e-3, 0.999971)
    opt_state = optimizer.init(params)
    step_fn = make_train_step(cfg, optimizer, st, w, donate=False)

    def run_step(i):
        return step_fn(params, opt_state, scene, batch,
                       jax.random.fold_in(key, i), step)

    timeit("rad_step", run_step, lambda r: float(r[2]["total_loss"]))

    def loss_of(p, i):
        return compute_loss(cfg, p, scene, batch,
                            jax.random.fold_in(key, i), step, st, w)[0]

    grad_all = jax.jit(lambda p, i: jax.grad(loss_of)(p, i))
    timeit("rad_grad_all", lambda i: grad_all(params, jnp.asarray(i)),
           lambda g: float(g["density_plane_0"].ravel()[0]))

    g_noplanes = jax.jit(lambda p, i: jax.grad(
        lambda q, j: loss_of({**q, **{k: jax.lax.stop_gradient(q[k])
                                      for k in q if "plane" in k}}, j))(p, i))
    timeit("rad_grad_stop_all_planes",
           lambda i: g_noplanes(params, jnp.asarray(i)),
           lambda g: float(g["density_line_0"].ravel()[0]))

    g_nodens = jax.jit(lambda p, i: jax.grad(
        lambda q, j: loss_of({**q, **{k: jax.lax.stop_gradient(q[k])
                                      for k in q if "density_plane" in k}},
                             j))(p, i))
    timeit("rad_grad_stop_density",
           lambda i: g_nodens(params, jnp.asarray(i)),
           lambda g: float(g["app_plane_0"].ravel()[0]))

    fwd = jax.jit(loss_of)
    timeit("rad_fwd", lambda i: fwd(params, jnp.asarray(i)), float)

    _scatter_phases(jax, jnp, timeit, GRID, B, st)


def _scatter_phases(jax, jnp, timeit, GRID, B, st):
    import json
    # scatter speed-of-light at the density-plane VJP shape. NOTE: idx/vals
    # must be jit ARGUMENTS — closure-captured they become HLO constants and
    # blow past the axon remote-compile request size limit (HTTP 413).
    platform = jax.devices()[0].platform
    R, C = (GRID - 1) * (GRID - 1), 64
    N_ROWS = 3 * B * st.march_cap if platform != "cpu" else 3 * B * 16
    idx = jax.random.randint(jax.random.PRNGKey(7), (N_ROWS,), 0, R,
                             dtype=jnp.int32)
    vals = jax.random.normal(jax.random.PRNGKey(8), (N_ROWS, C))

    @jax.jit
    def sc(ix, v, i):
        tab = jnp.zeros((R, C), jnp.float32)
        return tab.at[jnp.minimum(ix + i, R - 1)].add(v).sum()

    ms = timeit("scatter_sol", lambda i: sc(idx, vals, jnp.int32(i)), float)
    print(json.dumps({"phase": "scatter_rows_per_s",
                      "value": round(N_ROWS / (ms / 1e3))}), flush=True)

    idx_s = jnp.sort(idx)

    @jax.jit
    def scs(ix, v, i):
        tab = jnp.zeros((R, C), jnp.float32)
        v = jnp.roll(v, i, axis=0)  # i-dependence prevents constant folding
        return tab.at[ix].add(v, indices_are_sorted=True,
                              unique_indices=False).sum()
    timeit("scatter_sol_sorted", lambda i: scs(idx_s, vals, jnp.int32(i)),
           float)

    # narrow-row scatter (is the cost per row or per row-byte?)
    @jax.jit
    def sc1(ix, v, i):
        tab = jnp.zeros((R, 8), jnp.float32)
        return tab.at[jnp.minimum(ix + i, R - 1)].add(v).sum()
    timeit("scatter_sol_w8", lambda i: sc1(idx, vals[:, :8], jnp.int32(i)),
           float)
    print("done", flush=True)


if __name__ == "__main__":
    main()
