"""Multi-host training-step worker: one process of a jax.distributed run.

Launched N times (once per process) by tests/test_multihost.py on localhost
CPU — the real DCN code path (jax.distributed.initialize, global mesh across
processes, make_array_from_process_local_data batches, cross-process grad
pmean) without TPU pod hardware. The same script doubles as the entry for
actual multi-host runs (point --coordinator at host 0).

Reference counterpart: the vestigial DDP init in train_tensoIR.py:21-27 —
here the collective actually runs (SURVEY.md §2.8).

Each process writes {"checksums": {...}, "loss": ..., "elapsed_s": ...} to
--out; checksums are identical across any process layout with the same
global device count (asserted by the test: 1x2 vs 2x1 devices).
"""
from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-procs", type=int, required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=64)  # global
    args = ap.parse_args()

    from tensoir_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    import jax
    from tensoir_tpu.parallel import multihost
    multihost.initialize(coordinator_address=args.coordinator,
                         num_processes=args.num_procs,
                         process_id=args.pid)
    assert jax.process_count() == args.num_procs

    import jax.numpy as jnp
    import numpy as np
    from tensoir_tpu.models.field import FieldConfig, init_field_params
    from tensoir_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from tensoir_tpu.train.optim import make_optimizer
    from tensoir_tpu.train.step import (LossWeights, StepStatic,
                                        make_train_step)

    cfg = FieldConfig(density_n_comp=(4, 4, 4), app_n_comp=(4, 4, 4),
                      app_dim=6, shading_mode="MLP_Fea",
                      normals_kind="derived_plus_predicted",
                      light_kind="sg", num_sgs=8, envmap_h=4, envmap_w=8,
                      feature_c=16)
    aabb = np.array([[-1.5] * 3, [1.5] * 3], np.float32)
    params, scene = init_field_params(
        jax.random.PRNGKey(0), cfg, (24, 24, 24), aabb)

    mesh = make_mesh()
    params = replicate(mesh, params)
    scene = replicate(mesh, scene)

    optimizer = make_optimizer(params, 0.02, 1e-3, 0.999)
    opt_state = replicate(mesh, optimizer.init(params))

    st = StepStatic(n_samples=32, is_relight=True, white_bg=True,
                    app_cap=8, relight_ray_cap=16, march_cap=16,
                    second_march_cap=8, secondary_bake_reso=16,
                    second_n_sample=8, secondary_tile=256,
                    deterministic=True)
    w = LossWeights(ortho=0.0, l1=4e-5, tv_density=0.0, tv_app=0.0,
                    lr_factor=0.999, n_iters=100, relight_start=0)
    step_fn = make_train_step(cfg, optimizer, st, w, mesh=mesh, donate=False)

    # deterministic global batch, host-local slice in process order — every
    # layout reconstructs the same global array
    rng = np.random.default_rng(0)
    B = args.batch
    local = B // args.num_procs
    lo = args.pid * local
    o = np.zeros((B, 3), np.float32)
    o[:, 2] = -3.0
    d = rng.normal(size=(B, 3)).astype(np.float32) * 0.1
    d[:, 2] = 1.0
    batch_g = {"rays": np.concatenate([o, d], -1),
               "rgbs": np.full((B, 3), 0.5, np.float32),
               "light_idx": np.zeros((B,), np.int32)}
    batch = shard_batch(mesh, {k: v[lo:lo + local]
                               for k, v in batch_g.items()})

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(args.steps):
        params, opt_state, metrics = step_fn(
            params, opt_state, scene, batch, key, jnp.asarray(i))
    loss = float(metrics["total_loss"])
    elapsed = time.time() - t0

    # exercise the artifact-write barrier (reference `synchronize`,
    # utils.py:231-242): every process must pass it without deadlock
    multihost.barrier("worker_done")

    leaves, _ = jax.tree.flatten_with_path(params)
    checksums = {jax.tree_util.keystr(path): float(jnp.sum(jnp.abs(leaf)))
                 for path, leaf in leaves}
    with open(args.out, "w") as f:
        json.dump({"pid": args.pid, "num_procs": args.num_procs,
                   "process_count": jax.process_count(),
                   "device_count": jax.device_count(),
                   "loss": loss, "elapsed_s": elapsed,
                   "checksums": checksums}, f)
    print(f"proc {args.pid}/{args.num_procs} done loss={loss:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
