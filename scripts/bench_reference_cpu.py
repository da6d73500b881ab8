"""Measure the LIVE PyTorch reference's training-step rate vs ours on the
SAME hardware (CPU) at a matched configuration.

Round-1 verdict: bench.py's 1.5M rays/s denominator is an estimate derived
from the paper's training time; firm it up by timing the actual reference
implementation. No GPU exists in this image, so the defensible comparison
is same-chip CPU vs CPU:

- reference step: TensorVMSplit forward (is_relight=True) via
  Renderer_TensoIR_train + the train_tensoIR.py:262-318 loss stack +
  backward + Adam step — the real code path, loaded from /root/reference.
- our step: make_train_step (jitted, CPU backend) at the same model sizes,
  batch, light-dir count and secondary sample count, with
  relight_ray_cap matched to the reference's measured acc-mask count.

Both models share identical field parameters (same copy path as
tests/test_reference_parity.py::_make_pair) and a seeded density blob so
the acc mask is non-trivial.

Run:  TENSOIR_PLATFORM=cpu python scripts/bench_reference_cpu.py
Prints one JSON line per framework + the ratio; results recorded in
BASELINE.md ("Baseline denominator").
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

REF = "/root/reference"

# matched configuration (bench.py feature sizes, reduced grid/batch for CPU)
B = 1024
GRID = (128, 128, 128)
N_SAMPLES = 448
ENV_H, ENV_W = 16, 32
SECOND_N = 96
D_COMP = (16, 16, 16)
A_COMP = (48, 48, 48)
APP_DIM = 27
NUM_SGS = 128
FEATURE_C = 128
AABB = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)


class _Args:
    second_nSample = SECOND_N
    second_near = 0.05
    second_far = 1.5


def _bump_params(params):
    # the SAME solid blob as bench.py: both frameworks then acc-mask (and
    # relight) nearly the whole batch from step 0, so the ray counting is
    # matched work, not a training-dynamics artifact
    from tensoir_tpu.utils.bench_scene import seed_solid_blob
    return seed_solid_blob(params)


def build_pair():
    import jax
    import torch
    from tests.test_reference_parity import _install_stubs
    _install_stubs()
    # renderer.py -> utils.py imports torchvision (only for ToTensor);
    # absent in this image — stub it
    import types
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.__path__ = []        # mark as package so submodule imports work
        tvt = types.ModuleType("torchvision.transforms")
        tvt.ToTensor = object
        tvu = types.ModuleType("torchvision.utils")
        tvu.save_image = None
        tvu.make_grid = None
        tv.transforms = tvt
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
        sys.modules["torchvision.utils"] = tvu
    if "plyfile" not in sys.modules:
        ply = types.ModuleType("plyfile")
        ply.PlyData = object
        ply.PlyElement = object
        sys.modules["plyfile"] = ply
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        skm = types.ModuleType("skimage.measure")
        skm.marching_cubes = None
        sk.measure = skm
        sys.modules["skimage"] = sk
        sys.modules["skimage.measure"] = skm
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.tensoRF_rotated_lights import TensorVMSplit
    import models.relight_utils as RU
    _orig = RU.sample_ray_equally

    def _cpu_sre(*a, **k):
        k["device"] = "cpu"
        return _orig(*a, **k)
    RU.sample_ray_equally = _cpu_sre

    from tensoir_tpu.models.field import FieldConfig, init_field_params

    cfg = FieldConfig(
        density_n_comp=D_COMP, app_n_comp=A_COMP, app_dim=APP_DIM,
        shading_mode="MLP_Fea", normals_kind="derived_plus_predicted",
        light_kind="sg", num_sgs=NUM_SGS, envmap_h=ENV_H, envmap_w=ENV_W,
        feature_c=FEATURE_C, step_ratio=0.5)
    params, scene = init_field_params(jax.random.PRNGKey(0), cfg, GRID, AABB)
    params = _bump_params(params)

    model = TensorVMSplit(
        torch.tensor(AABB), list(GRID), "cpu",
        density_n_comp=list(D_COMP), appearance_n_comp=list(A_COMP),
        app_dim=APP_DIM, shadingMode="MLP_Fea",
        normals_kind="derived_plus_predicted",
        light_rotation=["000"], light_kind="sg", numLgtSGs=NUM_SGS,
        envmap_h=ENV_H, envmap_w=ENV_W, featureC=FEATURE_C, step_ratio=0.5,
        pos_pe=2, view_pe=2, fea_pe=2, near_far=[2.0, 6.0])

    with torch.no_grad():
        for i in range(3):
            model.density_plane[i].copy_(torch.from_numpy(
                np.asarray(params[f"density_plane_{i}"])).permute(2, 0, 1)[None])
            model.density_line[i].copy_(torch.from_numpy(
                np.asarray(params[f"density_line_{i}"])).permute(1, 0)[None, :, :, None])
            model.app_plane[i].copy_(torch.from_numpy(
                np.asarray(params[f"app_plane_{i}"])).permute(2, 0, 1)[None])
            model.app_line[i].copy_(torch.from_numpy(
                np.asarray(params[f"app_line_{i}"])).permute(1, 0)[None, :, :, None])
        model.basis_mat.weight.copy_(
            torch.from_numpy(np.asarray(params["basis_mat"])).T)
        model.light_line.weight.copy_(
            torch.from_numpy(np.asarray(params["light_line"])))
    return cfg, params, scene, model


def make_batch():
    from tensoir_tpu.utils.bench_scene import bench_rays
    return bench_rays(B)


def bench_reference(model, rays_np, n_iters=3):
    import torch
    from renderer import Renderer_TensoIR_train
    torch.set_num_threads(torch.get_num_threads())

    grad_vars = model.get_optparam_groups(0.02, 1e-3)
    optimizer = torch.optim.Adam(grad_vars, betas=(0.9, 0.99))
    rays = torch.from_numpy(rays_np)
    rgb_train = torch.full((B, 3), 0.5)
    light_idx = torch.zeros(B, 1, dtype=torch.int64)
    args = _Args()
    args.relight_chunk_size = 15000
    args.light_sample_train = "fixed_envirmap"

    masked_counts = []

    def step():
        ret_kw = Renderer_TensoIR_train(
            rays=rays, normal_gt=None, light_idx=light_idx, tensoIR=model,
            N_samples=N_SAMPLES, white_bg=True, ndc_ray=False, device="cpu",
            sample_method="fixed_envirmap", chunk_size=15000, is_train=True,
            is_relight=True, args=args)
        masked_counts.append(
            int((ret_kw["acc_map"] > 0.5).sum()))
        total = torch.mean((ret_kw["rgb_map"] - rgb_train) ** 2)
        total = total + 0.2 * torch.mean(
            (ret_kw["rgb_with_brdf_map"] - rgb_train) ** 2)
        total = total + 4e-5 * model.density_L1()
        total = total + 4e-3 * ret_kw["normals_diff_map"].mean()
        total = total + 1e-3 * ret_kw["normals_orientation_loss_map"].mean()
        total = total + 2e-3 * ret_kw["roughness_smoothness_loss"]
        total = total + 2e-3 * ret_kw["albedo_smoothness_loss"]
        optimizer.zero_grad()
        total.backward()
        optimizer.step()
        return float(total)

    step()  # warmup
    masked_counts.clear()   # count only the timed steps (ours does the same)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        step()
    ms = (time.perf_counter() - t0) / n_iters * 1e3
    masked = int(np.mean(masked_counts))
    rays_per_step = B + masked * ENV_H * ENV_W
    out = {"framework": "reference_torch_cpu", "ms": round(ms, 1),
           "masked_rays": masked,
           "rays_per_s": round(rays_per_step / (ms / 1e3))}
    print(json.dumps(out), flush=True)
    return out


def bench_ours(cfg, params, scene, rays_np, cap, n_iters=3):
    import jax
    import jax.numpy as jnp
    from tensoir_tpu.models.lifecycle import update_alpha_mask
    from tensoir_tpu.train.optim import make_optimizer
    from tensoir_tpu.train.step import (LossWeights, StepStatic,
                                        make_train_step)

    scene, _ = update_alpha_mask(cfg, params, scene, (64, 64, 64))
    optimizer = make_optimizer(params, 0.02, 1e-3, 0.999971)
    opt_state = optimizer.init(params)
    st = StepStatic(n_samples=N_SAMPLES, is_relight=True, white_bg=True,
                    app_cap=32, relight_ray_cap=cap,
                    march_cap=192, second_march_cap=32,
                    secondary_use_baked=True, secondary_bake_reso=128,
                    second_n_sample=SECOND_N, secondary_tile=32768)
    w = LossWeights(ortho=0.0, l1=4e-5, tv_density=0.0, tv_app=0.0,
                    lr_factor=0.999971, n_iters=80000, relight_start=0)
    step_fn = make_train_step(cfg, optimizer, st, w, donate=False)
    batch = {"rays": jnp.asarray(rays_np),
             "rgbs": jnp.full((B, 3), 0.5, jnp.float32),
             "light_idx": jnp.zeros((B,), jnp.int32)}
    key = jax.random.PRNGKey(1)

    # carry the optimizer state through iterations exactly like the
    # reference loop does — both sides' acc-mask counts then evolve under
    # the same early-training dynamics (Adam at lr 0.02 inflates the blob
    # density within a few steps; re-rendering the frozen init instead
    # reports a near-empty acc mask and voids the comparison)
    params, opt_state, m = step_fn(params, opt_state, scene, batch, key,
                                   jnp.asarray(0))
    _ = float(m["total_loss"])      # warmup+compile
    masked_counts = []
    t0 = time.perf_counter()
    for i in range(n_iters):
        params, opt_state, m = step_fn(params, opt_state, scene, batch,
                                       jax.random.fold_in(key, i + 1),
                                       jnp.asarray(i + 1))
        masked_counts.append(m["n_acc_masked"])
    masked_counts = [int(c) for c in masked_counts]  # sync AFTER the loop
    ms = (time.perf_counter() - t0) / n_iters * 1e3
    # count only REAL visibility rays (rays our step actually acc-masked,
    # same rule as bench.py) — crediting the pow2-rounded cap would bias
    # the same-hardware comparison in our favor
    n_masked = int(np.mean(masked_counts))
    rays_per_step = B + min(n_masked, cap) * ENV_H * ENV_W
    out = {"framework": "tensoir_tpu_jax_cpu", "ms": round(ms, 1),
           "relight_ray_cap": cap, "n_acc_masked": n_masked,
           "rays_per_s": round(rays_per_step / (ms / 1e3))}
    print(json.dumps(out), flush=True)
    return out


def main():
    from tensoir_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    import jax
    assert jax.devices()[0].platform == "cpu", \
        "run with TENSOIR_PLATFORM=cpu (CPU-vs-CPU comparison)"

    cfg, params, scene, model = build_pair()
    rays_np = make_batch()
    ref = bench_reference(model, rays_np)
    # cap matched to the reference's measured acc-mask count (pow2 round-up)
    cap = max(64, 1 << int(np.ceil(np.log2(max(1, ref["masked_rays"])))))
    ours = bench_ours(cfg, params, scene, rays_np, cap)
    print(json.dumps({
        "config": {"B": B, "grid": GRID[0], "n_samples": N_SAMPLES,
                   "env_dirs": ENV_H * ENV_W, "second_n": SECOND_N},
        "speedup_ours_vs_reference_same_cpu":
            round(ours["rays_per_s"] / ref["rays_per_s"], 3)}), flush=True)


if __name__ == "__main__":
    main()
