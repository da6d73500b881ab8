"""Jitted training step: render -> losses -> grads -> Adam update.

Loss assembly matches train_tensoIR.py:262-312; the step index is a traced
argument so one compiled step function serves an entire training phase
(recompiles only at the coarse-to-fine lifecycle events, SURVEY.md §3.4).

Multi-chip: jit with the ray batch sharded over the mesh 'data' axis and
params/scene replicated. The loss is a mean over the global batch, so XLA's
SPMD partitioner emits the gradient psum over ICI automatically.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tensoir_tpu.models import field as F
from tensoir_tpu.render.train_render import render_train_batch
from tensoir_tpu.train import losses as L


@dataclass(frozen=True)
class LossWeights:
    """Static loss configuration for one training phase
    (weights from opt.py / config files; schedule train_tensoIR.py:287-312)."""
    ortho: float = 0.0
    l1: float = 0.0
    tv_density: float = 0.0
    tv_app: float = 0.0
    rgb_brdf: float = 0.1
    normals_diff: float = 0.0002
    normals_ori: float = 0.001
    albedo_sm: float = 0.0002
    rough_sm: float = 0.0002
    normals_enhance_ratio: float = 1.0
    brdf_enhance_ratio: float = 1.0
    n_iters: int = 80000
    relight_start: int = 10000
    lr_factor: float = 1.0  # per-step TV decay (train_tensoIR.py:277,282)
    # Linear ramp of the BRDF-loss weight over the first N relight iters
    # (0 = off, reference-exact constant weight). Beyond-reference knob:
    # the reference starts relight at iter 10k/80k on a HARD density
    # (train_tensoIR.py:385-422); compressed schedules start it on a soft
    # one, where full reference pressure (every masked ray relit,
    # loss = full-batch mean, train_tensoIR_rotated_multi_lights.py:305)
    # can flip rotation-tied multilight normals into the inverted basin
    # (BASELINE.md r4 matrix reading). The ramp is traced from the step
    # index — no extra recompile — and reaches the exact reference weight
    # at relight_start + warmup.
    rgb_brdf_warmup_iters: int = 0


@dataclass(frozen=True)
class StepStatic:
    """Static knobs of the jitted step."""
    n_samples: int
    is_relight: bool
    white_bg: bool
    sample_method: str = "stratified_sampling"
    app_cap: int = 32
    march_cap: int = 0          # primary occupancy-culled marching (0=dense)
    second_march_cap: int = 32  # secondary-ray occupancy cull
    secondary_use_baked: bool = True  # baked sigma grid for visibility
    secondary_bake_reso: int = 0      # coarse-bake cap (0 = full reso)
    second_window: int = 0            # interval-culled secondary march
    second_window_back: int = 0       # back-anchored part of the window
    second_prepass_n: int = 18        # coarse-occupancy prepass samples
    coarse_dilate: int = 2            # coarse-occupancy dilation (cells)
    march_select: str = "scatter"     # primary occupied-sample selection
    march_group: int = 0              # grouped primary march (0=off, 2/4)
    secondary_compact_frac: float = 0.0  # hemisphere-pair compaction
    second_march_group: int = 0       # grouped fine march (0=off, 2/4)
    group_bake_reso: int = 0          # 27-pack bake reso (0 = bake_reso)
    app_bake_reso: int = 0            # baked secondary app feature (0=off)
    secondary_app_hoist: bool = False  # global (cross-tile) app stage
    second_app_cap: int = 16          # app samples per selected pair (k)
    app_pair_frac: float = 0.0        # per-tile app pair cap override
    secondary_stats: bool = False     # cap-occupancy/overflow telemetry
    # exact-phase probe of the weight mass the CONFIGURED window would
    # truncate (fast_march_start auto mode; secondary.py probe docstring)
    second_window_probe: int = 0
    second_window_probe_back: int = 0
    ndc_ray: bool = False             # forward-facing NDC marching
    relight_ray_cap: int = 1024
    second_n_sample: int = 96
    second_near: float = 0.05
    second_far: float = 1.5
    secondary_tile: int = 16384
    # disable all stochastic elements (march jitter, random bg, light-dir
    # jitter) — used for shard-invariance tests and deterministic debugging
    deterministic: bool = False


def compute_loss(cfg: F.FieldConfig, params, scene, batch, key,
                 step, st: StepStatic, w: LossWeights):
    ret = render_train_batch(
        cfg, params, scene, batch["rays"], batch["light_idx"],
        n_samples=st.n_samples, key=None if st.deterministic else key,
        is_train=not st.deterministic,
        is_relight=st.is_relight, white_bg=st.white_bg,
        sample_method=st.sample_method, app_cap=st.app_cap,
        march_cap=st.march_cap, march_select=st.march_select,
        march_group=st.march_group,
        second_march_cap=st.second_march_cap,
        secondary_use_baked=st.secondary_use_baked,
        secondary_bake_reso=st.secondary_bake_reso,
        second_window=st.second_window,
        second_window_back=st.second_window_back,
        second_prepass_n=st.second_prepass_n,
        coarse_dilate=st.coarse_dilate,
        secondary_compact_frac=st.secondary_compact_frac,
        second_march_group=st.second_march_group,
        group_bake_reso=st.group_bake_reso,
        app_bake_reso=st.app_bake_reso,
        secondary_app_hoist=st.secondary_app_hoist,
        second_app_cap=st.second_app_cap,
        app_pair_frac=st.app_pair_frac,
        secondary_stats=st.secondary_stats,
        second_window_probe=st.second_window_probe,
        second_window_probe_back=st.second_window_probe_back,
        ndc_ray=st.ndc_ray,
        relight_ray_cap=st.relight_ray_cap,
        second_n_sample=st.second_n_sample, second_near=st.second_near,
        second_far=st.second_far, secondary_tile=st.secondary_tile,
        normal_gt=batch.get("normal_gt"))

    rgb_gt = batch["rgbs"]
    loss_rgb = jnp.mean((ret["rgb_map"] - rgb_gt) ** 2)
    total = loss_rgb
    metrics = {"loss_rgb": loss_rgb}

    stepf = step.astype(jnp.float32)
    if w.ortho > 0:
        lo = L.ortho_loss(params, cfg)
        total = total + w.ortho * lo
        metrics["loss_ortho"] = lo
    if w.l1 > 0:
        l1 = L.density_l1(params, cfg)
        total = total + w.l1 * l1
        metrics["loss_l1"] = l1
    # TV weights decay multiplicatively every step they are applied
    # (train_tensoIR.py:276-285)
    if w.tv_density > 0:
        tvw = w.tv_density * (w.lr_factor ** (stepf + 1.0))
        tv = L.tv_loss_density(params, cfg) * tvw
        total = total + tv
        metrics["loss_tv_density"] = tv
    if w.tv_app > 0:
        tvw = w.tv_app * (w.lr_factor ** (stepf + 1.0))
        tv = L.tv_loss_app(params, cfg) * tvw
        total = total + tv
        metrics["loss_tv_app"] = tv

    if st.is_relight:
        # masked mean: surface rays dropped by relight_ray_cap are excluded
        # (the reference relights every acc_mask ray, renderer.py:86-107)
        rmask = ret["relight_computed_mask"][:, None].astype(rgb_gt.dtype)
        loss_brdf = (jnp.sum(rmask * (ret["rgb_with_brdf_map"] - rgb_gt) ** 2)
                     / jnp.maximum(jnp.sum(rmask) * 3.0, 1.0))
        brdf_w = w.rgb_brdf
        if w.rgb_brdf_warmup_iters > 0:
            # traced linear ramp (see LossWeights docstring); clip keeps it
            # exact-reference from relight_start + warmup onward
            brdf_w = brdf_w * jnp.clip(
                (stepf - w.relight_start + 1.0) / w.rgb_brdf_warmup_iters,
                0.0, 1.0)
        total = total + loss_brdf * brdf_w
        metrics["loss_rgb_brdf"] = loss_brdf

        # exponential enhancement (train_tensoIR.py:291-292)
        prog = (stepf - w.relight_start) / max(w.n_iters - w.relight_start, 1)
        nw = w.normals_enhance_ratio ** prog
        bw = w.brdf_enhance_ratio ** prog
        if w.normals_diff > 0:
            nd = nw * w.normals_diff * jnp.mean(ret["normals_diff_map"])
            total = total + nd
            metrics["loss_normals_diff"] = nd
        if w.normals_ori > 0:
            no = nw * w.normals_ori * jnp.mean(
                ret["normals_orientation_loss_map"])
            total = total + no
            metrics["loss_normals_ori"] = no
        if w.rough_sm > 0:
            rs = bw * w.rough_sm * ret["roughness_smoothness_loss"]
            total = total + rs
            metrics["loss_rough_sm"] = rs
        if w.albedo_sm > 0:
            asm = bw * w.albedo_sm * ret["albedo_smoothness_loss"]
            total = total + asm
            metrics["loss_albedo_sm"] = asm

    metrics["total_loss"] = total
    metrics["psnr"] = -10.0 * jnp.log(loss_rgb) / jnp.log(10.0)
    if "march_overflow_frac" in ret:
        # fraction of rays whose occupied sample (or group) count exceeded
        # march_cap — the exactness monitor for the culled/grouped primary
        # march (grouped selection can keep up to g x fewer occupied samples
        # on overflow; see render_rays / ADVICE r2)
        metrics["march_overflow_frac"] = ret["march_overflow_frac"]
    for sk in ("sec/window_resid_rel",
               "sec/app_pair_overflow_frac", "sec/app_pair_occupancy",
               "sec/app_slot_occupancy", "sec/compact_overflow_frac",
               "sec/app_slot_demand_max", "sec/app_slot_overflow_pairs"):
        if sk in ret:
            metrics[sk] = ret[sk]
    if "acc_mask" in ret:
        # how many rays the reference would relight (renderer.py:86-107);
        # bench.py counts visibility rays as min(this, relight_ray_cap)*dirs
        metrics["n_acc_masked"] = jnp.sum(
            ret["acc_mask"].astype(jnp.float32))
    return total, metrics


def make_train_step(cfg: F.FieldConfig, optimizer, st: StepStatic,
                    w: LossWeights, mesh=None, donate: bool = True):
    """Build the jitted train step.

    Signature: step_fn(params, opt_state, scene, batch, key, step)
      -> (params, opt_state, metrics)

    With `mesh`, the step runs under shard_map over the 'data' axis: the ray
    batch (and therefore every secondary visibility batch derived from it) is
    sharded, params/scene/optimizer state are replicated, and gradients are
    all-reduced with a pmean over ICI before the (identical, replicated)
    Adam update — the TPU-native replacement for DDP.
    """

    def loss_wrapper(params, scene, batch, key, step):
        return compute_loss(cfg, params, scene, batch, key, step, st, w)

    def inner(params, opt_state, scene, batch, key, step):
        if mesh is not None:
            # decorrelate per-shard jitter/light-sample randomness
            key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        (_, metrics), grads = jax.value_and_grad(
            loss_wrapper, has_aux=True)(params, scene, batch, key, step)
        if mesh is not None:
            grads = jax.lax.pmean(grads, "data")
            metrics = jax.lax.pmean(metrics, "data")
            # count-like metrics are per-shard SUMS — psum, not pmean
            # (pmean would report global_count / n_devices; the honest
            # visibility-ray formula min(n_acc_masked, cap) needs the
            # global count)
            if "n_acc_masked" in metrics:
                # psum(1) folds to the static axis size
                metrics["n_acc_masked"] = (
                    metrics["n_acc_masked"] * jax.lax.psum(1, "data"))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, metrics

    donate_args = (0, 1) if donate else ()
    if mesh is None:
        return partial(jax.jit, donate_argnums=donate_args)(inner)

    from jax.sharding import PartitionSpec as P

    mapped = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("data"), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return partial(jax.jit, donate_argnums=donate_args)(mapped)
