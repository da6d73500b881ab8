"""Full training driver: the `reconstruction()` equivalent
(train_tensoIR.py:110-424) with the coarse-to-fine phase schedule.

One parameterized loop replaces the reference's four near-identical driver
scripts (SURVEY.md §2.7); the setting (single-light / rotated multi-light /
general multi-light / simple) is entirely in the config.

Phase schedule (train_tensoIR.py:385-422):
  * at update_AlphaMask_list[0]: updateAlphaMask -> shrink -> L1 switch ->
    relight branch ON -> TV weights zeroed -> (usually coincides with the
    first upsample).
  * at update_AlphaMask_list[1]: re-filter rays with the shrunk bbox.
  * later update_AlphaMask_list entries: mask refresh only.
  * at each upsamp_list entry: factor upsample + fresh Adam + LR reset.
Each event changes shapes -> the jitted step recompiles (expected; ~6 events
over a run).
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tensoir_tpu.config import TensoIRConfig
from tensoir_tpu.models.field import FieldConfig, init_field_params, grid_size_of
from tensoir_tpu.models import field as F
from tensoir_tpu.models import lifecycle as LC
from tensoir_tpu.parallel import multihost
from tensoir_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from tensoir_tpu.profiling import MetricsLogger, RayThroughputMeter
from tensoir_tpu.train.optim import make_optimizer, decay_factor
from tensoir_tpu.train.step import LossWeights, StepStatic, make_train_step
from tensoir_tpu.utils.ckpt import save_checkpoint


def write_config_provenance(cfg: TensoIRConfig, log_dir: str) -> str:
    """Record the effective config in the log folder (the reference copies
    the args file + kwargs into logfolder/config.txt, train_tensoIR.py:156).
    Writing every resolved field also captures CLI overrides."""
    import dataclasses
    path = os.path.join(log_dir, "config.txt")
    with open(path, "w") as f:
        for fld in dataclasses.fields(cfg):
            f.write(f"{fld.name} = {getattr(cfg, fld.name)!r}\n")
    return path


def resolve_march_group(cfg: TensoIRConfig, aabb, grid_size) -> int:
    """Largest legal grouped-march factor for the live aabb, downgrading
    cfg.second_march_group 4 -> 2 -> 0 as the pair contract tightens (the
    aabb shrinks during training while the secondary march range is fixed,
    so a configured group can become illegal mid-run; see
    field.check_pair_contract). Returns 0 when no group is legal or the
    front/back windows are not group-divisible."""
    if cfg.second_march_group <= 1:
        return 0
    gx, gy, gz = grid_size
    reso = cfg.group_bake_reso or cfg.secondary_bake_reso
    nodes = [min(n, reso) if reso > 0 else n for n in (gz, gy, gx)]
    blocks = tuple(n - 2 for n in nodes)
    g = cfg.second_march_group
    kf = cfg.second_window - cfg.second_window_back
    last_err = "window not divisible by any legal group"
    while g > 1:
        if kf % g or cfg.second_window_back % g:
            g //= 2
            continue
        try:
            F.check_pair_contract(
                np.asarray(aabb), blocks + (27,),
                n_sample=cfg.second_nSample, group=g,
                vis_near=cfg.second_near, vis_far=cfg.second_far)
            break
        except ValueError as e:
            last_err = e
            g //= 2
    eff = g if g > 1 else 0
    if eff != cfg.second_march_group:
        print(f"[loop] grouped secondary march downgraded "
              f"{cfg.second_march_group} -> {eff} for this phase: "
              f"{last_err}", flush=True)
    return eff


def resolve_primary_march_group(cfg: TensoIRConfig, aabb, grid_size,
                                step_ratio: float) -> int:
    """Largest legal grouped PRIMARY march factor for the live aabb,
    downgrading cfg.march_group 4 -> 2 -> 0. The 16-corner block contract
    needs the per-axis group span (g-1) * step / unit_axis <= 2 cells
    (primary.render_rays); step = step_ratio * mean(units), and a
    non-uniform shrink can leave units anisotropic until the next
    N_to_reso upsample — so the worst axis is re-checked here at every
    phase rebuild."""
    if cfg.march_group <= 1 or cfg.march_cap_primary <= 0:
        return 0
    aabb = np.asarray(aabb).reshape(2, 3)
    units = (aabb[1] - aabb[0]) / (np.asarray(grid_size, np.float64) - 1.0)
    span_cells = step_ratio * float(np.mean(units) / np.min(units))
    g = cfg.march_group
    last_err = ""
    while g > 1:
        if cfg.march_cap_primary % g:
            last_err = (f"march_cap_primary={cfg.march_cap_primary} not "
                        f"divisible by {g}")
            g //= 2
            continue
        worst = (g - 1) * span_cells
        if worst <= 2.0:
            break
        last_err = (f"(g-1)*step = {worst:.2f} cells on the worst axis "
                    f"(> 2, live aabb units {units})")
        g //= 2
    eff = g if g > 1 else 0
    if eff != cfg.march_group:
        print(f"[loop] grouped primary march downgraded "
              f"{cfg.march_group} -> {eff} for this phase: {last_err}",
              flush=True)
    return eff


class SimpleSampler:
    """Random-permutation batcher (train_tensoIR.py:36-48)."""

    def __init__(self, total: int, batch: int, seed: int = 0):
        if total < batch:
            raise ValueError(
                f"ray pool ({total}) smaller than the per-host batch "
                f"({batch}) — a short batch would change the jitted step's "
                f"shape (or crash shard_batch on multi-host); shrink "
                f"batch_size or loosen the ray filter")
        self.total = total
        self.batch = batch
        self.curr = total
        self.ids = None
        self.rng = np.random.default_rng(seed)

    def nextids(self) -> np.ndarray:
        self.curr += self.batch
        if self.curr + self.batch > self.total:
            self.ids = self.rng.permutation(self.total)
            self.curr = 0
        return self.ids[self.curr:self.curr + self.batch]


def field_config_from(cfg: TensoIRConfig, near_far) -> FieldConfig:
    per_light_sg = bool(cfg.light_name_list)
    rotations = tuple(int(r) for r in cfg.light_rotation)
    return FieldConfig(
        decomp={"TensorCP": "cp", "TensorVM": "vm_stacked"}.get(
            cfg.model_name, "vm"),
        density_n_comp=tuple(cfg.n_lamb_sigma),
        app_n_comp=tuple(cfg.n_lamb_sh),
        app_dim=cfg.data_dim_color,
        shading_mode=cfg.shadingMode,
        normals_kind=cfg.normals_kind,
        light_kind=cfg.light_kind,
        per_light_sg=per_light_sg,
        light_num=cfg.light_num,
        light_rotations=rotations if not per_light_sg else
        tuple(0 for _ in range(cfg.light_num)),
        num_sgs=cfg.numLgtSGs,
        envmap_h=cfg.envmap_h,
        envmap_w=cfg.envmap_w,
        fea2dense=cfg.fea2denseAct,
        density_shift=cfg.density_shift,
        distance_scale=cfg.distance_scale,
        raymarch_weight_thres=cfg.rm_weight_mask_thre,
        alpha_mask_thres=cfg.alpha_mask_thre,
        step_ratio=cfg.step_ratio,
        pos_pe=cfg.pos_pe, view_pe=cfg.view_pe, fea_pe=cfg.fea_pe,
        feature_c=cfg.featureC,
        fixed_fresnel=cfg.fixed_fresnel,
        near_far=tuple(near_far),
        compute_dtype=cfg.compute_dtype,
    )


@dataclass
class TrainResult:
    params: Dict
    scene: Dict
    fcfg: FieldConfig
    metrics_history: list
    n_samples: int


def reconstruction(
    cfg: TensoIRConfig,
    dataset,
    log_dir: Optional[str] = None,
    eval_fn: Optional[Callable] = None,
    max_iters: Optional[int] = None,
    progress_cb: Optional[Callable[[int, Dict], None]] = None,
) -> TrainResult:
    """Train a TensoIR field. `dataset` must satisfy the data contract
    (all_rays/all_rgbs/all_light_idx, scene_bbox, near_far, white_bg)."""
    n_iters = max_iters or cfg.n_iters
    aabb = np.asarray(dataset.scene_bbox, np.float32).reshape(2, 3)
    white_bg = bool(dataset.white_bg)
    fcfg = field_config_from(cfg, dataset.near_far)

    reso_cur = LC.n_to_reso(cfg.N_voxel_init, aabb)
    n_samples = min(cfg.nSamples, LC.cal_n_samples(reso_cur, cfg.step_ratio))

    # multi-host (SURVEY.md §2.8): a mesh over every chip on every process;
    # each host loads/samples only its own ray shard (see below) and the
    # shard_map'ed step all-reduces grads over ICI+DCN. Single-host keeps the
    # cfg.mesh_data gate.
    n_proc = jax.process_count()
    if n_proc > 1:
        mesh = make_mesh()
    else:
        mesh = make_mesh(cfg.mesh_data) if cfg.mesh_data > 1 else None
    is_main = jax.process_index() == 0
    # every process must agree on whether checkpoint events happen (the
    # barrier below is collective); keep the global answer before gating
    # the actual writes to process 0
    ckpt_requested = log_dir is not None
    if not is_main:
        log_dir = None   # artifacts (logger, checkpoints) only on process 0
    local_batch = cfg.batch_size // n_proc
    if local_batch * n_proc != cfg.batch_size:
        raise ValueError(
            f"batch_size {cfg.batch_size} not divisible by process count "
            f"{n_proc}")

    key = jax.random.PRNGKey(cfg.seed)
    key, k_init = jax.random.split(key)
    gt_envmap = getattr(dataset, "lights_probes", None)
    if gt_envmap is not None and not isinstance(gt_envmap, np.ndarray):
        gt_envmap = None
    resume_state = None   # full-state resume payload (cfg.resume_full)
    resume_opt_leaves = None
    if cfg.ckpt:
        # resume from checkpoint: restores model weights + alpha mask; by
        # default the schedule restarts, matching the reference
        # (train_tensoIR.py:163-168). With cfg.resume_full and a checkpoint
        # that carries train state, training continues exactly where it
        # stopped (optimizer moments, iteration, schedule, RNG).
        from tensoir_tpu.utils.ckpt import load_checkpoint
        fcfg, params, scene, ck_extra = load_checkpoint(cfg.ckpt)
        reso_cur = grid_size_of(params)
        n_samples = min(cfg.nSamples,
                        LC.cal_n_samples(reso_cur, cfg.step_ratio))
        aabb = np.asarray(scene["aabb"])
        if cfg.resume_full and "train_state" in ck_extra:
            resume_state = ck_extra["train_state"]
            resume_opt_leaves = ck_extra.get("opt_leaves")
            if "rng_key" in ck_extra:
                key = jnp.asarray(ck_extra["rng_key"])
    else:
        params, scene = init_field_params(k_init, fcfg, reso_cur, aabb,
                                          gt_envmap=gt_envmap)

    lr_factor = decay_factor(cfg.lr_decay_target_ratio,
                             cfg.lr_decay_iters, n_iters)

    # ray prefilter (train_tensoIR.py:226-231); multi-host: each process
    # keeps only its contiguous shard of the filtered rays and samples
    # local_batch rows per step from it (host-local data loading)
    from tensoir_tpu.parallel.multihost import host_shard
    all_rays = np.asarray(dataset.all_rays, np.float32)
    all_rgbs = np.asarray(dataset.all_rgbs, np.float32)
    all_lidx = np.asarray(dataset.all_light_idx, np.int32).reshape(-1)
    keep = LC.filter_rays_bbox(all_rays, aabb)
    rays_f, rgbs_f, lidx_f = all_rays[keep], all_rgbs[keep], all_lidx[keep]
    if n_proc > 1:
        rays_f, _, _ = host_shard(rays_f)
        rgbs_f, _, _ = host_shard(rgbs_f)
        lidx_f, _, _ = host_shard(lidx_f)
    sampler = SimpleSampler(rays_f.shape[0], local_batch,
                            seed=cfg.seed + jax.process_index())

    voxel_list = LC.voxel_schedule(cfg.N_voxel_init, cfg.N_voxel_final,
                                   len(cfg.upsamp_list))
    upsamp_left = list(cfg.upsamp_list)
    update_am_list = list(cfg.update_AlphaMask_list)

    relight = False
    l1_weight = cfg.L1_weight_inital
    tv_density, tv_app = cfg.TV_weight_density, cfg.TV_weight_app
    relight_start = (update_am_list[0] if update_am_list else 0)
    cur_lr_scale = 1.0
    start_it = 0

    if resume_state is not None:
        start_it = int(resume_state["iteration"])
        relight = bool(resume_state["relight"])
        l1_weight = float(resume_state["l1_weight"])
        tv_density = float(resume_state["tv_density"])
        tv_app = float(resume_state["tv_app"])
        voxel_list = list(resume_state["voxel_list"])
        cur_lr_scale = float(resume_state["lr_scale"])
        if (not cfg.ndc_ray and len(update_am_list) > 1
                and start_it >= update_am_list[1]):
            # rays were refiltered against the shrunk bbox before the save
            # (NDC runs never refilter — train_tensoIR.py:400 gates on
            # `not args.ndc_ray`, and so does the in-loop refilter below)
            keep = LC.filter_rays_bbox(all_rays, np.asarray(scene["aabb"]))
            rays_f, rgbs_f, lidx_f = (all_rays[keep], all_rgbs[keep],
                                      all_lidx[keep])
            if n_proc > 1:
                rays_f, _, _ = host_shard(rays_f)
                rgbs_f, _, _ = host_shard(rgbs_f)
                lidx_f, _, _ = host_shard(lidx_f)
        sampler = SimpleSampler(rays_f.shape[0], local_batch,
                                seed=cfg.seed + start_it + jax.process_index())

    # fast_march_start == -1 (auto): the flip is decided by the measured
    # window-truncation residual instead of a hand-tuned iteration; this
    # python bool latches once the progress-refresh check below fires so
    # later phase rebuilds keep the fast knobs on
    fast_auto = cfg.fast_march_start == -1
    fast_flipped = False
    # plateau tracker for the auto flip (config.fast_march_auto_patience):
    # running best residual and the iteration it was last improved at
    auto_best_resid = float("inf")
    auto_best_it = -1
    auto_recent = []   # (it, resid) refreshes within the patience window
    # effective relight cap of the CURRENT jit phase (curriculum-aware);
    # read by make_meter for honest visibility-ray crediting
    cur_relight_cap = [cfg.relight_ray_cap]
    curriculum_warned = [False]

    def build_step(lr_scale: float, at_iter: int = 0, reuse_opt=None):
        # lossy fast-march knobs (window cull, baked app feature) stay OFF
        # until fast_march_start — on a soft early-relight density the
        # window truncates real transmittance/indirect (config.py note)
        # exact-finish (config.py:fast_march_end): past it the knobs are
        # exact again but the run is AT full pressure (reference end state)
        past_end = (cfg.fast_march_end > 0
                    and at_iter >= cfg.fast_march_end)
        past_start = (fast_flipped if fast_auto
                      else at_iter >= cfg.fast_march_start) or past_end
        fast_on = past_start and not past_end
        eff_window = cfg.second_window if fast_on else 0
        eff_window_back = cfg.second_window_back if fast_on else 0
        eff_app_bake = cfg.app_bake_reso if fast_on else 0
        # relight-cap curriculum (r4 multilight-collapse fix, BASELINE.md
        # matrix): before the fast-march flip the relight branch trains on
        # only the relight_cap_start highest-acc rays — the clean core
        # surface whose BRDF gradients cannot drag a still-soft density
        # into the inverted-normal basin. The flip (fixed iteration or the
        # measured-hardness auto criterion) then grows the cap to the full
        # reference pressure (every masked ray, relight_ray_cap). The jump
        # is a static-shape change handled by this same Adam-preserving
        # rebuild. 0 = off (reference-exact constant cap).
        eff_relight_cap = (min(cfg.relight_cap_start, cfg.relight_ray_cap)
                           if (cfg.relight_cap_start > 0 and relight
                               and not past_start)
                           else cfg.relight_ray_cap)
        cur_relight_cap[0] = eff_relight_cap
        if cfg.relight_cap_start > 0 and relight and is_main \
                and not curriculum_warned[0]:
            # an inert curriculum silently reproduces either the collapse
            # regime or a never-full-pressure run — say so loudly once
            if 0 <= cfg.fast_march_start <= relight_start:
                curriculum_warned[0] = True
                print("[loop] WARNING: relight_cap_start is INERT — "
                      f"fast_march_start {cfg.fast_march_start} <= relight "
                      f"start {relight_start}; full pressure lands on the "
                      "soft density (the r4 collapse regime)", flush=True)
            elif cfg.fast_march_start >= n_iters:
                curriculum_warned[0] = True
                print("[loop] WARNING: full relight cap never activates — "
                      f"fast_march_start {cfg.fast_march_start} >= n_iters "
                      f"{n_iters}; the run stays at the core cap "
                      f"{cfg.relight_cap_start}", flush=True)
        eff_group = 0
        if relight and 0 < eff_window < cfg.second_nSample:
            # conservativeness contract, re-checked against the CURRENT
            # (possibly shrunk) aabb at every jit-phase rebuild — a config
            # change must not silently turn the exact interval cull into a
            # light-leaking approximation
            F.check_march_contract(
                np.asarray(scene["aabb"]),
                prepass_n=cfg.second_prepass_n, dilate=cfg.coarse_dilate,
                vis_near=cfg.second_near, vis_far=cfg.second_far)
            eff_group = resolve_march_group(cfg, scene["aabb"],
                                            F.grid_size_of(params))
        eff_pgroup = 0
        if relight and cfg.march_group > 1:
            eff_pgroup = resolve_primary_march_group(
                cfg, scene["aabb"], F.grid_size_of(params),
                fcfg.step_ratio)
        # lr_light deliberately NOT lr_scale'd: the reference hardcodes the
        # light group at 0.001 in get_optparam_groups regardless of the
        # rebuild scale (tensoRF_rotated_lights.py:40-45)
        optimizer = make_optimizer(params, cfg.lr_init * lr_scale,
                                   cfg.lr_basis * lr_scale, lr_factor,
                                   lr_light=cfg.lr_light)
        # reuse_opt: a knob flip that changes no parameter shapes must not
        # reset the Adam moments / schedule (optax states are pytrees
        # independent of the optimizer fn identity)
        opt_state = optimizer.init(params) if reuse_opt is None else reuse_opt
        st = StepStatic(
            n_samples=n_samples, is_relight=relight, white_bg=white_bg,
            sample_method=cfg.light_sample_train,
            app_cap=cfg.app_cap_per_ray,
            march_cap=cfg.march_cap_primary if relight else 0,
            march_group=eff_pgroup,
            second_march_cap=cfg.march_cap_secondary,
            secondary_use_baked=cfg.secondary_use_baked,
            secondary_bake_reso=cfg.secondary_bake_reso,
            second_window=eff_window,
            second_window_back=eff_window_back,
            second_prepass_n=cfg.second_prepass_n,
            coarse_dilate=cfg.coarse_dilate,
            march_select=cfg.march_select,
            secondary_compact_frac=cfg.secondary_compact_frac,
            second_march_group=eff_group,
            group_bake_reso=cfg.group_bake_reso,
            app_bake_reso=eff_app_bake,
            secondary_app_hoist=bool(cfg.secondary_app_hoist),
            second_app_cap=cfg.second_app_cap,
            app_pair_frac=cfg.app_pair_frac,
            # during the exact pre-flip phase, probe what the configured
            # window WOULD truncate; auto mode needs the telemetry on to
            # make its flip decision regardless of cfg.secondary_stats
            second_window_probe=(cfg.second_window
                                 if relight and not past_start else 0),
            second_window_probe_back=(cfg.second_window_back
                                      if relight and not past_start else 0),
            secondary_stats=bool(cfg.secondary_stats) or (
                fast_auto and relight and not past_start),
            relight_ray_cap=eff_relight_cap,
            second_n_sample=cfg.second_nSample,
            second_near=cfg.second_near, second_far=cfg.second_far,
            secondary_tile=cfg.secondary_tile,
            ndc_ray=bool(cfg.ndc_ray))
        w = LossWeights(
            ortho=cfg.Ortho_weight, l1=l1_weight,
            tv_density=tv_density, tv_app=tv_app,
            rgb_brdf=cfg.rgb_brdf_weight,
            normals_diff=cfg.normals_diff_weight,
            normals_ori=cfg.normals_orientation_weight,
            albedo_sm=cfg.albedo_smoothness_loss_weight,
            rough_sm=cfg.roughness_smoothness_loss_weight,
            normals_enhance_ratio=cfg.normals_loss_enhance_ratio,
            brdf_enhance_ratio=cfg.BRDF_loss_enhance_ratio,
            n_iters=n_iters, relight_start=relight_start,
            lr_factor=lr_factor,
            rgb_brdf_warmup_iters=cfg.rgb_brdf_warmup_iters)
        return make_train_step(fcfg, optimizer, st, w, mesh=mesh), opt_state

    step_fn, opt_state = build_step(cur_lr_scale, at_iter=start_it)
    if resume_opt_leaves is not None:
        from tensoir_tpu.utils.ckpt import restore_opt_state
        opt_state = restore_opt_state(opt_state, resume_opt_leaves)
    if mesh is not None:
        params = replicate(mesh, params)
        scene = replicate(mesh, scene)
        opt_state = replicate(mesh, opt_state)

    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        write_config_provenance(cfg, log_dir)
        logger = MetricsLogger(log_dir)
    else:
        logger = None

    def make_meter(n_masked: int = None) -> RayThroughputMeter:
        # honest visibility-ray counting (the bench.py convention):
        # min(measured acc-mask count, cap) x dirs. Until a count is
        # observed, credit 0 visibility rays rather than the full cap.
        if relight and n_masked is not None:
            vis = (min(n_masked, cur_relight_cap[0])
                   * cfg.envmap_h * cfg.envmap_w)
        else:
            vis = 0
        meter = RayThroughputMeter(primary_per_step=cfg.batch_size,
                                   visibility_per_step=vis)
        meter.start()
        return meter

    meter = make_meter()

    def train_state_extra(it: int) -> Dict:
        return {"iteration": it, "train_state": {
            "iteration": it, "relight": relight, "l1_weight": l1_weight,
            "tv_density": tv_density, "tv_app": tv_app,
            "voxel_list": [int(v) for v in voxel_list],
            "lr_scale": float(cur_lr_scale)}}

    history = []
    t_start = time.time()
    # Graceful preemption: touch $TENSOIR_STOP_FILE and the loop exits at
    # the next progress refresh — final checkpoint (with the TRUE stop
    # iteration, so resume_full continues correctly) and the caller's
    # final eval still run. This is how queued TPU runs are ended near a
    # round boundary without killing the python (an axon SIGKILL
    # mid-claim wedges the tunnel; CLAUDE.md). The env var is identical
    # on every process (inherited from one launcher), so the collective
    # agree() below is reached uniformly. When the env var is unset, a
    # per-run `<log_dir>/STOP` file is honored instead, so a run whose
    # launcher forgot the env var can still be preempted gracefully
    # (process-0 observation broadcast by agree(), like the env path).
    stop_path = os.environ.get("TENSOIR_STOP_FILE", "")
    if not stop_path and log_dir:
        stop_path = os.path.join(log_dir, "STOP")
        # a STOP left behind by a PREVIOUS run in this dir must not
        # silently abort this one at its first refresh (the resume-flow
        # landmine): clear anything that predates this run. The env-var
        # path is exempt — operators pre-create those deliberately (the
        # r6s4-style queue watchdogs) and own their lifecycle.
        if is_main and os.path.exists(stop_path):
            print(f"[loop] clearing stale stop file {stop_path} "
                  "(predates this run)", flush=True)
            os.remove(stop_path)
        multihost.barrier("stale_stop_clear")
    stopped_early = False
    it = start_it - 1  # resume-at-completion: loop body may never run
    for it in range(start_it, n_iters):
        ids = sampler.nextids()
        batch = {
            "rays": rays_f[ids],
            "rgbs": rgbs_f[ids],
            "light_idx": lidx_f[ids],
        }
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        else:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step_fn(
            params, opt_state, scene, batch, sub, jnp.asarray(it))
        meter.step()

        if it % cfg.progress_refresh_rate == 0 or it == n_iters - 1:
            m = {k: float(v) for k, v in metrics.items()}
            m["iteration"] = it
            m["elapsed_s"] = time.time() - t_start
            if relight:
                # curriculum observability: the cap this phase relit at
                m["relight_cap_eff"] = float(cur_relight_cap[0])
            # float() above syncs device->host, so the meter window is real
            m["rays_per_s"] = meter.report()["rays_per_s"]
            # restart the window with the MEASURED acc-mask count so the
            # next report credits min(measured, cap) x dirs — the honest
            # counting convention (bench.py)
            meter = make_meter(int(m["n_acc_masked"])
                               if "n_acc_masked" in m else None)
            history.append(m)
            if logger:
                logger.log(it, m)
            if progress_cb:
                progress_cb(it, m)
            if (fast_auto and relight and not fast_flipped
                    and (cfg.fast_march_end <= 0
                         or it < cfg.fast_march_end)):
                # measured density-hardness criteria (psum'd metrics are
                # process-identical, so every process takes the same
                # branch at the same iteration):
                #   1. absolute: the configured window now truncates
                #      < thres of the marched weight mass;
                #   2. plateau: the residual sits at a running best that
                #      has stopped improving — the scene's own floor
                #      (ground planes hold it at ~0.03, above thres) —
                #      and that floor is below the soft-density ceiling.
                resid = m.get("sec/window_resid_rel", float("inf"))
                flip_why = ""
                if resid < cfg.fast_march_auto_thres:
                    flip_why = (f"window_resid_rel {resid:.4f} < "
                                f"{cfg.fast_march_auto_thres}")
                elif cfg.fast_march_auto_patience > 0 and np.isfinite(resid):
                    band = 1.0 - cfg.fast_march_auto_rel_improve
                    auto_recent.append((it, resid))
                    auto_recent = [
                        (i, r) for i, r in auto_recent
                        if it - i <= cfg.fast_march_auto_patience]
                    trailing_min = min(r for _, r in auto_recent)
                    if resid < auto_best_resid * band:
                        auto_best_resid, auto_best_it = resid, it
                    elif (auto_best_it >= 0
                          and it - auto_best_it
                          >= cfg.fast_march_auto_patience
                          and auto_best_resid < cfg.fast_march_auto_ceiling
                          and resid < cfg.fast_march_auto_ceiling
                          and resid
                          <= trailing_min * cfg.fast_march_auto_spike_tol):
                        # typical of the recent window (not a noise spike);
                        # the residual may legitimately settle ABOVE a
                        # transient early dip (r5 on-chip finding), so the
                        # spike guard compares against the trailing min,
                        # not the since-reset best
                        flip_why = (
                            f"plateau: window_resid_rel {resid:.4f} at "
                            f"best {auto_best_resid:.4f} with no "
                            f">{cfg.fast_march_auto_rel_improve:.0%} "
                            f"improvement for {it - auto_best_it} iters "
                            f"(ceiling {cfg.fast_march_auto_ceiling})")
                if flip_why:
                    # flip the lossy knobs on (same Adam-preserving
                    # rebuild as the fixed-iteration flip)
                    fast_flipped = True
                    if is_main:
                        print(f"[loop] fast-march AUTO flip at iter {it}: "
                              f"{flip_why}", flush=True)
                    step_fn, _ = build_step(cur_lr_scale, at_iter=it,
                                            reuse_opt=opt_state)
            # process-0's file observation, broadcast — independent
            # per-process checks could break at different iterations and
            # deadlock the ckpt_final barrier below
            if stop_path and multihost.agree(
                    is_main and os.path.exists(stop_path)):
                stopped_early = True
                if is_main:
                    print(f"[loop] stop file {stop_path} seen at iter {it};"
                          " stopping early (final ckpt/eval still run)",
                          flush=True)
                break

        # ---- phase schedule ----
        rebuilt_this_it = False
        if it in update_am_list:
            reso_mask = tuple(min(r, 256) for r in reso_cur)
            # np hop is load-bearing: it unshards the (possibly
            # mesh-committed) arrays to host-local values first
            scene_h = {k: jnp.asarray(np.asarray(v))
                       for k, v in scene.items()}
            params_h = jax.tree.map(jnp.asarray, params)
            new_scene, new_aabb = LC.update_alpha_mask(
                fcfg, params_h, scene_h, reso_mask)
            scene = new_scene
            if it == update_am_list[0]:
                params, scene = LC.shrink(fcfg, params_h, scene, new_aabb)
                l1_weight = cfg.L1_weight_rest
                relight = True
                tv_density, tv_app = 0.0, 0.0
                reso_cur = grid_size_of(params)
                n_samples = min(cfg.nSamples,
                                LC.cal_n_samples(reso_cur, cfg.step_ratio))
                cur_lr_scale = 1.0
                step_fn, opt_state = build_step(cur_lr_scale, at_iter=it)
                rebuilt_this_it = True
                meter = make_meter()   # relight flip changes rays/step
                if mesh is not None:
                    params = replicate(mesh, params)
                    scene = replicate(mesh, scene)
                    opt_state = replicate(mesh, opt_state)
            elif mesh is not None:
                # later mask refreshes keep shapes; re-replicate the scene
                scene = replicate(mesh, scene)
            # reference gates this refilter on NDC mode
            # (train_tensoIR.py:400: `if not args.ndc_ray and ...`)
            if (not cfg.ndc_ray and len(update_am_list) > 1
                    and it == update_am_list[1]):
                keep = LC.filter_rays_bbox(all_rays, np.asarray(scene["aabb"]))
                rays_f, rgbs_f, lidx_f = (all_rays[keep], all_rgbs[keep],
                                          all_lidx[keep])
                if n_proc > 1:
                    rays_f, _, _ = host_shard(rays_f)
                    rgbs_f, _, _ = host_shard(rgbs_f)
                    lidx_f, _, _ = host_shard(lidx_f)
                sampler = SimpleSampler(
                    rays_f.shape[0], local_batch,
                    seed=cfg.seed + it + jax.process_index())

        if it in upsamp_left and voxel_list:
            n_voxels = voxel_list.pop(0)
            reso_cur = LC.n_to_reso(n_voxels, np.asarray(scene["aabb"]))
            n_samples = min(cfg.nSamples,
                            LC.cal_n_samples(reso_cur, cfg.step_ratio))
            params = LC.upsample(jax.tree.map(jnp.asarray, params), reso_cur)
            cur_lr_scale = 1.0 if cfg.lr_upsample_reset else (
                cfg.lr_decay_target_ratio ** (it / n_iters))
            step_fn, opt_state = build_step(cur_lr_scale, at_iter=it)
            rebuilt_this_it = True
            if mesh is not None:
                params = replicate(mesh, params)
                scene = replicate(mesh, scene)
                opt_state = replicate(mesh, opt_state)

        if rebuilt_this_it or it in update_am_list:
            # a phase rebuild / alpha-mask refresh perturbs the density, so
            # plateau patience must be re-measured on the new grid — stale
            # pre-rebuild patience would let the auto flip fire at the first
            # refresh whose residual re-enters the old best band
            auto_best_resid, auto_best_it = float("inf"), -1
            auto_recent = []

        if (relight and cfg.fast_march_start > 0
                and it == cfg.fast_march_start and not rebuilt_this_it):
            # fast-march knob flip only (config.py:fast_march_start): no
            # parameter shapes change, so keep the optimizer state — the
            # coincident-event cases are covered by the rebuilds above,
            # which already pass at_iter=it
            step_fn, _ = build_step(cur_lr_scale, at_iter=it,
                                    reuse_opt=opt_state)

        if (relight and cfg.fast_march_end > 0
                and it == cfg.fast_march_end and not rebuilt_this_it):
            # exact-finish flip (config.py:fast_march_end): lossy knobs
            # off, cap stays full — same Adam-preserving rebuild
            if is_main:
                print(f"[loop] exact-finish flip at iter {it}: fast-march "
                      "knobs off, full relight cap retained", flush=True)
            step_fn, _ = build_step(cur_lr_scale, at_iter=it,
                                    reuse_opt=opt_state)

        if eval_fn is not None and relight and cfg.vis_every > 0 \
                and it % cfg.vis_every == cfg.vis_every - 1 and is_main:
            # is_main: multi-host artifact gating — without it every
            # process would redundantly render the eval and concurrently
            # write the same files (garbling metrics_record.txt)
            if n_proc > 1:
                # replicated global-mesh arrays are not fully addressable
                # from one process — hand eval host-local copies (same np
                # hop the checkpoint path uses)
                eval_fn(fcfg, jax.tree.map(lambda x: jnp.asarray(
                            np.asarray(x)), params),
                        {k: jnp.asarray(np.asarray(v))
                         for k, v in scene.items()},
                        it, n_samples, logger=logger)
            else:
                eval_fn(fcfg, params, scene, it, n_samples, logger=logger)
            meter.start()   # exclude eval time from the throughput window

        if ckpt_requested and cfg.save_iters > 0 and it > 0 \
                and it % cfg.save_iters == 0:
            # params are replicated: process 0 writes, everyone else waits.
            # The condition uses ckpt_requested (identical on EVERY
            # process) because the barrier is collective — gating it on
            # the process-0-only log_dir would deadlock process 0
            # (reference `synchronize` barrier around artifact writes,
            # utils.py:231-242).
            if is_main:
                save_checkpoint(os.path.join(log_dir, f"ckpt_{it}.npz"),
                                fcfg, jax.tree.map(np.asarray, params),
                                jax.tree.map(np.asarray, scene),
                                extra=train_state_extra(it + 1),
                                opt_state=jax.tree.map(np.asarray, opt_state),
                                rng_key=np.asarray(key))
            multihost.barrier("ckpt_save")

    if ckpt_requested:
        if is_main:
            save_checkpoint(os.path.join(log_dir, "ckpt_final.npz"),
                            fcfg, jax.tree.map(np.asarray, params),
                            jax.tree.map(np.asarray, scene),
                            extra=train_state_extra(
                                it + 1 if stopped_early else n_iters),
                            opt_state=jax.tree.map(np.asarray, opt_state),
                            rng_key=np.asarray(key))
        multihost.barrier("ckpt_final")
        if logger:
            logger.close()

    return TrainResult(params=params, scene=scene, fcfg=fcfg,
                       metrics_history=history, n_samples=n_samples)
