"""Full-pipeline smoke: config loading (incl. reference-format files),
the reconstruction loop with phase schedule, eval suite, relight benchmark,
and mesh export — all tiny, CPU-runnable."""
import os

import numpy as np
import pytest

from tensoir_tpu.config import TensoIRConfig, load_config
from tensoir_tpu.data.synthetic import SyntheticSphereDataset


def test_load_our_configs():
    cfg = load_config("configs/single_light/armadillo.txt")
    assert cfg.dataset_name == "tensoIR_unknown_rotated_lights"
    assert cfg.n_lamb_sigma == (16, 16, 16)
    assert cfg.n_lamb_sh == (48, 48, 48)
    assert cfg.light_rotation == ("000",)
    assert cfg.N_voxel_final == 27000000
    assert cfg.normals_kind == "derived_plus_predicted"


def test_load_reference_config_file():
    """Reference configs/**/*.txt parse unchanged (file compatibility)."""
    path = "/root/reference/configs/single_light/armadillo.txt"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    cfg = load_config(path)
    assert cfg.n_iters == 80000
    assert cfg.batch_size == 4096
    assert cfg.upsamp_list == (10000, 20000, 30000, 40000)
    assert cfg.light_rotation == ("000",)
    assert cfg.rgb_brdf_weight == 0.2
    assert cfg.L1_weight_inital == 8e-5


def test_load_reference_general_config():
    path = "/root/reference/configs/multi_light_general/ficus.txt"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    cfg = load_config(path)
    assert cfg.light_name_list == ("sunset", "snow", "courtyard")
    assert cfg.light_num == 3
    assert cfg.N_voxel_final == 64000000


@pytest.mark.slow
def test_reconstruction_loop_with_phases(tmp_path):
    """Mini end-to-end: train through an alpha-mask/shrink/upsample event,
    then eval + relight + mesh export from the result."""
    from tensoir_tpu.train.loop import reconstruction
    from tensoir_tpu.render.eval import evaluation_iter
    from tensoir_tpu.utils.ckpt import load_checkpoint
    from tensoir_tpu.models.field import grid_size_of
    from tensoir_tpu.models.lifecycle import dense_alpha
    from tensoir_tpu.utils.mesh_export import export_mesh_from_alpha

    ds = SyntheticSphereDataset(split="train", n_views=4, img_wh=(32, 32))
    cfg = TensoIRConfig(
        n_iters=60,
        batch_size=256,
        n_lamb_sigma=(4, 4, 4),
        n_lamb_sh=(4, 4, 4),
        data_dim_color=6,
        featureC=32,
        N_voxel_init=20 ** 3,
        N_voxel_final=28 ** 3,
        upsamp_list=(20,),
        update_AlphaMask_list=(20, 40),
        step_ratio=2.0,
        nSamples=48,
        numLgtSGs=16,
        envmap_h=4, envmap_w=8,
        second_nSample=8,
        app_cap_per_ray=8,
        relight_ray_cap=16,
        secondary_tile=256,
        vis_every=0,
        save_iters=0,
        N_vis=0,
        progress_refresh_rate=10,
    )
    log_dir = os.path.join(tmp_path, "log")
    result = reconstruction(cfg, ds, log_dir=log_dir)
    assert len(result.metrics_history) > 0
    assert np.isfinite(result.metrics_history[-1]["total_loss"])
    # lifecycle fired: the final grid differs from the initial 20^3
    # (upsample toward N_voxel_final and/or aabb shrink both change it)
    assert tuple(grid_size_of(result.params)) != (20, 20, 20)
    assert os.path.exists(os.path.join(log_dir, "ckpt_final.npz"))

    # checkpoint roundtrip and eval
    fcfg, params, scene, extra = load_checkpoint(
        os.path.join(log_dir, "ckpt_final.npz"))
    eval_ds = SyntheticSphereDataset(split="test", n_views=2, img_wh=(32, 32))
    results = evaluation_iter(
        fcfg, params, scene, eval_ds, n_samples=32,
        save_path=os.path.join(tmp_path, "eval"), n_vis=1,
        chunk=256, compute_extra_metrics=True, app_cap=8,
        relight_ray_cap=64, second_n_sample=8, secondary_tile=256)
    assert np.isfinite(results["psnr_nvs"])
    assert "normal_mae_deg" in results
    assert "psnr_albedo_single" in results
    assert os.path.exists(os.path.join(tmp_path, "eval",
                                       "metrics_record.txt"))

    # mesh export from the trained density
    alpha = dense_alpha(fcfg, params, scene, (16, 16, 16))
    mesh_path = os.path.join(tmp_path, "mesh.ply")
    export_mesh_from_alpha(alpha, np.asarray(scene["aabb"]), mesh_path,
                           level=0.005)
    assert os.path.exists(mesh_path)


@pytest.mark.slow
def test_full_state_resume(tmp_path):
    """Preemption recovery (beyond-reference): a checkpoint written mid-run
    carries optimizer moments + iteration + schedule state, and
    `resume_full=True` continues exactly where training stopped."""
    import dataclasses

    from tensoir_tpu.train.loop import reconstruction
    from tensoir_tpu.utils.ckpt import load_checkpoint

    ds = SyntheticSphereDataset(split="train", n_views=4, img_wh=(32, 32))
    cfg = TensoIRConfig(
        n_iters=30,
        batch_size=128,
        n_lamb_sigma=(4, 4, 4),
        n_lamb_sh=(4, 4, 4),
        data_dim_color=6,
        featureC=32,
        N_voxel_init=16 ** 3,
        N_voxel_final=16 ** 3,
        upsamp_list=(1000,),
        update_AlphaMask_list=(1000,),
        step_ratio=2.0,
        nSamples=32,
        numLgtSGs=16,
        envmap_h=4, envmap_w=8,
        vis_every=0,
        save_iters=10,
        N_vis=0,
        progress_refresh_rate=5,
    )
    log_dir = os.path.join(tmp_path, "run_a")
    reconstruction(cfg, ds, log_dir=log_dir)

    ckpt_path = os.path.join(log_dir, "ckpt_20.npz")
    assert os.path.exists(ckpt_path)
    _, _, _, extra = load_checkpoint(ckpt_path)
    assert extra["train_state"]["iteration"] == 21
    assert "opt_leaves" in extra and len(extra["opt_leaves"]) > 0
    assert "rng_key" in extra

    cfg_b = dataclasses.replace(cfg, ckpt=ckpt_path, resume_full=True,
                                save_iters=0)
    log_b = os.path.join(tmp_path, "run_b")
    result = reconstruction(cfg_b, ds, log_dir=log_b)
    its = [m["iteration"] for m in result.metrics_history]
    assert min(its) >= 21, "resume must continue, not restart"
    assert np.isfinite(result.metrics_history[-1]["total_loss"])

    # weights-only behavior (reference semantics) still the default
    cfg_c = dataclasses.replace(cfg, ckpt=ckpt_path, save_iters=0,
                                n_iters=5)
    result_c = reconstruction(cfg_c, ds)
    assert min(m["iteration"] for m in result_c.metrics_history) == 0


@pytest.mark.slow
def test_stop_file_graceful_early_exit(tmp_path, monkeypatch):
    """Touching $TENSOIR_STOP_FILE ends training at the next progress
    refresh but still writes a resumable ckpt_final (operational tool for
    ending queued TPU runs near a round boundary without a SIGKILL)."""
    import dataclasses

    from tensoir_tpu.train.loop import reconstruction
    from tensoir_tpu.utils.ckpt import load_checkpoint

    stop_file = os.path.join(tmp_path, "stop_now")
    with open(stop_file, "w") as f:
        f.write("stop")
    monkeypatch.setenv("TENSOIR_STOP_FILE", stop_file)

    ds = SyntheticSphereDataset(split="train", n_views=4, img_wh=(32, 32))
    cfg = TensoIRConfig(
        n_iters=500,  # would take minutes — the stop must cut it short
        batch_size=128,
        n_lamb_sigma=(4, 4, 4),
        n_lamb_sh=(4, 4, 4),
        data_dim_color=6,
        featureC=32,
        N_voxel_init=16 ** 3,
        N_voxel_final=16 ** 3,
        upsamp_list=(1000,),
        update_AlphaMask_list=(1000,),
        step_ratio=2.0,
        nSamples=32,
        numLgtSGs=16,
        envmap_h=4, envmap_w=8,
        vis_every=0,
        save_iters=0,
        N_vis=0,
        progress_refresh_rate=5,
    )
    log_dir = os.path.join(tmp_path, "run_stop")
    result = reconstruction(cfg, ds, log_dir=log_dir)
    # stop fires at the FIRST progress refresh (iter 0)
    assert len(result.metrics_history) == 1
    ckpt_path = os.path.join(log_dir, "ckpt_final.npz")
    assert os.path.exists(ckpt_path)
    _, _, _, extra = load_checkpoint(ckpt_path)
    assert extra["train_state"]["iteration"] == 1  # TRUE stop point

    # resume_full continues from the stop point once the file is gone
    os.remove(stop_file)
    cfg_b = dataclasses.replace(cfg, ckpt=ckpt_path, resume_full=True,
                                n_iters=8)
    result_b = reconstruction(cfg_b, ds,
                              log_dir=os.path.join(tmp_path, "run_resume"))
    its = [m["iteration"] for m in result_b.metrics_history]
    assert min(its) >= 1, "resume must continue from the stop iteration"

    # default per-run stop file: with the env var UNSET, `<log_dir>/STOP`
    # is honored when created DURING the run — graceful preemption for
    # runs whose launcher forgot TENSOIR_STOP_FILE. A STOP left behind by
    # a previous run (created before start) is cleared at startup instead
    # of silently aborting the new run (the resume-flow landmine).
    monkeypatch.delenv("TENSOIR_STOP_FILE")
    log_dir2 = os.path.join(tmp_path, "run_stop_default")
    os.makedirs(log_dir2)
    stale = os.path.join(log_dir2, "STOP")
    with open(stale, "w") as f:
        f.write("stale")  # pre-created: must be CLEARED, not honored

    def touch_stop_mid_run(it, m):
        if it >= 10 and not os.path.exists(stale):
            with open(stale, "w") as f:
                f.write("stop")

    result_c = reconstruction(cfg, ds, log_dir=log_dir2,
                              progress_cb=touch_stop_mid_run)
    its_c = [m["iteration"] for m in result_c.metrics_history]
    # survived the stale file (ran past iter 0) AND stopped soon after
    # the mid-run touch (well before n_iters=500)
    assert max(its_c) >= 10
    assert max(its_c) <= 30
    assert os.path.exists(os.path.join(log_dir2, "ckpt_final.npz"))


@pytest.mark.slow
def test_relight_benchmark_pipeline(tmp_path):
    """EnvironmentLight + importance-sampled relighting on a tiny model,
    asserting the reference artifact tree
    (scripts/relight_importance.py:201-339)."""
    import jax
    from tensoir_tpu.data.hdr import write_hdr
    from tensoir_tpu.models.env_light import EnvironmentLight
    from tensoir_tpu.models.field import FieldConfig, init_field_params
    from tensoir_tpu.render.relight_pipeline import relight_benchmark

    hdr_dir = os.path.join(tmp_path, "hdr")
    os.makedirs(hdr_dir)
    rng = np.random.default_rng(0)
    for name in ("bridge", "city"):
        write_hdr(os.path.join(hdr_dir, f"{name}.hdr"),
                  rng.random((8, 16, 3)).astype(np.float32))
    env = EnvironmentLight(hdr_dir)
    assert set(env.light_names) == {"bridge", "city"}

    d, rgb, pdf = env.sample_light("bridge", 4, 32, jax.random.PRNGKey(0))
    assert d.shape == (4, 32, 3) and rgb.shape == (4, 32, 3)
    assert np.all(np.asarray(pdf) > 0)

    cfg = FieldConfig(density_n_comp=(4, 4, 4), app_n_comp=(4, 4, 4),
                      app_dim=6, feature_c=32, num_sgs=16,
                      envmap_h=4, envmap_w=8, step_ratio=2.0)
    aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
    params, scene = init_field_params(jax.random.PRNGKey(0), cfg,
                                      (16, 16, 16), aabb)

    class MiniRelightDS:
        light_names = ["bridge", "city"]
        split = "test"
        near_far = [2.0, 6.0]

        def __len__(self):
            return 1

        def __getitem__(self, i):
            base = SyntheticSphereDataset(split="test", n_views=1,
                                          img_wh=(16, 16))
            item = base[0]
            item["rgbs"] = np.stack([item["rgbs"][0]] * 2, 0)
            # GT albedo + mask exercise the per-view median rescale
            item["albedo"] = np.full_like(item["rgbs"][0], 0.5)
            item["rgbs_mask"] = np.ones(
                (item["rgbs"].shape[1],), np.float32)
            return item

    results = relight_benchmark(
        cfg, params, scene, MiniRelightDS(), env, n_samples=24,
        save_path=os.path.join(tmp_path, "relight"), chunk=64,
        n_light_samples=16, second_n_sample=8, vis_tile=256)
    assert set(results.keys()) == {"bridge", "city"}
    for r in results.values():
        assert np.isfinite(r["psnr"])
    assert os.path.exists(os.path.join(tmp_path, "relight",
                                       "relight_psnr.txt"))
    # artifact parity with the reference output tree
    vd = os.path.join(tmp_path, "relight", "test_000")
    for sub in ("relighting_with_bg/bridge.png",
                "relighting_without_bg/city.png",
                "relighting_without_bg/relight_psnr.txt",
                "rgb.png", "acc.png", "depth.png",
                "albedo.png", "albedo_gamma_corrected.png",
                "gt_albedo_gamma_corrected.png",
                "roughness.png", "normal.png"):
        assert os.path.exists(os.path.join(vd, sub)), sub
    import imageio.v2 as imageio
    assert imageio.imread(os.path.join(vd, "albedo.png")).shape[-1] == 4
    for vdir in ("video", "video_without_bg", "video_with_bg"):
        assert os.listdir(os.path.join(tmp_path, "relight", vdir)), vdir


def test_fast_march_start_flip(tmp_path):
    """fast_march_start keeps the lossy window/app-bake knobs OFF until
    the configured iteration, then flips them on at a mid-run jit rebuild
    WITHOUT resetting the optimizer state (config.py:fast_march_start —
    the r3 multilight-collapse mitigation surface). The flip iteration
    here is NOT a phase event, exercising the standalone rebuild.
    relight_cap_start rides the same flip: the relight branch runs at the
    core cap before it and the full cap after (the r4 collapse fix)."""
    from tensoir_tpu.train.loop import reconstruction

    ds = SyntheticSphereDataset(split="train", n_views=4, img_wh=(32, 32))
    cfg = TensoIRConfig(
        n_iters=60,
        batch_size=256,
        n_lamb_sigma=(4, 4, 4),
        n_lamb_sh=(4, 4, 4),
        data_dim_color=6,
        featureC=32,
        N_voxel_init=20 ** 3,
        N_voxel_final=24 ** 3,
        upsamp_list=(20,),
        update_AlphaMask_list=(20, 40),
        step_ratio=2.0,
        nSamples=48,
        numLgtSGs=16,
        envmap_h=4, envmap_w=8,
        second_nSample=16,
        app_cap_per_ray=8,
        relight_ray_cap=16,
        secondary_tile=256,
        # lossy fast knobs, gated to iteration 30 (between events)
        second_window=12,
        second_window_back=4,
        second_prepass_n=8,
        coarse_dilate=3,
        app_bake_reso=16,
        fast_march_start=30,
        relight_cap_start=4,
        vis_every=0, save_iters=0, N_vis=0,
        progress_refresh_rate=10,
    )
    result = reconstruction(cfg, ds, log_dir=os.path.join(tmp_path, "log"))
    assert np.isfinite(result.metrics_history[-1]["total_loss"])
    # curriculum observable: the relight phase ran at the core cap 4
    # before the flip and the full cap 16 after it
    caps = {m["iteration"]: m.get("relight_cap_eff")
            for m in result.metrics_history if "relight_cap_eff" in m}
    # the flip rebuild runs in the phase block AFTER iter 30's refresh,
    # so iter 30 still reports the core cap
    assert any(v == 4.0 for it, v in caps.items() if it <= 30), caps
    assert any(v == 16.0 for it, v in caps.items() if it >= 40), caps


def test_fast_march_end_exact_finish(tmp_path):
    """fast_march_end (exact-finish): the lossy knobs flip back OFF at the
    configured iteration while the relight cap STAYS at full reference
    pressure (config.py:fast_march_end — the r5 albedo-tax recovery
    surface). Curriculum trajectory: core cap 4 before the start flip at
    30, full cap 16 after it, and STILL 16 after the end flip at 45."""
    from tensoir_tpu.train.loop import reconstruction

    ds = SyntheticSphereDataset(split="train", n_views=4, img_wh=(32, 32))
    cfg = TensoIRConfig(
        n_iters=60,
        batch_size=256,
        n_lamb_sigma=(4, 4, 4),
        n_lamb_sh=(4, 4, 4),
        data_dim_color=6,
        featureC=32,
        N_voxel_init=20 ** 3,
        N_voxel_final=20 ** 3,
        upsamp_list=(1000,),
        update_AlphaMask_list=(20,),
        step_ratio=2.0,
        nSamples=48,
        numLgtSGs=16,
        envmap_h=4, envmap_w=8,
        second_nSample=16,
        app_cap_per_ray=8,
        relight_ray_cap=16,
        secondary_tile=256,
        second_window=12,
        second_window_back=4,
        second_prepass_n=8,
        coarse_dilate=3,
        app_bake_reso=16,
        fast_march_start=30,
        fast_march_end=45,
        relight_cap_start=4,
        vis_every=0, save_iters=0, N_vis=0,
        progress_refresh_rate=10,
    )
    result = reconstruction(cfg, ds, log_dir=os.path.join(tmp_path, "log"))
    assert np.isfinite(result.metrics_history[-1]["total_loss"])
    caps = {m["iteration"]: m.get("relight_cap_eff")
            for m in result.metrics_history if "relight_cap_eff" in m}
    # refreshes at 30/40/50/59: core cap at 30 (flip rebuild runs after
    # that refresh), full at 40, and the end flip must NOT re-shrink it
    assert any(v == 4.0 for it, v in caps.items() if it <= 30), caps
    assert all(v == 16.0 for it, v in caps.items() if it >= 40), caps


@pytest.mark.slow
def test_fast_march_auto_flip(tmp_path):
    """fast_march_start=-1 (auto): the exact march runs until the measured
    window-truncation residual (sec/window_resid_rel) clears the
    threshold, then the lossy knobs flip on; with an impossible threshold
    the probe stays active (and exposed in metrics) to the end."""
    from tensoir_tpu.train.loop import reconstruction

    ds = SyntheticSphereDataset(split="train", n_views=4, img_wh=(32, 32))
    base = dict(
        n_iters=60,
        batch_size=256,
        n_lamb_sigma=(4, 4, 4),
        n_lamb_sh=(4, 4, 4),
        data_dim_color=6,
        featureC=32,
        N_voxel_init=20 ** 3,
        N_voxel_final=20 ** 3,
        upsamp_list=(1000,),
        update_AlphaMask_list=(20,),
        step_ratio=2.0,
        nSamples=48,
        numLgtSGs=16,
        envmap_h=4, envmap_w=8,
        second_nSample=8,
        second_window=4,
        second_window_back=0,
        second_prepass_n=12,
        app_cap_per_ray=8,
        relight_ray_cap=16,
        secondary_tile=256,
        fast_march_start=-1,
        relight_cap_start=4,  # curriculum must compose with auto mode:
        # cap 4 during the probe phase, full cap 16 after the auto flip
        vis_every=0, save_iters=0, N_vis=0,
        progress_refresh_rate=10,
    )
    # Case A — flip mechanics: thres > 1 flips at the FIRST relight
    # progress refresh regardless of the measured value (resid <= 1.0 by
    # construction); afterwards the probe is compiled out. The soft-vs-
    # hard SIGNAL itself is unit-tested in test_app_caps.py.
    cfg = TensoIRConfig(**base, fast_march_auto_thres=2.0)
    res = reconstruction(cfg, ds, log_dir=os.path.join(tmp_path, "auto"))
    relight_ms = [m for m in res.metrics_history if m["iteration"] > 20]
    assert len(relight_ms) >= 2
    assert "sec/window_resid_rel" in relight_ms[0]
    assert "sec/window_resid_rel" not in relight_ms[-1], \
        "auto flip should have disabled the probe"
    assert np.isfinite(res.metrics_history[-1]["total_loss"])

    # Case B — premature-flip guard: this tiny fixture never produces
    # acc-masked rays (n_acc_masked 0), so no weight is marched and the
    # residual must read 1.0 ("not safe"), never a spurious 0.0 that
    # would flip the lossy knobs onto an untrained density.
    cfg2 = TensoIRConfig(**base, fast_march_auto_thres=0.999)
    res2 = reconstruction(cfg2, ds, log_dir=os.path.join(tmp_path, "hold"))
    ms2 = [m for m in res2.metrics_history if m["iteration"] > 20]
    assert all(m.get("sec/window_resid_rel") == 1.0 for m in ms2)
    assert all(m.get("n_acc_masked") == 0.0 for m in ms2)

    # Case C — PLATEAU flip: absolute threshold impossible (0.0), but the
    # constant 1.0 residual is a plateau; with the ceiling raised above it
    # and a short patience, the plateau criterion fires (first refresh
    # sets the running best, the next non-improving refresh past patience
    # flips) and the probe is compiled out afterwards.
    cfg3 = TensoIRConfig(**base, fast_march_auto_thres=0.0,
                         fast_march_auto_patience=5,
                         fast_march_auto_ceiling=2.0)
    res3 = reconstruction(cfg3, ds, log_dir=os.path.join(tmp_path, "plat"))
    ms3 = [m for m in res3.metrics_history if m["iteration"] > 20]
    assert "sec/window_resid_rel" in ms3[0]
    assert "sec/window_resid_rel" not in ms3[-1], \
        "plateau criterion should have flipped and disabled the probe"
    assert np.isfinite(res3.metrics_history[-1]["total_loss"])

    # Case D — ceiling guard: the same plateau must NOT flip when the
    # running best (1.0) sits above the soft-density ceiling (default
    # 0.15) — this is exactly the collapse regime the ceiling protects.
    cfg4 = TensoIRConfig(**base, fast_march_auto_thres=0.0,
                         fast_march_auto_patience=5)
    res4 = reconstruction(cfg4, ds, log_dir=os.path.join(tmp_path, "ceil"))
    ms4 = [m for m in res4.metrics_history if m["iteration"] > 20]
    assert all("sec/window_resid_rel" in m for m in ms4), \
        "above-ceiling plateau must hold the exact march to the end"

    # Case E — rebuild reset (ADVICE r4): a phase event (second alpha-mask
    # refresh at iter 40) must reset the plateau tracker, so patience is
    # re-measured on the perturbed field. Refreshes land at 30/40/50/59;
    # with patience 15 the stale tracker would flip at 50 (20 iters since
    # the best at 30), but the reset at 40 restarts the clock (best re-set
    # at 50, only 9 elapsed by 59) and the probe survives to the end.
    cfg5 = TensoIRConfig(**{**base, "update_AlphaMask_list": (20, 40)},
                         fast_march_auto_thres=0.0,
                         fast_march_auto_patience=15,
                         fast_march_auto_ceiling=2.0)
    res5 = reconstruction(cfg5, ds, log_dir=os.path.join(tmp_path, "reset"))
    ms5 = [m for m in res5.metrics_history if m["iteration"] > 20]
    assert all("sec/window_resid_rel" in m for m in ms5), \
        "phase rebuild must re-arm plateau patience (no stale-clock flip)"

