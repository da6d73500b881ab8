"""CLI training driver — the equivalent of the reference's four train_*.py
scripts in one (train_tensoIR.py / train_tensoIR_simple.py /
train_tensoIR_rotated_multi_lights.py / train_tensoIR_general_multi_lights.py;
they differ only in dataset + light parameterization, SURVEY.md §2.7).

Usage:
  python train_tensoir.py --config configs/single_light/armadillo.txt
  python train_tensoir.py --config ... --render_only 1 --render_test 1
  python train_tensoir.py --config ... --export_mesh 1 --ckpt <path.npz>

Reference-format config files are accepted verbatim; any config key can be
overridden on the command line as --key value.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import numpy as np


def parse_cli(argv=None):
    from tensoir_tpu.config import TensoIRConfig, load_config, _coerce

    parser = argparse.ArgumentParser(add_help=True)
    parser.add_argument("--config", type=str, default=None)
    known, rest = parser.parse_known_args(argv)

    overrides = {}
    fields = {f.name: f for f in dataclasses.fields(TensoIRConfig)}
    i = 0
    while i < len(rest):
        tok = rest[i]
        if not tok.startswith("--"):
            raise SystemExit(f"unexpected argument: {tok}")
        key = tok[2:]
        if key not in fields:
            raise SystemExit(f"unknown config key: --{key}")
        if i + 1 >= len(rest):
            raise SystemExit(f"--{key} needs a value (config keys are "
                             f"key/value pairs, e.g. --{key} 1)")
        val = rest[i + 1]
        from tensoir_tpu.config import _parse_value
        overrides[key] = _coerce(key, _parse_value(val), fields)
        i += 2
    return load_config(known.config, overrides)


def build_dataset(cfg, split: str):
    import inspect
    from tensoir_tpu.data import get_dataset
    cls = get_dataset(cfg.dataset_name)
    kw = dict(
        split=split,
        downsample=(cfg.downsample_train if split == "train"
                    else cfg.downsample_test),
        light_rotation=list(cfg.light_rotation),
        light_name=cfg.light_name,
    )
    if (split == "test" and cfg.test_number > 0
            and "sub" in inspect.signature(cls.__init__).parameters):
        # reference render_test caps the test split at test_number views
        # (train_tensoIR.py:68-69, sub=args.test_number)
        kw["sub"] = cfg.test_number
    if cfg.light_name_list:
        kw["light_name_list"] = list(cfg.light_name_list)
    if cfg.scene_bbox:
        kw["scene_bbox"] = np.asarray(cfg.scene_bbox, np.float32).reshape(2, 3)
    if cfg.dataset_name == "blender":
        return cls(cfg.datadir, split=kw["split"], downsample=kw["downsample"])
    return cls(cfg.datadir, cfg.hdrdir, **kw)


def render_orbit_path(cfg, fcfg, params, scene, n_samples, logfolder):
    """--render_path: orbit-path video via the test_new_pose machinery
    (tensoIR_simple.py:84-155; dispatch train_tensoIR.py:478). Datasets
    without synthetic-orbit support are rejected loudly, not ignored."""
    from tensoir_tpu.data import get_dataset
    from tensoir_tpu.render.eval import evaluation_path

    import inspect
    cls = get_dataset(cfg.dataset_name)
    if "test_new_pose" not in inspect.signature(cls.__init__).parameters:
        raise SystemExit(
            f"--render_path needs a dataset with synthetic-orbit support "
            f"(test_new_pose); {cfg.dataset_name} has none")
    kw = dict(split="test", downsample=cfg.downsample_test,
              light_rotation=list(cfg.light_rotation),
              light_name=cfg.light_name, test_new_pose=True,
              n_orbit=cfg.n_orbit)
    if cfg.scene_bbox:
        kw["scene_bbox"] = np.asarray(
            cfg.scene_bbox, np.float32).reshape(2, 3)
    path_dataset = cls(cfg.datadir, cfg.hdrdir, **kw)
    n = evaluation_path(
        fcfg, params, scene, path_dataset, n_samples=n_samples,
        save_path=os.path.join(logfolder, "imgs_path_all"),
        chunk=cfg.batch_size_test, second_n_sample=cfg.second_nSample,
        secondary_tile=cfg.secondary_tile,
        # GT-free orbit video: fast march on by default (evaluation_path's
        # own default) — there is nothing to compare exactly against
        ndc_ray=bool(cfg.ndc_ray))
    print(f"======> {cfg.expname} path: {n} frames -> imgs_path_all")


def main(argv=None):
    cfg = parse_cli(argv)

    import jax
    from tensoir_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    from tensoir_tpu.models.field import grid_size_of
    from tensoir_tpu.utils.compile_cache import enable as _cc
    _cc()
    from tensoir_tpu.models import lifecycle as LC
    from tensoir_tpu.render.eval import evaluation_iter
    from tensoir_tpu.utils.ckpt import load_checkpoint

    logfolder = os.path.join(cfg.basedir, cfg.expname)

    if cfg.export_mesh:
        from tensoir_tpu.models.lifecycle import dense_alpha
        from tensoir_tpu.utils.mesh_export import export_mesh_from_alpha
        fcfg, params, scene, extra = load_checkpoint(cfg.ckpt)
        grid = grid_size_of(params)
        alpha = dense_alpha(fcfg, params, scene, grid)
        # suffix-safe: never let the mesh path collide with the ckpt
        root, ext = os.path.splitext(cfg.ckpt)
        out = (root if ext == ".npz" else cfg.ckpt) + ".ply"
        export_mesh_from_alpha(alpha, np.asarray(scene["aabb"]), out,
                               level=0.005)
        print(f"mesh written to {out}")
        if not (cfg.render_only or cfg.render_test):
            return

    if cfg.render_only and (cfg.render_test or cfg.render_train
                            or cfg.render_path):
        # render-only dispatch (reference train_tensoIR.py:478 accepts
        # render_test OR render_path; render_train added for symmetry)
        fcfg, params, scene, extra = load_checkpoint(cfg.ckpt)
        n_samples = min(cfg.nSamples,
                        LC.cal_n_samples(grid_size_of(params), cfg.step_ratio))
        if cfg.render_test:
            results = evaluation_iter(
                fcfg, params, scene, build_dataset(cfg, "test"),
                n_samples=n_samples,
                save_path=os.path.join(logfolder, "imgs_test_all"),
                chunk=cfg.batch_size_test, test_all=True,
                second_n_sample=cfg.second_nSample,
                secondary_tile=cfg.secondary_tile,
                fast_march=bool(cfg.eval_fast),
                ndc_ray=bool(cfg.ndc_ray))
            print(results)
        if cfg.render_train:
            results = evaluation_iter(
                fcfg, params, scene, build_dataset(cfg, "train"),
                n_samples=n_samples,
                save_path=os.path.join(logfolder, "imgs_train_all"),
                chunk=cfg.batch_size_test, test_all=True,
                compute_extra_metrics=False,
                second_n_sample=cfg.second_nSample,
                secondary_tile=cfg.secondary_tile,
                fast_march=bool(cfg.eval_fast),
                ndc_ray=bool(cfg.ndc_ray))
            print(f"======> {cfg.expname} train all: {results}")
        if cfg.render_path:
            render_orbit_path(cfg, fcfg, params, scene, n_samples, logfolder)
        return

    # ---- training ----
    from tensoir_tpu.train.loop import reconstruction

    train_dataset = build_dataset(cfg, "train")
    test_dataset = build_dataset(cfg, "test")

    def eval_cb(fcfg, params, scene, it, n_samples, logger=None):
        try:
            results = evaluation_iter(
                fcfg, params, scene, test_dataset,
                n_samples=n_samples,
                save_path=os.path.join(logfolder, "imgs_vis"),
                prtx=f"{it:06d}_", chunk=cfg.batch_size_test,
                n_vis=cfg.N_vis, compute_extra_metrics=False,
                second_n_sample=cfg.second_nSample,
                secondary_tile=cfg.secondary_tile,
                fast_march=bool(cfg.eval_fast),
                ndc_ray=bool(cfg.ndc_ray),
                logger=logger, log_step=it)
            print(f"[eval @{it}] {results}")
        except Exception as e:
            print(f"[eval @{it}] failed: {e}")

    result = reconstruction(
        cfg, train_dataset, log_dir=logfolder,
        eval_fn=eval_cb if cfg.N_vis != 0 else None,
        progress_cb=lambda it, m: print(
            f"it {it:06d} psnr {m.get('psnr', 0):.2f} "
            f"loss {m.get('total_loss', 0):.5f}", flush=True)
        if it % (cfg.progress_refresh_rate * 10) == 0 else None)

    import jax
    if cfg.render_test and jax.process_index() == 0:
        # process-0 gate (reference gates final eval to rank 0,
        # train_tensoIR.py:424-453); general multi-light: evaluate each
        # learned light separately with per-light output dirs
        # (train_tensoIR_general_multi_lights.py's final-eval loop);
        # other settings evaluate light 0
        light_indices = (range(cfg.light_num) if cfg.light_name_list
                         else [0])
        for li in light_indices:
            suffix = f"_light{li}" if cfg.light_name_list else ""
            results = evaluation_iter(
                result.fcfg, result.params, result.scene, test_dataset,
                n_samples=result.n_samples,
                save_path=os.path.join(logfolder, f"imgs_test_all{suffix}"),
                chunk=cfg.batch_size_test, test_all=True,
                second_n_sample=cfg.second_nSample,
                secondary_tile=cfg.secondary_tile,
                light_idx_to_test=li,
                fast_march=bool(cfg.eval_fast),
                ndc_ray=bool(cfg.ndc_ray))
            print(f"======> {cfg.expname} test all{suffix}: {results}")

    if cfg.render_train and jax.process_index() == 0:
        # render the train views (reference train_tensoIR.py:426-431)
        results = evaluation_iter(
            result.fcfg, result.params, result.scene,
            build_dataset(cfg, "train"),
            n_samples=result.n_samples,
            save_path=os.path.join(logfolder, "imgs_train_all"),
            chunk=cfg.batch_size_test, test_all=True,
            compute_extra_metrics=False,
            second_n_sample=cfg.second_nSample,
            secondary_tile=cfg.secondary_tile,
            fast_march=bool(cfg.eval_fast),
            ndc_ray=bool(cfg.ndc_ray))
        print(f"======> {cfg.expname} train all: {results}")

    if cfg.render_path and jax.process_index() == 0:
        render_orbit_path(cfg, result.fcfg, result.params, result.scene,
                          result.n_samples, logfolder)


if __name__ == "__main__":
    main()
