"""CLI relighting benchmark (scripts/relight_importance.py equivalent).

Loads a checkpoint, builds the held-out environment-light library from
--hdrdir, computes the global albedo rescale, and runs the importance-sampled
relighting eval over the 5 held-out env maps
(bridge/city/fireplace/forest/night by default).

Usage:
  python scripts/relight_importance.py --config configs/relighting_test/armadillo.txt \
      --ckpt log/.../ckpt_final.npz [--batch_size 1024]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from train_tensoir import parse_cli


LIGHT_NAMES = ["bridge", "city", "fireplace", "forest", "night"]


def main(argv=None):
    cfg = parse_cli(argv)

    from tensoir_tpu.utils.platform import apply_platform_override
    apply_platform_override()

    from tensoir_tpu.data import get_dataset
    from tensoir_tpu.models.env_light import EnvironmentLight
    from tensoir_tpu.models.field import grid_size_of
    from tensoir_tpu.models import lifecycle as LC
    from tensoir_tpu.render.eval import (
        compute_rescale_ratio, make_eval_chunk_fn,
    )
    from tensoir_tpu.render.relight_pipeline import relight_benchmark
    from tensoir_tpu.utils.ckpt import load_checkpoint

    fcfg, params, scene, extra = load_checkpoint(cfg.ckpt)
    n_samples = min(cfg.nSamples,
                    LC.cal_n_samples(grid_size_of(params), cfg.step_ratio))

    dataset = get_dataset("tensoIR_relighting_test")(
        cfg.datadir, cfg.hdrdir, split="test",
        light_names=LIGHT_NAMES, downsample=cfg.downsample_test,
        sub=cfg.test_number)
    env = EnvironmentLight(cfg.hdrdir)

    # global 3-channel albedo rescale (scripts/relight_importance.py:59-60)
    chunk_fn, chunk = make_eval_chunk_fn(
        fcfg, n_samples=n_samples, chunk=cfg.batch_size_test,
        is_relight=True, relight_ray_cap=1,  # G-buffer only: skip the integral
        second_n_sample=8, secondary_tile=1024)
    _, rescale3 = compute_rescale_ratio(chunk_fn, chunk, params, scene,
                                        dataset)
    print("three channels rescale ratio:", rescale3)

    logfolder = os.path.join(cfg.basedir, f"relight_{cfg.expname}")
    results = relight_benchmark(
        fcfg, params, scene, dataset, env,
        n_samples=n_samples, save_path=logfolder,
        chunk=cfg.batch_size, n_light_samples=512,
        second_n_sample=cfg.second_nSample,
        vis_tile=cfg.secondary_tile, rescale3=rescale3,
        seed=cfg.seed, fast_vis=cfg.relight_fast_vis,
        # LPIPS rows appear when converted weights are present
        # (scripts/convert_lpips_weights.py; reference utils.py:69-81)
        compute_extra_metrics=True)
    for name, r in results.items():
        print(f"{name}: {r}")


if __name__ == "__main__":
    main()
