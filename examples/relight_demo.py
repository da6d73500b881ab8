"""Relighting benchmark with TRUE ground truth.

Builds synthetic held-out HDR probes, renders exact env-lit ground truth of
the analytic shadow scene (lambertian + shadow visibility is closed-form),
and runs the importance-sampled relighting pipeline
(scripts/relight_importance.py machinery) against a trained checkpoint.

Usage:
  python examples/relight_demo.py --ckpt log/synthetic_demo/ckpt_final.npz
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_probes(out_dir: str, h: int = 16, w: int = 32):
    """Two synthetic HDR probes: a warm directional blob + a cool dual-blob."""
    from tensoir_tpu.data.hdr import write_hdr
    from tensoir_tpu.models.lighting import envmap_dirs

    _, dirs = envmap_dirs(h, w)
    dirs = dirs.reshape(h, w, 3)

    def blob(center_dir, sharp, color):
        d = np.asarray(center_dir, np.float64)
        d /= np.linalg.norm(d)
        dots = (dirs * d).sum(-1)
        return np.exp(sharp * (dots - 1.0))[..., None] * np.asarray(color)

    probes = {
        "sunset2": (0.10 + 3.0 * blob([0.6, 0.2, 0.75], 12,
                                      [1.0, 0.8, 0.55])).astype(np.float32),
        "twinlight": (0.06 + 2.0 * blob([-0.5, 0.5, 0.7], 18, [0.5, 0.7, 1.0])
                      + 1.5 * blob([0.7, -0.4, 0.6], 18,
                                   [1.0, 0.6, 0.4])).astype(np.float32),
    }
    os.makedirs(out_dir, exist_ok=True)
    for name, img in probes.items():
        write_hdr(os.path.join(out_dir, f"{name}.hdr"), img)
    return probes


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--out", type=str, default="./log/relight_demo")
    parser.add_argument("--img", type=int, default=96)
    parser.add_argument("--n_views", type=int, default=2)
    parser.add_argument("--chunk", type=int, default=1024)
    parser.add_argument("--n_light_samples", type=int, default=512)
    args = parser.parse_args(argv)

    from tensoir_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    from tensoir_tpu.utils.compile_cache import enable as _cc
    _cc()

    from tensoir_tpu.data.synthetic import SyntheticShadowDataset
    from tensoir_tpu.data.hdr import read_hdr
    from tensoir_tpu.models.env_light import EnvironmentLight
    from tensoir_tpu.models.field import grid_size_of
    from tensoir_tpu.models import lifecycle as LC
    from tensoir_tpu.render.relight_pipeline import relight_benchmark
    from tensoir_tpu.utils.ckpt import load_checkpoint

    hdr_dir = os.path.join(args.out, "probes")
    probes = make_probes(hdr_dir)
    env = EnvironmentLight(hdr_dir)

    fcfg, params, scene, _ = load_checkpoint(args.ckpt)
    n_samples = LC.cal_n_samples(grid_size_of(params), fcfg.step_ratio)

    base = SyntheticShadowDataset(split="test", n_views=args.n_views,
                                  img_wh=(args.img, args.img))

    class RelightGTDataset:
        """Per-view GT under each held-out probe (relighting_test contract)."""
        light_names = list(probes.keys())

        def __len__(self):
            return args.n_views

        def __getitem__(self, i):
            item = base[i]
            rays = np.asarray(item["rays"], np.float32)
            # WHITE-composited GT: the r4 metric-protocol fix computes
            # relight PSNR on the white-bg image (the reference's
            # load_rgba_white_composite protocol), so the GT must be
            # white-composited too — an env-bg GT against the white-bg
            # prediction craters PSNR on background pixels (this exact
            # mismatch produced the bogus 5.4/4.4 first r5 harvest)
            gt = [base.render_env_gt(rays, read_hdr(
                os.path.join(hdr_dir, f"{n}.hdr")), background="white")
                for n in self.light_names]
            item["rgbs"] = np.stack(gt, 0)
            return item

    results = relight_benchmark(
        fcfg, params, scene, RelightGTDataset(), env,
        n_samples=n_samples, save_path=args.out, chunk=args.chunk,
        n_light_samples=args.n_light_samples, second_n_sample=96,
        vis_tile=32768)
    print(json.dumps(results, indent=2))
    with open(os.path.join(args.out, "relight_metrics.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
