"""Rotated multi-light end-to-end demo.

The analytic shadow scene lit by 3 azimuthal rotations of the same light —
exactly the rotated-lights capture assumption — trains the shared-SG +
rotation light model and the `light_line` multi-light factorization
(SURVEY.md §2.3). Reports per-light novel-view and BRDF PSNR.

Usage: python examples/train_multilight_demo.py [--iters 4000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=4000)
    parser.add_argument("--out", type=str, default="./log/multilight_demo")
    parser.add_argument("--img", type=int, default=96)
    parser.add_argument("--views", type=int, default=16)
    parser.add_argument("--batch", type=int, default=4096)
    parser.add_argument("--relight_cap", type=int, default=4096,
                        help="reference-faithful: relight every masked ray")
    # fast-march knob overrides for the knob x multilight bisection
    # (round 3: both multilight demos collapsed to inverted normals under
    # the canonical knobs while the single-light gates stayed healthy)
    parser.add_argument("--window", type=int, default=48)
    parser.add_argument("--window_back", type=int, default=16)
    parser.add_argument("--prepass", type=int, default=12)
    parser.add_argument("--dilate", type=int, default=3)
    parser.add_argument("--compact", type=float, default=0.5625)
    parser.add_argument("--app_bake", type=int, default=64)
    parser.add_argument("--bake_reso", type=int, default=128)
    parser.add_argument("--sec_stats", type=int, default=0)
    parser.add_argument("--fast_march_start", type=int, default=None,
                        help="iteration at which the lossy fast-march "
                             "knobs AND the full relight cap activate "
                             "(0 = from the start). Default: 0.6 x "
                             "--iters — the r4-proven curriculum flip "
                             "(BASELINE.md multilight fix; robust on the "
                             "[0.6, 0.7] plateau)")
    parser.add_argument("--brdf_warmup", type=int, default=0,
                        help="linear BRDF-weight ramp over the first N "
                             "relight iters (collapse guard on compressed "
                             "schedules — BASELINE.md r4 matrix reading; "
                             "0 = reference-exact constant weight)")
    parser.add_argument("--cap_start", type=int, default=512,
                        help="relight-cap curriculum: relight only this "
                             "many highest-acc rays until the "
                             "fast_march_start flip, then the full cap "
                             "(the r4-PROVEN collapse fix — MAE 4.54 at "
                             "cap 4096, BASELINE.md; 0 = off)")
    args = parser.parse_args(argv)

    from tensoir_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    from tensoir_tpu.utils.compile_cache import enable as _cc
    _cc()
    from tensoir_tpu.config import TensoIRConfig
    from tensoir_tpu.data.synthetic import SyntheticShadowDataset
    from tensoir_tpu.render.eval import evaluation_iter
    from tensoir_tpu.train.loop import reconstruction

    it = args.iters
    cfg = TensoIRConfig(
        expname="multilight_demo",
        basedir=args.out,
        n_iters=it,
        batch_size=args.batch,
        lr_decay_iters=it,
        N_voxel_init=64 ** 3,
        N_voxel_final=128 ** 3,
        upsamp_list=(int(it * 0.3),),
        update_AlphaMask_list=(int(it * 0.3), int(it * 0.45)),
        n_lamb_sigma=(16, 16, 16),
        n_lamb_sh=(48, 48, 48),
        light_rotation=("000", "120", "240"),
        light_kind="sg",
        numLgtSGs=64,
        envmap_h=8,
        envmap_w=16,
        second_nSample=96,
        rgb_brdf_weight=0.2,
        normals_diff_weight=0.0005,
        normals_orientation_weight=0.001,
        albedo_smoothness_loss_weight=0.001,
        roughness_smoothness_loss_weight=0.001,
        L1_weight_inital=8e-5,
        L1_weight_rest=4e-5,
        TV_weight_density=0.05,
        TV_weight_app=0.005,
        app_cap_per_ray=32,
        march_cap_primary=192,
        relight_ray_cap=args.relight_cap,
        # canonical fast-march knobs (quality-gated single-light,
        # BASELINE.md r2; CLI-overridable for the multilight bisection)
        secondary_bake_reso=args.bake_reso,
        second_window=args.window,
        second_window_back=args.window_back,
        second_prepass_n=args.prepass,
        coarse_dilate=args.dilate,
        secondary_compact_frac=args.compact,
        app_bake_reso=args.app_bake,
        secondary_stats=args.sec_stats,
        fast_march_start=(args.fast_march_start
                          if args.fast_march_start is not None
                          else int(it * 0.6)),
        rgb_brdf_warmup_iters=args.brdf_warmup,
        relight_cap_start=args.cap_start,
        secondary_tile=32768,
        vis_every=0, N_vis=0, save_iters=0,
        progress_refresh_rate=50,
    )

    train_ds = SyntheticShadowDataset(split="train", n_views=args.views,
                                      img_wh=(args.img, args.img),
                                      light_num=3)
    test_ds = SyntheticShadowDataset(split="test", n_views=3,
                                     img_wh=(args.img, args.img),
                                     light_num=3)

    t0 = time.time()
    result = reconstruction(
        cfg, train_ds, log_dir=args.out,
        progress_cb=lambda i, m: print(
            f"it {i:05d} psnr {m.get('psnr', 0):.2f} "
            f"brdf {m.get('loss_rgb_brdf', 0):.5f} "
            f"elapsed {m['elapsed_s']:.0f}s", flush=True))
    train_time = time.time() - t0

    all_metrics = {"train_time_s": train_time, "iters": it}
    for li in range(3):
        metrics = evaluation_iter(
            result.fcfg, result.params, result.scene, test_ds,
            n_samples=result.n_samples,
            save_path=os.path.join(args.out, f"eval_light{li}"),
            chunk=4096, test_all=True, compute_extra_metrics=False,
            second_n_sample=cfg.second_nSample,
            secondary_tile=cfg.secondary_tile,
            light_idx_to_test=li)
        all_metrics[f"light{li}"] = metrics
        print(f"light {li}: {metrics}", flush=True)
    print(json.dumps(all_metrics, indent=2))
    with open(os.path.join(args.out, "final_metrics.json"), "w") as f:
        json.dump(all_metrics, f, indent=2)


if __name__ == "__main__":
    main()
