"""General-multi-lights E2E demo: three DISTINCT lights, each with its own
independent spherical-Gaussian set (per_light_sg — the
tensorBase_general_multi_lights.py:~100 `lgtSGs_list` setting), on the
analytic shadow scene. The companion rotated-lights soak
(train_multilight_demo.py) shares one SG set across rotations; this
exercises the other multi-light parameterization end-to-end.
Usage:  python examples/train_general_multilight_demo.py [--iters 4000]"""
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
    parser.add_argument("--out", type=str, default="./log/general_multilight_demo")
    parser.add_argument("--img", type=int, default=96)
    parser.add_argument("--views", type=int, default=16)
    parser.add_argument("--fast_march_start", type=int, default=None,
                        help="iteration at which the lossy fast-march "
                             "knobs AND the full relight cap activate "
                             "(0 = from the start). Default: 0.6 x "
                             "--iters — the r4-proven curriculum flip "
                             "(BASELINE.md)")
    parser.add_argument("--relight_cap", type=int, default=4096,
                        help="reference-faithful: relight every masked ray")
    parser.add_argument("--brdf_warmup", type=int, default=0,
                        help="linear BRDF-weight ramp over the first N "
                             "relight iters (collapse guard on compressed "
                             "schedules; 0 = reference-exact)")
    parser.add_argument("--lr_light", type=float, default=1e-3,
                        help="light-group lr (reference hardcodes 1e-3; "
                             "the r5 gap study scales it by the light "
                             "count for per-light SG sets)")
    parser.add_argument("--cap_start", type=int, default=512,
                        help="relight-cap curriculum: relight only this "
                             "many highest-acc rays until the "
                             "fast_march_start flip, then the full cap "
                             "(the r4-proven collapse fix; 0 = off)")
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
        expname="general_multilight_demo",
        basedir=args.out,
        n_iters=it,
        batch_size=4096,
        lr_decay_iters=it,
        N_voxel_init=64 ** 3,
        N_voxel_final=128 ** 3,
        upsamp_list=(int(it * 0.3),),
        update_AlphaMask_list=(int(it * 0.3), int(it * 0.45)),
        n_lamb_sigma=(16, 16, 16),
        n_lamb_sh=(48, 48, 48),
        light_name_list=("sunset", "noon", "dusk"),
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
        # canonical fast-march knobs (quality-gated, BASELINE.md r2)
        secondary_bake_reso=128,
        second_window=48,
        second_window_back=16,
        second_prepass_n=12,
        coarse_dilate=3,
        secondary_compact_frac=0.5625,
        app_bake_reso=64,
        fast_march_start=(args.fast_march_start
                          if args.fast_march_start is not None
                          else int(args.iters * 0.6)),
        rgb_brdf_warmup_iters=args.brdf_warmup,
        relight_cap_start=args.cap_start,
        lr_light=args.lr_light,
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
