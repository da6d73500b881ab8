"""CPU toy-scale pilot of the protocol-cost A/B (VERDICT r3 #5).

Trains the single-light shadow scene twice — FAST arm (canonical-ratio
lossy fast-march knobs: interval window, coarse visibility bake, baked
app feature) vs EXACT arm (no lossy knobs) — and evaluates BOTH under
the exact protocol eval (evaluation_iter defaults; eval_fast off). The
delta estimates the converged protocol-metric cost attributable to
training under the fast forward. Direction/magnitude-class signal only;
the 5k TPU arms (tpu_queue_r11_kickoff.sh stages 3-4) are the real
answer.

Usage:
  TENSOIR_PLATFORM=cpu python scripts/proto_ab_cpu.py [--iters 1500]
      [--arms fast,exact] [--out /tmp/proto_cpu]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from tensoir_tpu.utils.platform import apply_platform_override
    apply_platform_override()

    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=1500)
    parser.add_argument("--img", type=int, default=48)
    parser.add_argument("--views", type=int, default=8)
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--relight_cap", type=int, default=256)
    parser.add_argument("--arms", type=str, default="fast,exact")
    parser.add_argument("--out", type=str, default="/tmp/proto_cpu")
    args = parser.parse_args(argv)

    from tensoir_tpu.config import TensoIRConfig
    from tensoir_tpu.data.synthetic import SyntheticShadowDataset
    from tensoir_tpu.render.eval import evaluation_iter
    from tensoir_tpu.train.loop import reconstruction

    it = args.iters
    # toy-scale fast-march knobs at canonical ratios (window/nSample 0.5,
    # back 1/4 of window, prepass 12 / dilate 3 — the demo-scene
    # contract-legal pair; coarse bake at 2/3 of the final grid reso like
    # 128/200 canonical; app bake at 1/3 like 64/200)
    arms = {
        "fast": dict(second_window=16, second_window_back=4,
                     second_prepass_n=12, coarse_dilate=3,
                     secondary_bake_reso=32, app_bake_reso=16),
        "exact": dict(),
        # knob isolation for the albedo tax (r5: fast-vs-exact read
        # albedo -0.89 dB, the one above-noise delta — which knob?)
        "bake": dict(secondary_bake_reso=32, app_bake_reso=16),
        "win": dict(second_window=16, second_window_back=4,
                    second_prepass_n=12, coarse_dilate=3),
        # exact-finish recovery arm: full fast stack, knobs flip back OFF
        # for the last 15% (config.py:fast_march_end) — does the albedo
        # tax anneal away under an exact final phase?
        "fastend": dict(second_window=16, second_window_back=4,
                        second_prepass_n=12, coarse_dilate=3,
                        secondary_bake_reso=32, app_bake_reso=16,
                        fast_march_end=int(it * 0.85)),
    }

    train_ds = SyntheticShadowDataset(split="train", n_views=args.views,
                                      img_wh=(args.img, args.img))
    test_ds = SyntheticShadowDataset(split="test", n_views=2,
                                     img_wh=(args.img, args.img))

    results = {}
    for arm in args.arms.split(","):
        knobs = arms[arm]
        cfg = TensoIRConfig(
            expname=f"proto_{arm}",
            basedir=os.path.join(args.out, arm),
            n_iters=it,
            batch_size=args.batch,
            lr_decay_iters=it,
            N_voxel_init=24 ** 3,
            N_voxel_final=48 ** 3,
            upsamp_list=(int(it * 0.3),),
            update_AlphaMask_list=(int(it * 0.3), int(it * 0.45)),
            n_lamb_sigma=(8, 8, 8),
            n_lamb_sh=(24, 24, 24),
            light_rotation=("000",),
            light_kind="sg",
            numLgtSGs=32,
            envmap_h=4,
            envmap_w=8,
            second_nSample=32,
            nSamples=128,
            rgb_brdf_weight=0.2,
            normals_diff_weight=0.0005,
            normals_orientation_weight=0.001,
            albedo_smoothness_loss_weight=0.001,
            roughness_smoothness_loss_weight=0.001,
            L1_weight_inital=8e-5,
            L1_weight_rest=4e-5,
            TV_weight_density=0.05,
            TV_weight_app=0.005,
            app_cap_per_ray=16,
            march_cap_primary=96,
            relight_ray_cap=args.relight_cap,
            secondary_tile=4096,
            vis_every=0, N_vis=0, save_iters=0,
            progress_refresh_rate=100,
            **knobs,
        )
        t0 = time.time()
        res = reconstruction(
            cfg, train_ds, log_dir=os.path.join(args.out, arm),
            progress_cb=lambda i, m, arm=arm: print(
                f"[{arm}] it {i:05d} psnr {m.get('psnr', 0):.2f} "
                f"brdf {m.get('loss_rgb_brdf', 0):.5f}", flush=True))
        train_s = time.time() - t0
        # EXACT protocol eval for both arms (evaluation_iter defaults:
        # full march, no fast knobs — renderer.py:225-250 parity path)
        ev = evaluation_iter(
            res.fcfg, res.params, res.scene, test_ds,
            n_samples=res.n_samples, save_path=None, chunk=2048,
            test_all=True, second_n_sample=cfg.second_nSample,
            secondary_tile=cfg.secondary_tile)
        results[arm] = {
            "psnr_nvs": round(ev["psnr_nvs"], 2),
            "psnr_nvs_brdf": round(ev["psnr_nvs_brdf"], 2),
            "normal_mae_deg": round(ev["normal_mae_deg"], 2),
            "psnr_albedo_single": round(ev.get("psnr_albedo_single", 0.0), 2),
            "train_s": round(train_s, 1),
        }
        print(json.dumps({arm: results[arm]}), flush=True)

    if "exact" in results:
        for arm in [a for a in list(results) if a != "exact"]:
            results[f"{arm}_minus_exact"] = {
                k: round(results[arm][k] - results["exact"][k], 2)
                for k in ("psnr_nvs", "psnr_nvs_brdf", "normal_mae_deg",
                          "psnr_albedo_single")}
    print("FINAL:", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
