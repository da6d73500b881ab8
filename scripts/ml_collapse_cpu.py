"""CPU mini-reproduction of the multilight normal collapse (BASELINE.md r4).

Runs the multilight shadow-scene reconstruction at toy scale twice —
relight_cap == batch (reference-faithful full pressure) vs cap = batch/8
(the r2 low-pressure regime) — entirely on CPU, so the collapse mechanism
can be iterated on without the TPU tunnel. Optionally adds the
rgb_brdf_warmup arm.

Usage:
  TENSOIR_PLATFORM=cpu python scripts/ml_collapse_cpu.py [--iters 1500]
      [--arms full,low,warmup] [--out /tmp/ml_cpu]
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
    parser.add_argument("--warmup", type=int, default=450)
    parser.add_argument("--relight_frac", type=float, default=0.3,
                        help="relight start as a fraction of iters "
                             "(update_AlphaMask_list[0])")
    parser.add_argument("--grow_at", type=float, default=0.6,
                        help="'grow' arm: fraction of iters at which the "
                             "cap jumps to full reference pressure")
    parser.add_argument("--arms", type=str, default="full,low")
    parser.add_argument("--out", type=str, default="/tmp/ml_cpu")
    args = parser.parse_args(argv)

    from tensoir_tpu.config import TensoIRConfig
    from tensoir_tpu.data.synthetic import SyntheticShadowDataset
    from tensoir_tpu.render.eval import evaluation_iter
    from tensoir_tpu.train.loop import reconstruction

    it = args.iters
    arms = {
        # (relight_cap, rgb_brdf_warmup_iters)
        "full": (args.batch, 0),
        "low": (args.batch // 8, 0),
        "warmup": (args.batch, args.warmup),
        # confidence curriculum: small cap (top-k by acc = clean core
        # surface rays) until grow_at, then FULL reference pressure via a
        # full-state resume (Adam/schedule preserved; the cap is a static
        # knob so the rebuild machinery handles the shape change)
        "grow": (args.batch // 8, 0),
        # in-loop curriculum + AUTO flip (fast_march_start=-1) with the
        # PLATEAU criterion: the exact march probes what a toy-scale
        # window would truncate; the flip must fire at the scene's
        # residual floor (not the absolute 0.02 threshold, which ground
        # planes never clear) and grow the cap to full pressure.
        # Tunnel-free rehearsal of the r12 on-chip validation.
        "auto": (args.batch, 0),
        # ---- general-multilight gap study (VERDICT r4 #6) ----
        # demo-scale gap: general (per-light SGs) MAE 7.94 vs rotated
        # 4.54 under the same curriculum. All gen/rot arms run the SAME
        # in-loop curriculum (cap/8 core -> full at 0.6x + toy fast-march
        # knobs) so 'rot' is the control that must reproduce the gap.
        "rot": (args.batch, 0),
        "gen": (args.batch, 0),        # per-light SGs, stock lr/sg-count
        "gen_lr3": (args.batch, 0),    # light lr x3 (1/L gradient signal)
        "gen_sg2": (args.batch, 0),    # 2x SGs per light
        "gen_lr2": (args.batch, 0),    # bracket: lr x2
        "gen_lr5": (args.batch, 0),    # bracket: lr x5 (over-scaling?)
    }

    train_ds = SyntheticShadowDataset(split="train", n_views=args.views,
                                      img_wh=(args.img, args.img),
                                      light_num=3)
    test_ds = SyntheticShadowDataset(split="test", n_views=2,
                                     img_wh=(args.img, args.img),
                                     light_num=3)

    def make_cfg(arm, cap, warm, n_iters=None, ckpt=None, **extra):
        # extra is an intentional OVERRIDE channel: defaults first, then
        # extra wins — **extra-first splatting raised 'multiple values'
        # on any key that collides with an explicit default
        kw = dict(
            expname=f"ml_cpu_{arm}",
            basedir=os.path.join(args.out, arm),
            ckpt=ckpt,
            resume_full=ckpt is not None,
            n_iters=n_iters if n_iters is not None else it,
            batch_size=args.batch,
            lr_decay_iters=it,
            N_voxel_init=24 ** 3,
            N_voxel_final=48 ** 3,
            upsamp_list=(int(it * args.relight_frac),),
            update_AlphaMask_list=(int(it * args.relight_frac),
                                   int(it * min(args.relight_frac + 0.15,
                                                0.9))),
            n_lamb_sigma=(8, 8, 8),
            n_lamb_sh=(24, 24, 24),
            light_rotation=("000", "120", "240"),
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
            relight_ray_cap=cap,
            rgb_brdf_warmup_iters=warm,
            secondary_tile=4096,
            vis_every=0, N_vis=0, save_iters=0,
            progress_refresh_rate=100,
        )
        kw.update(extra)
        return TensoIRConfig(**kw)

    results = {}
    for arm in args.arms.split(","):
        cap, warm = arms[arm]
        t0 = time.time()

        def cb(i, m, arm=arm):
            print(f"[{arm}] it {i:05d} psnr {m.get('psnr', 0):.2f} "
                  f"brdf {m.get('loss_rgb_brdf', 0):.5f}", flush=True)

        if arm == "grow":
            # segment 1: small cap (confidence core) with the FULL-run
            # phase schedule, ended at grow_at; segment 2 resumes
            # full-state at full reference pressure
            seg_dir = os.path.join(args.out, arm)
            cfg1 = make_cfg(arm, cap, warm, n_iters=int(it * args.grow_at))
            reconstruction(cfg1, train_ds, log_dir=seg_dir,
                           progress_cb=cb)
            cfg = make_cfg(arm, args.batch, warm,
                           ckpt=os.path.join(seg_dir, "ckpt_final.npz"))
            res = reconstruction(cfg, train_ds, log_dir=seg_dir + "_seg2",
                                 progress_cb=cb)
        elif arm.startswith(("rot", "gen")):
            # fixed 0.6x-iters flip (the r4-proven demo curriculum) with
            # the toy-scale fast-march knobs; general arms swap the shared
            # rotated SG set for independent per-light sets via
            # light_name_list (loop.py:151 -> FieldConfig.per_light_sg)
            extra = dict(
                relight_cap_start=args.batch // 8,
                fast_march_start=int(it * args.grow_at),
                second_window=16, second_window_back=4,
                second_prepass_n=12, coarse_dilate=3)
            if arm != "rot":
                extra["light_name_list"] = ("l0", "l1", "l2")
            if arm.startswith("gen_lr"):
                extra["lr_light"] = 1e-3 * float(arm[len("gen_lr"):])
            if arm == "gen_sg2":
                extra["numLgtSGs"] = 64
            cfg = make_cfg(arm, cap, warm, **extra)
            res = reconstruction(
                cfg, train_ds, log_dir=os.path.join(args.out, arm),
                progress_cb=cb)
        elif arm == "auto":
            # toy-scale fast-march knobs sized to second_nSample=32
            # (canonical ratios: window/nSample 0.5, back 1/4 of window;
            # prepass 12 / dilate 3 = the demo-scene contract-legal pair)
            cfg = make_cfg(
                arm, cap, warm,
                relight_cap_start=args.batch // 8,
                fast_march_start=-1,
                # patience scaled to the compressed toy schedule
                # (500 default is sized for 4-5k-iter demos)
                fast_march_auto_patience=200,
                second_window=16, second_window_back=4,
                second_prepass_n=12, coarse_dilate=3,
                secondary_stats=1)
            res = reconstruction(
                cfg, train_ds, log_dir=os.path.join(args.out, arm),
                progress_cb=cb)
        else:
            cfg = make_cfg(arm, cap, warm)
            res = reconstruction(
                cfg, train_ds, log_dir=os.path.join(args.out, arm),
                progress_cb=cb)
        per_light = {}
        for li in range(3):
            per_light[f"light{li}"] = evaluation_iter(
                res.fcfg, res.params, res.scene, test_ds,
                n_samples=res.n_samples, light_idx_to_test=li,
                save_path=None, chunk=2048, test_all=True,
                second_n_sample=cfg.second_nSample,
                secondary_tile=cfg.secondary_tile)
        mae = per_light["light0"]["normal_mae_deg"]
        brdf = {k: round(v["psnr_nvs_brdf"], 2)
                for k, v in per_light.items()}
        results[arm] = {"normal_mae_deg": round(mae, 2), "brdf": brdf,
                        "cap_start": cap,
                        # grow trains segment 2 (and is evaluated) at the
                        # FULL cap — record both so the harvest rows are
                        # not read as constant-low-pressure runs
                        "cap_final": args.batch if arm == "grow" else cap,
                        "warmup": warm,
                        "train_s": round(time.time() - t0, 1)}
        print(json.dumps({arm: results[arm]}), flush=True)

    print("FINAL:", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
