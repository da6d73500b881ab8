"""A/B the grouped secondary march + baked app feature at the bench config.

Times the full train step (fwd+bwd+adam) for each variant, scalar-synced.
Run detached on the TPU (CLAUDE.md: never under timeout):
  nohup python scripts/ablate_group.py > /tmp/ablate_group.log 2>&1 &
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tensoir_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    from tensoir_tpu.utils.compile_cache import enable as _cc
    _cc()

    from tensoir_tpu.models.field import FieldConfig, init_field_params
    from tensoir_tpu.models.lifecycle import update_alpha_mask
    from tensoir_tpu.train.optim import make_optimizer
    from tensoir_tpu.train.step import LossWeights, StepStatic, make_train_step
    from tensoir_tpu.utils.bench_scene import bench_rays, seed_solid_blob

    import os
    platform = jax.devices()[0].platform
    B, GRID, N_SAMPLES, RELIGHT_CAP = 4096, 200, 700, 4096
    ENV_H, ENV_W, SECOND_N, TILE = 16, 32, 96, 32768
    MASK_RESO = 128
    # tunnel noise is ±5% run-to-run (BASELINE.md): widen via env when an
    # adoption decision rides on the delta, and interleave variants
    # (e.g. `ablate_group.py a b a b`) so drift averages out
    n_iters = int(os.environ.get("ABLATE_ITERS", "8"))
    if platform == "cpu":
        B, GRID, N_SAMPLES, RELIGHT_CAP = 256, 48, 64, 32
        ENV_H, ENV_W, SECOND_N, TILE = 4, 8, 16, 1024
        MASK_RESO = 24
        n_iters = 2

    cfg = FieldConfig(density_n_comp=(16, 16, 16), app_n_comp=(48, 48, 48),
                      app_dim=27, shading_mode="MLP_Fea",
                      normals_kind="derived_plus_predicted", light_kind="sg",
                      num_sgs=128, envmap_h=ENV_H, envmap_w=ENV_W,
                      feature_c=128, step_ratio=0.5)
    aabb = np.array([[-1.5] * 3, [1.5] * 3], np.float32)
    params, scene = init_field_params(
        jax.random.PRNGKey(0), cfg, (GRID, GRID, GRID), aabb)
    params = seed_solid_blob(params)
    scene, _ = update_alpha_mask(cfg, params, scene, (MASK_RESO,) * 3)

    optimizer = make_optimizer(params, 0.02, 1e-3, 0.999971)
    opt_state = optimizer.init(params)
    w = LossWeights(ortho=0.0, l1=4e-5, tv_density=0.0, tv_app=0.0,
                    lr_factor=0.999971, n_iters=80000, relight_start=10000)
    batch = {"rays": jnp.asarray(bench_rays(B)),
             "rgbs": jnp.full((B, 3), 0.5, jnp.float32),
             "light_idx": jnp.zeros((B,), jnp.int32)}
    key = jax.random.PRNGKey(1)

    base = dict(n_samples=N_SAMPLES, is_relight=True, white_bg=True,
                app_cap=32, relight_ray_cap=RELIGHT_CAP,
                march_cap=192, march_select="scatter",
                second_march_cap=32,
                secondary_use_baked=True, secondary_bake_reso=128,
                second_window=48 if platform != "cpu" else 16,
                second_window_back=16 if platform != "cpu" else 4,
                second_prepass_n=12, coarse_dilate=3,
                secondary_compact_frac=0.5625,
                second_n_sample=SECOND_N, secondary_tile=TILE)

    all_variants = {
        "canonical": {},
        "g2": {"second_march_group": 2},
        "g2_gb96": {"second_march_group": 2, "group_bake_reso": 96},
        "g4_gb64": {"second_march_group": 4, "group_bake_reso": 64},
        "ab64": {"app_bake_reso": 64},
        "ab96": {"app_bake_reso": 96},
        "g2_ab64": {"second_march_group": 2, "app_bake_reso": 64},
        "g4_gb64_ab64": {"second_march_group": 4, "group_bake_reso": 64,
                         "app_bake_reso": 64},
        "g4_gb96_ab96": {"second_march_group": 4, "group_bake_reso": 96,
                         "app_bake_reso": 96},
        # grouped PRIMARY march (exact by construction; tests/
        # test_grouped_primary.py) — alone, on the adopted ab64 canonical,
        # and on top of the (gate-rejected) full r2 A/B winner
        # round-3 profile follow-up: the secondary app stage costs ~21 ms
        # per app sample (~100x its gather+MLP cost) — suspected per-tile
        # kernel-sequencing overhead in the 36-iteration lax.map. Bigger
        # tiles halve the serial iterations at the same row count.
        "t64k_ab64": {"secondary_tile": 65536, "app_bake_reso": 64},
        "t128k_ab64": {"secondary_tile": 131072, "app_bake_reso": 64},
        "hoist_ab64": {"app_bake_reso": 64, "secondary_app_hoist": True},
        "hoist_t64k_ab64": {"app_bake_reso": 64, "secondary_app_hoist": True,
                            "secondary_tile": 65536},
        "pg4": {"march_group": 4},
        "ab64_pg4": {"app_bake_reso": 64, "march_group": 4},
        "g4_gb64_ab64_pg4": {"second_march_group": 4, "group_bake_reso": 64,
                             "app_bake_reso": 64, "march_group": 4},
        # round-3 trace follow-up (log/trace_r3, BASELINE.md): the app
        # stage is ROW-COUNT bound at the gather roofline, not
        # sequencing-bound — cut app rows. stats reports the cap
        # occupancancy/overflow telemetry; a tightened-cap variant whose
        # overflow stays 0 and whose loss matches canonical bit-for-bit
        # is EXACT on this scene (same pairs, same slots, zero-padded
        # float sums) — adoption then needs no quality gate.
        "stats_ab64": {"app_bake_reso": 64, "secondary_stats": True},
        "acap8_ab64": {"app_bake_reso": 64, "second_app_cap": 8,
                       "secondary_stats": True},
        "pf25_ab64": {"app_bake_reso": 64, "app_pair_frac": 0.25,
                      "secondary_stats": True},
        "pf12_ab64": {"app_bake_reso": 64, "app_pair_frac": 0.125,
                      "secondary_stats": True},
        "acap8_pf25_ab64": {"app_bake_reso": 64, "second_app_cap": 8,
                            "app_pair_frac": 0.25, "secondary_stats": True},
        "acap8_pf12_ab64": {"app_bake_reso": 64, "second_app_cap": 8,
                            "app_pair_frac": 0.125,
                            "secondary_stats": True},
        # conservative candidate from the trained-ckpt demand probe
        # (slot_demand_max 12, pair occupancy 0.59 of tile/2 —
        # /tmp/probe_demand.log): exact on the probe, margin for tiles
        "acap12_ab64": {"app_bake_reso": 64, "second_app_cap": 12,
                        "secondary_stats": True},
        "acap12_pf44_ab64": {"app_bake_reso": 64, "second_app_cap": 12,
                             "app_pair_frac": 0.4375,
                             "secondary_stats": True},
        "p8_ab64": {"app_bake_reso": 64, "second_prepass_n": 8},
        "t64k_p8_ab64": {"secondary_tile": 65536, "app_bake_reso": 64,
                         "second_prepass_n": 8},
        # final round-3 canonical candidate: p8 (adopted, loss-identical)
        # + the gated cap pair
        "acap12_pf44_p8_ab64": {"app_bake_reso": 64, "second_app_cap": 12,
                                "app_pair_frac": 0.4375,
                                "second_prepass_n": 8,
                                "secondary_stats": True},
    }
    import sys
    names = sys.argv[1:] or list(all_variants)[:8]
    variants = [(n, all_variants[n]) for n in names]
    if platform == "cpu":
        variants = variants[:2]

    for name, over in variants:
        st = StepStatic(**{**base, **over})
        # the train loop enforces the grouped-march contracts at phase
        # build and downgrades; direct StepStatic users must check too —
        # round-3 postmortem: an A/B timed g4 at group_bake 96 where the
        # group span (3 fine steps) exceeds the 96^3 cell, i.e. the
        # 27-corner block silently dropped weights (loss was off in the
        # 5th decimal). Refuse to time illegal combos.
        if st.second_march_group > 1:
            from tensoir_tpu.models import field as F
            gb = st.group_bake_reso or st.secondary_bake_reso or GRID
            cells = min(GRID, gb) - 1
            try:
                F.check_pair_contract(
                    np.asarray(scene["aabb"]), (cells - 1,) * 3,
                    n_sample=st.second_n_sample,
                    group=st.second_march_group)
            except ValueError as e:
                print(json.dumps({"variant": name,
                                  "skipped": f"contract: {e}"[:200]}),
                      flush=True)
                continue
        step_fn = make_train_step(cfg, optimizer, st, w, donate=False)
        m = step_fn(params, opt_state, scene, batch, key, jnp.asarray(0))[2]
        float(m["total_loss"])  # sync after compile+warmup
        t0 = time.perf_counter()
        for i in range(n_iters):
            m = step_fn(params, opt_state, scene, batch,
                        jax.random.fold_in(key, i + 1), jnp.asarray(i + 1))[2]
        loss = float(m["total_loss"])  # host sync
        ms = (time.perf_counter() - t0) / n_iters * 1e3
        rec = {"variant": name, "ms": round(ms, 1), "loss": round(loss, 6)}
        for sk in ("sec/app_pair_overflow_frac", "sec/app_pair_occupancy",
                   "sec/app_slot_occupancy", "sec/compact_overflow_frac",
                   "sec/app_slot_demand_max", "sec/app_slot_overflow_pairs"):
            if sk in m:
                rec[sk.split("/", 1)[1]] = round(float(m[sk]), 6)
        if "march_overflow_frac" in m:
            # exactness monitor for march_group (ADVICE r2): grouped
            # selection keeps cap/g occupied GROUPS, so overflow means up to
            # g x fewer occupied samples than the per-sample cap — adopt pg
            # variants only at ~0 overflow
            rec["march_overflow_frac"] = round(
                float(m["march_overflow_frac"]), 6)
        if over.get("march_group", 0) > 1:
            # note: the 16-corner packed copy is a 16x materialization of
            # each density plane per query (~90MB/plane at reso 300^2 x 16
            # comps) — if pg loses on-chip, the big-table gather penalty
            # (46 vs 84M rows/s) is the likely cause
            rec["note"] = "pg uses 16x packed density planes"
        print(json.dumps(rec), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
