"""Measure secondary app-stage cap occupancy on a TRAINED checkpoint.

The bench-scene telemetry drives the bench-config adoption; this probe
answers the quality-side question — what do app_pair_occupancy /
app_slot_demand_max look like on a real trained scene's surface points —
so tightened caps (second_app_cap / app_pair_frac) can be adopted into
the DEMO config with known overflow. CPU-safe (small batch).

  python scripts/probe_app_demand.py log/synthetic_demo_r3_20k/ckpt_final.npz
"""
from __future__ import annotations

import json
import sys

import numpy as np


def main():
    from tensoir_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    import jax
    import jax.numpy as jnp

    from tensoir_tpu.data.synthetic import SyntheticShadowDataset
    from tensoir_tpu.models.field import grid_size_of
    from tensoir_tpu.models.lifecycle import cal_n_samples
    from tensoir_tpu.render.primary import render_rays
    from tensoir_tpu.render.secondary import secondary_shading_tiled
    from tensoir_tpu.utils.ckpt import load_checkpoint
    from tensoir_tpu.models import lighting

    ckpt = sys.argv[1]
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cfg, params, scene, _ = load_checkpoint(ckpt)

    ds = SyntheticShadowDataset(split="test", n_views=2, img_wh=(64, 64))
    rng = np.random.default_rng(0)
    all_rays = np.asarray(ds.all_rays.reshape(-1, 6))
    sel = rng.choice(all_rays.shape[0], n_rays, replace=False)
    rays = jnp.asarray(all_rays[sel])
    lidx = jnp.zeros((n_rays,), jnp.int32)

    n_samples = min(1_000_000, cal_n_samples(grid_size_of(params), 0.5))
    ret = render_rays(cfg, params, scene, rays, lidx, n_samples=n_samples,
                      key=None, is_train=False, is_relight=True,
                      white_bg=True, app_cap=32, march_cap=192)
    acc_mask = np.asarray(ret["acc_map"] > 0.5)
    surf = (np.asarray(rays[:, :3])
            + np.asarray(ret["depth_map"])[:, None] * np.asarray(rays[:, 3:6]))
    surf = jnp.asarray(surf[acc_mask])
    P = int(surf.shape[0])
    print(json.dumps({"acc_masked": P, "of": n_rays}))
    if P == 0:
        return

    _, dirs = lighting.envmap_dirs(cfg.envmap_h, cfg.envmap_w)
    L = dirs.shape[0]
    surf2l = jnp.broadcast_to(jnp.asarray(dirs)[None], (P, L, 3))
    # cosine mask vs the rendered normals (matches render_with_brdf)
    normals = np.asarray(ret["normal_map"])[acc_mask]
    cosine = np.einsum("plk,pk->pl", np.asarray(surf2l), normals)
    mask = jnp.asarray(cosine > 1e-6)
    li = jnp.zeros((P,), jnp.int32)

    for tile, compact in ((4096, 0.5625), (4096, 0.0)):
        vis, ind, st = secondary_shading_tiled(
            cfg, params, scene, surf, surf2l, li, mask,
            n_sample=96, vis_near=0.05, vis_far=1.5, tile=tile,
            march_cap=32, app_cap=16, use_baked=True, bake_reso=128,
            window=48, window_back=16, prepass_n=12, coarse_dilate=3,
            compact_frac=compact, app_bake_reso=0,
            return_stats=True)
        out = {"tile": tile, "compact_frac": compact,
               **{k: round(float(v), 5) for k, v in st.items()}}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
