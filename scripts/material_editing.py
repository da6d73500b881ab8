"""Material-editing demo (pairs with tensoIR_material_editing_test loader).

Loads a checkpoint, renders the G-buffer, applies material edits (albedo
recolor / roughness scale), and re-renders under a held-out environment
light — the workflow behind the reference's material-editing figures (its
dataLoader/tensoIR_material_editing_test.py has no driver script upstream).

Usage:
  python scripts/material_editing.py --config configs/relighting_test/armadillo.txt \
      --ckpt ckpt.npz [--albedo_tint 1.0,0.3,0.3] [--roughness_scale 0.5]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--datadir", type=str, default=None)
    parser.add_argument("--hdrdir", type=str, default=None)
    parser.add_argument("--light", type=str, default="city")
    parser.add_argument("--albedo_tint", type=str, default="1,1,1")
    parser.add_argument("--roughness_scale", type=float, default=1.0)
    parser.add_argument("--out", type=str, default="./material_edit")
    parser.add_argument("--n_views", type=int, default=1)
    parser.add_argument("--chunk", type=int, default=1024)
    args = parser.parse_args(argv)

    from tensoir_tpu.utils.platform import apply_platform_override
    apply_platform_override()

    import jax
    import jax.numpy as jnp
    import imageio.v2 as imageio

    from tensoir_tpu.config import load_config
    from tensoir_tpu.data import get_dataset
    from tensoir_tpu.models.env_light import EnvironmentLight
    from tensoir_tpu.models.field import grid_size_of
    from tensoir_tpu.models import lifecycle as LC
    from tensoir_tpu.render.relight_pipeline import make_relight_chunk_fn
    from tensoir_tpu.utils.ckpt import load_checkpoint

    cfg = load_config(args.config) if args.config else None
    datadir = args.datadir or (cfg.datadir if cfg else None)
    hdrdir = args.hdrdir or (cfg.hdrdir if cfg else None)

    fcfg, params, scene, _ = load_checkpoint(args.ckpt)
    n_samples = LC.cal_n_samples(grid_size_of(params), fcfg.step_ratio)

    ds = get_dataset("tensoIR_material_editing_test")(
        datadir, hdrdir, split="test", light_names=[args.light], sub=args.n_views)
    env = EnvironmentLight(hdrdir)

    tint = np.asarray([float(v) for v in args.albedo_tint.split(",")],
                      np.float32)
    # material edits = scaling the decoded BRDF before the light integral:
    # the chunk fn's albedo-rescale input carries the tint; roughness is
    # scaled inside the renderer (roughness_scale hook).
    chunk_fn = make_relight_chunk_fn(
        fcfg, env, args.light, n_samples=n_samples,
        n_light_samples=256, second_n_sample=96,
        roughness_scale=args.roughness_scale)

    os.makedirs(args.out, exist_ok=True)
    key = jax.random.PRNGKey(0)
    for vi in range(len(ds)):
        item = ds[vi]
        W, H = item["img_wh"]
        rays = np.asarray(item["rays"], np.float32)
        outs = []
        n = rays.shape[0]
        for start in range(0, n, args.chunk):
            r = rays[start:start + args.chunk]
            pad = args.chunk - r.shape[0]
            if pad:
                r = np.concatenate([r, np.repeat(r[-1:], pad, 0)], 0)
            key, sub = jax.random.split(key)
            _, wbg, *_ = chunk_fn(params, scene, jnp.asarray(r), sub,
                                  jnp.asarray(tint))
            outs.append(np.asarray(wbg))
        img = np.concatenate(outs, 0)[:n].reshape(H, W, 3)
        path = os.path.join(args.out, f"edit_{vi:03d}_{args.light}.png")
        imageio.imwrite(path, (np.clip(img, 0, 1) * 255).astype(np.uint8))
        print("wrote", path)


if __name__ == "__main__":
    main()
