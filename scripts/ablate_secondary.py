"""Fine-grained ablation of the secondary-shading pass (the 369ms/582ms
dominant cost per scripts/ablate_step.py) at bench.py's exact config.

Phases (all scalar-synced, stop_gradient semantics like the train step):
  sec_full       current secondary_shading_tiled (cap 1024 x 512 dirs)
  sec_vis_only   march + raw2alpha only, no indirect selection/appearance
  sec_no_app     full pipeline but app_pair_cap cut 16x (selection cost stays,
                 appearance eval ~0) — difference vs sec_full = appearance
  sec_n64        n_sample 96 -> 64
  sec_tile64k    tile 32768 -> 65536
  sec_bake96     bake reso 128 -> 96
  gather_sol     raw gather speed-of-light: 50.3M random rows from the same
                 packed table (count = pairs x n_sample)

Run detached on the TPU (CLAUDE.md: never under timeout):
  nohup python scripts/ablate_secondary.py > /tmp/ablate_sec.log 2>&1 &
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
    from tensoir_tpu.models import field as F
    from tensoir_tpu.models.lifecycle import update_alpha_mask
    from tensoir_tpu.render import secondary
    from tensoir_tpu.ops.compositing import raw2alpha
    from tensoir_tpu.ops.rays import sample_ray_equally, z_to_dists

    platform = jax.devices()[0].platform
    GRID, CAP = 200, 1024
    ENV_H, ENV_W, SECOND_N, TILE = 16, 32, 96, 32768
    MASK_RESO, BAKE = 128, 128
    if platform == "cpu":
        GRID, CAP = 48, 32
        ENV_H, ENV_W, SECOND_N, TILE = 4, 8, 16, 1024
        MASK_RESO, BAKE = 24, 24

    cfg = FieldConfig(density_n_comp=(16, 16, 16), app_n_comp=(48, 48, 48),
                      app_dim=27, shading_mode="MLP_Fea",
                      normals_kind="derived_plus_predicted", light_kind="sg",
                      num_sgs=128, envmap_h=ENV_H, envmap_w=ENV_W,
                      feature_c=128, step_ratio=0.5)
    aabb = np.array([[-1.5] * 3, [1.5] * 3], np.float32)
    params, scene = init_field_params(
        jax.random.PRNGKey(0), cfg, (GRID, GRID, GRID), aabb)
    for i in range(3):
        g = params[f"density_plane_{i}"]
        H, W, _ = g.shape
        yy, xx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                             indexing="ij")
        bump = np.exp(-((xx ** 2 + yy ** 2) / 0.18)).astype(np.float32)
        params[f"density_plane_{i}"] = g + 5.0 * jnp.asarray(bump)[..., None]
    scene, _ = update_alpha_mask(cfg, params, scene, (MASK_RESO,) * 3)

    L = ENV_H * ENV_W
    k = jax.random.PRNGKey(3)
    pts = jax.random.uniform(k, (CAP, 3), minval=-0.5, maxval=0.5)
    dirs = jax.random.normal(jax.random.PRNGKey(4), (CAP, L, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    lidx = jnp.zeros((CAP,), jnp.int32)
    pmask = jnp.ones((CAP, L), bool)

    n_iters = 8 if platform != "cpu" else 2

    def timeit(name, fn, sync):
        out = fn(0)
        sync(out)
        t0 = time.perf_counter()
        for i in range(n_iters):
            out = fn(i + 1)
        sync(out)
        ms = (time.perf_counter() - t0) / n_iters * 1e3
        print(json.dumps({"phase": name, "ms": round(ms, 1)}), flush=True)
        return ms

    def sec_fn(n_sample=SECOND_N, tile=TILE, bake=BAKE):
        return jax.jit(lambda p: secondary.secondary_shading_tiled(
            cfg, p, scene, pts, dirs, lidx, pmask,
            n_sample=n_sample, vis_near=0.05, vis_far=1.5,
            tile=tile, app_cap=16, march_cap=32,
            use_baked=True, bake_reso=bake))

    sync_vi = lambda vi: float(vi[0].ravel()[0])

    timeit("sec_full", lambda i, f=sec_fn(): f(params), sync_vi)

    # march-only visibility over all pairs (no indirect machinery at all)
    def vis_only(p):
        baked = jax.lax.stop_gradient(
            F.bake_packed_sigma_grid(cfg, p, scene, max_reso=BAKE))
        flat_pts = jnp.broadcast_to(pts[:, None, :], (CAP, L, 3)).reshape(-1, 3)
        flat_dirs = dirs.reshape(-1, 3)
        n_tiles = (CAP * L) // TILE

        def one_tile(args):
            o, d = args
            xyz, z_vals, valid = sample_ray_equally(
                o, d, scene["aabb"], 0.05, 1.5, SECOND_N)
            dst = z_to_dists(jnp.broadcast_to(z_vals, xyz.shape[:2]))
            coords = F.normalize_coord(scene["aabb"], xyz)
            feat = F.density_feature_packed(baked, coords)
            sigma = jnp.where(valid, F.feature2density(cfg, feat), 0.0)
            _, w, T = raw2alpha(sigma, dst * cfg.distance_scale)
            return T[..., 0]

        vis = jax.lax.map(one_tile, (flat_pts.reshape(n_tiles, TILE, 3),
                                     flat_dirs.reshape(n_tiles, TILE, 3)))
        return vis

    timeit("sec_vis_only", lambda i, f=jax.jit(vis_only): f(params),
           lambda v: float(v.ravel()[0]))

    # appearance cost: shrink pair cap 16x by shrinking what one_tile passes
    def sec_small_app(p):
        baked = jax.lax.stop_gradient(
            F.bake_packed_sigma_grid(cfg, p, scene, max_reso=BAKE))
        flat_pts = jnp.broadcast_to(pts[:, None, :], (CAP, L, 3)).reshape(-1, 3)
        flat_dirs = dirs.reshape(-1, 3)
        flat_lidx = jnp.broadcast_to(lidx[:, None], (CAP, L)).reshape(-1)
        n_tiles = (CAP * L) // TILE

        def one_tile(args):
            o, d, li = args
            nerv, _, ind = secondary.compute_radiance(
                cfg, p, scene, o, d, li,
                n_sample=SECOND_N, vis_near=0.05, vis_far=1.5,
                app_cap=16, app_pair_cap=TILE // 64, march_cap=32,
                baked=baked)
            return nerv, ind

        vis, ind = jax.lax.map(one_tile, (flat_pts.reshape(n_tiles, TILE, 3),
                                          flat_dirs.reshape(n_tiles, TILE, 3),
                                          flat_lidx.reshape(n_tiles, TILE)))
        return vis, ind

    timeit("sec_no_app", lambda i, f=jax.jit(sec_small_app): f(params),
           sync_vi)

    timeit("sec_n64", lambda i, f=sec_fn(n_sample=64): f(params), sync_vi)
    timeit("sec_tile64k", lambda i, f=sec_fn(tile=65536): f(params), sync_vi)
    timeit("sec_bake96", lambda i, f=sec_fn(bake=96): f(params), sync_vi)

    # raw gather speed-of-light on the same table shape
    baked = jax.jit(lambda p: F.bake_packed_sigma_grid(
        cfg, p, scene, max_reso=BAKE))(params)
    flat = baked.reshape(-1, baked.shape[-1])
    n_idx = CAP * L * SECOND_N
    idx = jax.random.randint(jax.random.PRNGKey(7), (n_idx,), 0,
                             flat.shape[0], dtype=jnp.int32)

    # pass the big arrays as ARGUMENTS: closure capture lowers them as HLO
    # constants, and a 200MB constant blows the axon remote-compile request
    # limit (HTTP 413 — see ablate_radiance.py)
    def raw_gather(table, ids, i):
        shifted = jnp.minimum(ids + i, table.shape[0] - 1)
        return jnp.take(table, shifted, axis=0).astype(jnp.float32).sum()

    g = jax.jit(raw_gather)
    ms = timeit("gather_sol", lambda i: g(flat, idx, jnp.int32(i)),
                lambda s: float(s))
    print(json.dumps({"phase": "gather_rows_per_s",
                      "value": round(n_idx / (ms / 1e3))}), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
