"""Coarse-to-fine lifecycle transforms (the "resharding events").

These run on the host between jit phases (SURVEY.md §3.4): each changes array
shapes, so the training step recompiles afterwards — mirroring the reference's
schedule (train_tensoIR.py:385-422):

* `update_alpha_mask` — dense alpha grid -> 3x3x3 max-pool dilate -> binarize
  -> tight new AABB (tensorBase_rotated_lights.py:737-779).
* `shrink` — slice every factor tensor to the new index box + AABB correction
  (tensoRF_rotated_lights.py:248-289).
* `upsample` — bilinear align_corners=True factor upsampling
  (tensoRF_rotated_lights.py:226-246).
* `filter_rays` — bbox-hit prefilter of the training ray buffer
  (tensorBase_rotated_lights.py:781-811).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensoir_tpu.models import field as F
from tensoir_tpu.models.field import MAT_MODE, VEC_MODE
from tensoir_tpu.ops.interp import (
    resize_bilinear_align_corners,
    resize_line_align_corners,
)


def n_to_reso(n_voxels: int, aabb) -> Tuple[int, int, int]:
    """Voxel count -> per-axis resolution (utils.py:58-61)."""
    aabb = np.asarray(aabb).reshape(2, 3)
    size = aabb[1] - aabb[0]
    voxel_size = (np.prod(size) / n_voxels) ** (1.0 / 3.0)
    return tuple(int(v) for v in (size / voxel_size))


def cal_n_samples(reso, step_ratio: float = 0.5) -> int:
    """(utils.py:63-64)."""
    return int(np.linalg.norm(np.asarray(reso, np.float64)) / step_ratio)


def voxel_schedule(n_init: int, n_final: int, n_upsamples: int):
    """Log-linear voxel-count schedule (train_tensoIR.py:209-210)."""
    return [int(round(v)) for v in np.exp(
        np.linspace(np.log(n_init), np.log(n_final), n_upsamples + 1))][1:]


def dense_alpha(cfg: F.FieldConfig, params: Dict, scene: Dict, grid_size):
    """Dense alpha grid [gx, gy, gz] + world points (getDenseAlpha,
    tensorBase_rotated_lights.py:737-753). Evaluated x-slice by x-slice
    under jit (one compile; slices share a shape)."""
    gx, gy, gz = (int(g) for g in grid_size)
    aabb = np.asarray(scene["aabb"])
    s = [np.linspace(0, 1, g, dtype=np.float32) for g in (gx, gy, gz)]
    model_grid = F.grid_size_of(params)
    step = F.step_size(scene["aabb"], model_grid, cfg.step_ratio)

    yy, zz = np.meshgrid(s[1], s[2], indexing="ij")

    @jax.jit
    def slice_alpha(x_scalar):
        sx = jnp.full_like(jnp.asarray(yy), x_scalar)
        samples = jnp.stack([sx, jnp.asarray(yy), jnp.asarray(zz)], -1)
        xyz = aabb[0] * (1.0 - samples) + aabb[1] * samples
        return F.compute_alpha_grid(cfg, params, scene,
                                    xyz.reshape(-1, 3), step).reshape(gy, gz)

    alpha = np.stack([np.asarray(slice_alpha(x)) for x in s[0]], 0)
    return alpha  # [gx, gy, gz]


def _maxpool3(alpha: np.ndarray) -> np.ndarray:
    """3x3x3 max-pool, stride 1, pad 1 (F.max_pool3d, tensorBase:764)."""
    a = jnp.asarray(alpha)[None, ..., None]  # NDHWC
    out = jax.lax.reduce_window(
        a, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 3, 1),
        window_strides=(1, 1, 1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    return np.asarray(out[0, ..., 0])


def update_alpha_mask(cfg: F.FieldConfig, params: Dict, scene: Dict,
                      grid_size):
    """Returns (new_scene, new_aabb [2,3] np) (updateAlphaMask,
    tensorBase_rotated_lights.py:755-779)."""
    alpha = dense_alpha(cfg, params, scene, grid_size)        # [gx, gy, gz]
    alpha = np.clip(alpha, 0, 1)
    alpha = _maxpool3(alpha)
    alpha = (alpha >= cfg.alpha_mask_thres).astype(np.float32)

    aabb = np.asarray(scene["aabb"])
    gx, gy, gz = alpha.shape
    s = [np.linspace(0, 1, g, dtype=np.float32) for g in (gx, gy, gz)]
    xs, ys, zs = np.meshgrid(s[0], s[1], s[2], indexing="ij")
    dense_xyz = (aabb[0][None, None, None] * (1 - np.stack([xs, ys, zs], -1))
                 + aabb[1][None, None, None] * np.stack([xs, ys, zs], -1))
    valid = alpha > 0.5
    if valid.any():
        valid_xyz = dense_xyz[valid]
        new_aabb = np.stack([valid_xyz.min(0), valid_xyz.max(0)])
    else:
        new_aabb = aabb.copy()

    scene = dict(scene)
    # storage layout [D=gz, H=gy, W=gx] for (x, y, z) trilinear queries
    # (reference transposes before wrapping in AlphaGridMask, tensorBase:759-768)
    vol = np.transpose(alpha, (2, 1, 0))
    scene["alpha_volume"] = jnp.asarray(vol)
    # one extra 3x3x3 dilation: nearest-neighbor culling on this volume is a
    # superset of the reference's trilinear > 0 test (field.py:
    # sample_alpha_mask_nearest)
    scene["alpha_volume_dilated"] = jnp.asarray(
        _maxpool3(vol).astype(np.uint8))
    scene["alpha_volume_packed"] = F.pack_corner_volume(jnp.asarray(vol))
    scene["alpha_aabb"] = jnp.asarray(aabb, jnp.float32)
    scene["has_alpha_mask"] = jnp.asarray(1.0, jnp.float32)
    return scene, new_aabb


def shrink(cfg: F.FieldConfig, params: Dict, scene: Dict, new_aabb):
    """Slice factors to the new AABB (tensoRF_rotated_lights.py:248-289).
    Returns (params, scene)."""
    aabb = np.asarray(scene["aabb"], np.float64)
    new_aabb = np.asarray(new_aabb, np.float64).reshape(2, 3)
    grid = np.asarray(F.grid_size_of(params), np.int64)      # (X, Y, Z)
    units = (aabb[1] - aabb[0]) / (grid - 1)

    t_l = np.round(np.round((new_aabb[0] - aabb[0]) / units)).astype(np.int64)
    b_r = np.round((new_aabb[1] - aabb[0]) / units).astype(np.int64) + 1
    b_r = np.minimum(b_r, grid)
    t_l = np.clip(t_l, 0, None)

    params = dict(params)
    # 'stack' covers the legacy shared-tensor TensorVM (decomp='vm_stacked')
    for name in ("density", "app", "stack"):
        for i in range(3):
            vec = VEC_MODE[i]
            if f"{name}_line_{i}" in params:
                params[f"{name}_line_{i}"] = params[f"{name}_line_{i}"][
                    t_l[vec]:b_r[vec], :]
            if f"{name}_plane_{i}" in params:
                m0, m1 = MAT_MODE[i]
                params[f"{name}_plane_{i}"] = params[f"{name}_plane_{i}"][
                    t_l[m1]:b_r[m1], t_l[m0]:b_r[m0], :]

    # AABB correction when the mask grid differs from the factor grid
    # (tensoRF_rotated_lights.py:278-284)
    mask_grid = np.asarray(scene["alpha_volume"].shape)[::-1]  # (X, Y, Z)
    if not np.all(mask_grid == grid):
        t_l_r = t_l / (grid - 1)
        b_r_r = (b_r - 1) / (grid - 1)
        corrected = np.zeros_like(new_aabb)
        corrected[0] = (1 - t_l_r) * aabb[0] + t_l_r * aabb[1]
        corrected[1] = (1 - b_r_r) * aabb[0] + b_r_r * aabb[1]
        new_aabb = corrected

    scene = dict(scene)
    scene["aabb"] = jnp.asarray(new_aabb, jnp.float32)
    return params, scene


def upsample(params: Dict, reso) -> Dict:
    """Bilinear align_corners=True factor upsampling
    (tensoRF_rotated_lights.py:226-246). reso: (X, Y, Z)."""
    reso = tuple(int(r) for r in reso)
    params = dict(params)
    for name in ("density", "app", "stack"):
        for i in range(3):
            vec = VEC_MODE[i]
            if f"{name}_line_{i}" in params:
                params[f"{name}_line_{i}"] = resize_line_align_corners(
                    params[f"{name}_line_{i}"], reso[vec])
            if f"{name}_plane_{i}" in params:
                m0, m1 = MAT_MODE[i]
                params[f"{name}_plane_{i}"] = resize_bilinear_align_corners(
                    params[f"{name}_plane_{i}"], (reso[m1], reso[m0]))
    return params


def filter_rays_bbox(all_rays: np.ndarray, aabb) -> np.ndarray:
    """Boolean keep-mask: ray hits the AABB (bbox_only mode,
    tensorBase_rotated_lights.py:794-800). Host-side numpy."""
    aabb = np.asarray(aabb).reshape(2, 3)
    rays_o = all_rays[:, :3]
    rays_d = all_rays[:, 3:6]
    vec = np.where(rays_d == 0, 1e-6, rays_d)
    rate_a = (aabb[1] - rays_o) / vec
    rate_b = (aabb[0] - rays_o) / vec
    t_min = np.minimum(rate_a, rate_b).max(-1)
    t_max = np.maximum(rate_a, rate_b).min(-1)
    return t_max > t_min


def filter_rays_mask(cfg: F.FieldConfig, scene: Dict, all_rays: np.ndarray,
                     n_samples: int = 256, chunk: int = 51200) -> np.ndarray:
    """Alpha-mask-occupancy ray filter (the bbox_only=False mode,
    tensorBase_rotated_lights.py:802-804): keep rays whose samples hit any
    occupied voxel. Chunked on the host."""
    import jax
    import jax.numpy as jnp
    from tensoir_tpu.ops.rays import sample_ray

    aabb = jnp.asarray(scene["aabb"])
    grid = np.asarray(scene["alpha_volume"].shape)
    step = F.step_size(aabb, tuple(int(g) for g in grid[::-1]),
                       cfg.step_ratio)

    @jax.jit
    def chunk_mask(rays):
        xyz, _, valid = sample_ray(rays[:, :3], rays[:, 3:6], aabb,
                                   cfg.near_far[0], cfg.near_far[1], step,
                                   n_samples, key=None)
        occ = F.sample_alpha_mask(scene, xyz) > 0
        return jnp.any(occ & valid, axis=-1)

    out = []
    n = all_rays.shape[0]
    for start in range(0, n, chunk):
        r = all_rays[start:start + chunk]
        pad = chunk - r.shape[0]
        if pad:
            r = np.concatenate([r, np.repeat(r[-1:], pad, 0)], 0)
        out.append(np.asarray(chunk_mask(jnp.asarray(r)))[:chunk - pad
                                                          if pad else chunk])
    return np.concatenate(out)[:n]
