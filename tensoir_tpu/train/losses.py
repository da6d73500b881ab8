"""Model-side regularizers (tensoRF_rotated_lights.py:60-92, utils.py:143-162).

All three regularizers are decomp-aware: for the legacy stacked TensorVM
(decomp='vm_stacked') the density/appearance factors are channel slices of
one shared tensor per axis, and the reference applies vectorDiffs to each
slice separately (tensoRF_init.py:96-98: vectorDiffs(line_coef[:, -D:]) +
vectorDiffs(line_coef[:, :A])). Pass `cfg` to enable the sliced access;
cfg=None keeps the split-VM/CP behavior (dedicated param names).
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def _line_ortho(line: jnp.ndarray) -> jnp.ndarray:
    """Mean |off-diagonal| of the line-factor Gram matrix
    (vectorDiffs, tensoRF_rotated_lights.py:60-69). line: [grid, comps]."""
    mat = line.T                                # [comps, grid]
    dotp = mat @ mat.T                          # [comps, comps]
    r = dotp.shape[0]
    off = dotp * (1.0 - jnp.eye(r, dtype=dotp.dtype))
    return jnp.sum(jnp.abs(off)) / (r * (r - 1))


def _factors(params: Dict, cfg, name: str, i: int):
    """(plane, line) factors for field `name` ('density'|'app') on axis i,
    slicing the shared stacked tensor when decomp='vm_stacked'."""
    if cfg is not None and cfg.decomp == "vm_stacked":
        a = cfg.app_n_comp[i]
        sl = slice(None, a) if name == "app" else slice(a, None)
        return (params[f"stack_plane_{i}"][..., sl],
                params[f"stack_line_{i}"][..., sl])
    return params.get(f"{name}_plane_{i}"), params.get(f"{name}_line_{i}")


def ortho_loss(params: Dict, cfg=None) -> jnp.ndarray:
    """vector_comp_diffs: density + appearance lines (tensoRF:71-72;
    stacked variant tensoRF_init.py:96-98)."""
    total = 0.0
    for i in range(3):
        for name in ("density", "app"):
            _, line = _factors(params, cfg, name, i)
            if line is not None:
                total = total + _line_ortho(line)
    return total


def density_l1(params: Dict, cfg=None) -> jnp.ndarray:
    """mean|plane| + mean|line| over density factors (tensoRF:74-78)."""
    total = 0.0
    for i in range(3):
        plane, line = _factors(params, cfg, "density", i)
        if plane is not None:
            total = total + jnp.mean(jnp.abs(plane))
        if line is not None:
            total = total + jnp.mean(jnp.abs(line))
    return total


def _tv_plane(plane: jnp.ndarray) -> jnp.ndarray:
    """TVLoss on one [H, W, C] plane (utils.py:143-162 with batch=1)."""
    H, W, C = plane.shape
    count_h = C * (H - 1) * W
    count_w = C * H * (W - 1)
    h_tv = jnp.sum((plane[1:, :, :] - plane[:-1, :, :]) ** 2)
    w_tv = jnp.sum((plane[:, 1:, :] - plane[:, :-1, :]) ** 2)
    return 2.0 * (h_tv / count_h + w_tv / count_w)


def tv_loss_density(params: Dict, cfg=None) -> jnp.ndarray:
    """sum_i TV(density_plane_i) * 1e-2 (tensoRF:80-85)."""
    total = 0.0
    for i in range(3):
        plane, _ = _factors(params, cfg, "density", i)
        if plane is not None:
            total = total + _tv_plane(plane) * 1e-2
    return total


def tv_loss_app(params: Dict, cfg=None) -> jnp.ndarray:
    total = 0.0
    for i in range(3):
        plane, _ = _factors(params, cfg, "app", i)
        if plane is not None:
            total = total + _tv_plane(plane) * 1e-2
    return total
