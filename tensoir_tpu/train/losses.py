"""Model-side regularizers (tensoRF_rotated_lights.py:60-92, utils.py:143-162)."""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def _line_ortho(line: jnp.ndarray) -> jnp.ndarray:
    """Mean |off-diagonal| of the line-factor Gram matrix
    (vectorDiffs, tensoRF_rotated_lights.py:60-69). line: [D, R]."""
    mat = line.T                                # [R, D]
    dotp = mat @ mat.T                          # [R, R]
    r = dotp.shape[0]
    off = dotp * (1.0 - jnp.eye(r, dtype=dotp.dtype))
    return jnp.sum(jnp.abs(off)) / (r * (r - 1))


def ortho_loss(params: Dict) -> jnp.ndarray:
    """vector_comp_diffs: density + appearance lines (tensoRF:71-72)."""
    total = 0.0
    for i in range(3):
        total = total + _line_ortho(params[f"density_line_{i}"])
        total = total + _line_ortho(params[f"app_line_{i}"])
    return total


def density_l1(params: Dict) -> jnp.ndarray:
    """mean|plane| + mean|line| over density factors (tensoRF:74-78)."""
    total = 0.0
    for i in range(3):
        if f"density_plane_{i}" in params:
            total = total + jnp.mean(jnp.abs(params[f"density_plane_{i}"]))
        total = total + jnp.mean(jnp.abs(params[f"density_line_{i}"]))
    return total


def _tv_plane(plane: jnp.ndarray) -> jnp.ndarray:
    """TVLoss on one [H, W, C] plane (utils.py:143-162 with batch=1)."""
    H, W, C = plane.shape
    count_h = C * (H - 1) * W
    count_w = C * H * (W - 1)
    h_tv = jnp.sum((plane[1:, :, :] - plane[:-1, :, :]) ** 2)
    w_tv = jnp.sum((plane[:, 1:, :] - plane[:, :-1, :]) ** 2)
    return 2.0 * (h_tv / count_h + w_tv / count_w)


def tv_loss_density(params: Dict) -> jnp.ndarray:
    """sum_i TV(density_plane_i) * 1e-2 (tensoRF:80-85)."""
    total = 0.0
    for i in range(3):
        if f"density_plane_{i}" in params:
            total = total + _tv_plane(params[f"density_plane_{i}"]) * 1e-2
    return total


def tv_loss_app(params: Dict) -> jnp.ndarray:
    total = 0.0
    for i in range(3):
        if f"app_plane_{i}" in params:
            total = total + _tv_plane(params[f"app_plane_{i}"]) * 1e-2
    return total
