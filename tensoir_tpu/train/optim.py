"""Per-group Adam with exponential LR decay.

Mirrors the reference's optimizer setup (get_optparam_groups,
tensoRF_rotated_lights.py:33-57; decay train_tensoIR.py:197-201, 379-381):

  * spatial factors (planes/lines)     @ lr_init      (0.02)
  * basis matrix + shading MLPs        @ lr_basis     (1e-3)
  * light params (light_line, SGs/px)  @ 1e-3         (hardcoded upstream)
  * Adam(betas=(0.9, 0.99)); lr *= lr_decay_target_ratio**(1/decay_iters)
    every step; full reset (fresh Adam state + lr) at each upsample event.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax

SPATIAL_PREFIXES = ("density_plane", "density_line", "app_plane", "app_line",
                    # legacy stacked TensorVM shared factors: ONE lr group
                    # for density+app (tensoRF_init.py:17-22 puts the
                    # shared plane/line at lr_init_spatialxyz)
                    "stack_plane", "stack_line")
LIGHT_KEYS = ("light_line", "lgt_sgs", "light_pixel")


def param_group(name: str) -> str:
    if name.startswith(SPATIAL_PREFIXES):
        return "spatial"
    if name in LIGHT_KEYS:
        return "light"
    return "network"


def make_optimizer(params: Dict, lr_init: float, lr_basis: float,
                   lr_decay_factor: float, lr_light: float = 1e-3):
    """Build an optax transform; lr(step) = base * factor^step per group."""
    labels = {k: param_group(k) for k in params}

    def group_tx(base_lr: float):
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-8),
            optax.scale_by_schedule(
                lambda step: -base_lr * (lr_decay_factor ** step)),
        )

    return optax.multi_transform(
        {"spatial": group_tx(lr_init),
         "network": group_tx(lr_basis),
         "light": group_tx(lr_light)},
        param_labels=labels,
    )


def decay_factor(lr_decay_target_ratio: float, lr_decay_iters: int,
                 n_iters: int) -> float:
    """train_tensoIR.py:197-201."""
    iters = lr_decay_iters if lr_decay_iters > 0 else n_iters
    return lr_decay_target_ratio ** (1.0 / iters)
