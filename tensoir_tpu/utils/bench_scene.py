"""Canonical benchmark scene seeding.

The throughput benchmark needs a mid-training-like occupancy structure:
the reference relights every acc>0.5 ray (renderer.py:86-107), so the
counted "visibility rays" are only honest if the benchmark rays actually
hit opaque geometry. Round-2 audit found the original plane-only density
bump produced a wisp (2/4096 rays acc-masked) — the secondary marches
were mostly empty space. This helper seeds a SOLID ellipsoidal blob by
bumping component 0 of the density planes AND lines (density is a
plane*line product: tensoRF_rotated_lights.py:95-110), giving a body that
fills the ray bundle.
"""
from __future__ import annotations

import numpy as np


def seed_solid_blob(params, amp: float = 8.0, sharp: float = 0.10):
    """In-place-style seeding: returns params with a solid center blob."""
    import jax.numpy as jnp

    for i in range(3):
        g = params[f"density_plane_{i}"]
        H, W, _ = g.shape
        yy, xx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                             indexing="ij")
        bump = np.exp(-((xx ** 2 + yy ** 2) / sharp)).astype(np.float32)
        g = g.at[..., 0].add(amp * jnp.asarray(bump))
        params[f"density_plane_{i}"] = g

        ln = params[f"density_line_{i}"]
        D, _ = ln.shape
        zz = np.linspace(-1, 1, D)
        lbump = np.exp(-(zz ** 2) / sharp).astype(np.float32)
        ln = ln.at[:, 0].add(jnp.asarray(lbump))
        params[f"density_line_{i}"] = ln
    return params


def bench_rays(batch: int, spread: float = 0.05, seed: int = 0):
    """Ray bundle from z=-4 aimed at the blob (most rays acc-masked)."""
    rng = np.random.default_rng(seed)
    o = np.zeros((batch, 3), np.float32)
    o[:, 2] = -4.0
    d = rng.normal(size=(batch, 3)).astype(np.float32) * spread
    d[:, 2] = 1.0
    return np.concatenate([o, d], -1)
