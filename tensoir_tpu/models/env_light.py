"""Held-out environment-light library (Environment_Light,
relight_utils.py:110-205): per-HDR importance-sampling tables + lookups.

torch.multinomial becomes CDF inversion with searchsorted (per-point iid
draws under a shared CDF — identical distribution, static shapes).
"""
from __future__ import annotations

import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensoir_tpu.data.hdr import read_hdr
from tensoir_tpu.models.lighting import latlong_lookup


class EnvironmentLight:
    def __init__(self, hdr_dir: str):
        self.rgbs: Dict[str, jnp.ndarray] = {}
        self.pdf_return: Dict[str, jnp.ndarray] = {}
        self.cdf: Dict[str, jnp.ndarray] = {}
        self.dirs: Dict[str, jnp.ndarray] = {}
        self.uniform_cdf: Dict[str, jnp.ndarray] = {}
        self.uniform_pdf_return: Dict[str, jnp.ndarray] = {}

        for fname in sorted(os.listdir(hdr_dir)):
            if not fname.endswith(".hdr"):
                continue
            name = fname.split(".")[0]
            img = read_hdr(os.path.join(hdr_dir, fname))
            self.add_light(name, img)

    def add_light(self, name: str, img: np.ndarray):
        """Precompute pdf ∝ intensity * sin(theta) (relight_utils.py:125-148)."""
        H, W, _ = img.shape
        intensity = img.sum(-1)                                     # [H, W]
        h_int = 1.0 / H
        sin_theta = np.sin(np.linspace(0.5 * h_int, np.pi - 0.5 * h_int, H))
        pdf = intensity * sin_theta[:, None]
        pdf_sample = pdf / pdf.sum()
        pdf_return = pdf_sample * H * W / (2 * np.pi ** 2 * sin_theta[:, None])

        lat_step = np.pi / H
        lng_step = 2 * np.pi / W
        phi = np.linspace(np.pi / 2 - 0.5 * lat_step,
                          -np.pi / 2 + 0.5 * lat_step, H)
        theta = np.linspace(np.pi - 0.5 * lng_step, -np.pi + 0.5 * lng_step, W)
        phi, theta = np.meshgrid(phi, theta, indexing="ij")
        dirs = np.stack([np.cos(theta) * np.cos(phi),
                         np.sin(theta) * np.cos(phi), np.sin(phi)], -1)

        self.rgbs[name] = jnp.asarray(img, jnp.float32)
        self.pdf_return[name] = jnp.asarray(pdf_return.reshape(-1), jnp.float32)
        self.cdf[name] = jnp.asarray(np.cumsum(pdf_sample.reshape(-1)),
                                     jnp.float32)
        self.dirs[name] = jnp.asarray(dirs.reshape(-1, 3), jnp.float32)

        # per-light uniform tables: a shared table keyed off whichever HDR
        # loaded last breaks when lights differ in resolution (indices drawn
        # from one map's H*W-sized CDF would gather another map's dirs)
        uniform = np.ones_like(intensity) * sin_theta[:, None]
        u_pdf = uniform / uniform.sum()
        self.uniform_cdf[name] = jnp.asarray(np.cumsum(u_pdf.reshape(-1)),
                                             jnp.float32)
        self.uniform_pdf_return[name] = jnp.asarray(
            (u_pdf * H * W / (2 * np.pi ** 2 * sin_theta[:, None])).reshape(-1),
            jnp.float32)

    @property
    def light_names(self):
        return list(self.rgbs.keys())

    def sample_light(self, name: str, bs: int, num_samples: int, key,
                     sample_type: str = "importance"):
        """Per-surface-point light-dir draws (relight_utils.py:150-188).
        Returns (dir [bs,n,3], rgb [bs,n,3], pdf [bs,n,1])."""
        cdf = (self.cdf[name] if sample_type == "importance"
               else self.uniform_cdf[name])
        pdf_ret = (self.pdf_return[name] if sample_type == "importance"
                   else self.uniform_pdf_return[name])
        n_tex = cdf.shape[0]
        u = jax.random.uniform(key, (bs, num_samples))
        idx = jnp.clip(jnp.searchsorted(cdf, u.reshape(-1), side="right"),
                       0, n_tex - 1).reshape(bs, num_samples)
        light_dir = jnp.take(self.dirs[name], idx.reshape(-1),
                             axis=0).reshape(bs, num_samples, 3)
        light_rgb = jnp.take(self.rgbs[name].reshape(-1, 3), idx.reshape(-1),
                             axis=0).reshape(bs, num_samples, 3)
        light_pdf = jnp.take(pdf_ret, idx.reshape(-1)).reshape(
            bs, num_samples, 1)
        return light_dir, light_rgb, light_pdf

    def get_light(self, name: str, dirs):
        """Lat-long bilinear lookup, align_corners=True
        (relight_utils.py:193-205)."""
        return latlong_lookup(self.rgbs[name], dirs, align_corners=True,
                              padding="zeros")
