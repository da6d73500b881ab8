"""Pin the relight GT background convention (r5 regression).

The relight metric protocol computes PSNR on the WHITE-bg image
(reference load_rgba_white_composite; r4 parity fix in
render/relight_pipeline.py), so benchmark GT must be white-composited.
The r5 first harvest read a bogus 5.4/4.4 PSNR because the demo GT was
still env-composited — this test pins the closed-form renderer's two
background modes so the mismatch cannot silently return.
"""
from __future__ import annotations

import numpy as np


def test_render_env_gt_background_conventions():
    from tensoir_tpu.data.synthetic import SyntheticShadowDataset

    ds = SyntheticShadowDataset(split="test", n_views=1, img_wh=(16, 16))
    rays = np.asarray(ds.view(0)["rays"], np.float32)[::4]
    env = np.random.default_rng(0).random((4, 8, 3)).astype(np.float32)

    g_env = ds.render_env_gt(rays, env, background="env")
    g_wht = ds.render_env_gt(rays, env, background="white")
    _, _, _, hit = ds._render_gt(rays[:, :3], rays[:, 3:6])
    hitm = hit > 0
    assert hitm.any() and (~hitm).any(), "fixture must cover fg and bg"
    # foreground shading is background-independent
    assert np.allclose(g_env[hitm], g_wht[hitm])
    # white mode: misses are exactly white (matches relight_without_bg's
    # where(acc, rgb, 1.0) — the metric-protocol image)
    assert np.allclose(g_wht[~hitm], 1.0)
    # env mode: misses sample the probe, not white
    assert not np.allclose(g_env[~hitm], 1.0)
