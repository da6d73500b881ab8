"""Parity of the full physically-based relighting path vs the PyTorch
reference: render_with_BRDF + compute_secondary_shading_effects
(deterministic fixed_envirmap sampling) on identical weights.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_reference_parity import _install_stubs, REF  # noqa: E402


@pytest.fixture(scope="module")
def ref_mod():
    import os
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import models.relight_utils as RU
    from models.tensoRF_rotated_lights import TensorVMSplit
    # the reference hardcodes device='cuda' defaults deep inside
    # (sample_ray_equally, relight_utils.py:708) — force cpu for the test
    _orig = RU.sample_ray_equally

    def _cpu_sample_ray_equally(*a, **k):
        k["device"] = "cpu"
        return _orig(*a, **k)

    RU.sample_ray_equally = _cpu_sample_ray_equally
    return RU, TensorVMSplit


class _Args:
    second_nSample = 16
    second_near = 0.05
    second_far = 1.5


def test_render_with_brdf_parity(ref_mod):
    RU, TensorVMSplit = ref_mod
    import jax
    import jax.numpy as jnp
    from tests.test_reference_parity import _make_pair
    from tensoir_tpu.render.brdf_render import render_with_brdf

    cfg, params, scene, model = _make_pair(TensorVMSplit, light_num=1)
    with torch.no_grad():
        model.lgtSGs.copy_(torch.from_numpy(np.asarray(params["lgt_sgs"])))

    rng = np.random.default_rng(0)
    P = 6
    rays_o = np.zeros((P, 3), np.float32)
    rays_o[:, 2] = -4.0
    rays_d = rng.normal(size=(P, 3)).astype(np.float32) * 0.05
    rays_d[:, 2] = 1.0
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays = np.concatenate([rays_o, rays_d], -1)

    depth = rng.uniform(3.6, 4.2, P).astype(np.float32)
    normal = rng.normal(size=(P, 3)).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    albedo = rng.uniform(0.2, 0.9, (P, 3)).astype(np.float32)
    roughness = rng.uniform(0.1, 0.9, (P, 1)).astype(np.float32)
    fresnel = np.full((P, 3), 0.04, np.float32)
    lidx = np.zeros(P, np.int64)

    # --- reference ---
    ref_rgb = RU.render_with_BRDF(
        torch.from_numpy(depth),
        torch.from_numpy(normal),
        torch.from_numpy(albedo),
        torch.from_numpy(roughness),
        torch.from_numpy(fresnel),
        torch.from_numpy(rays),
        model,
        torch.from_numpy(lidx)[:, None],
        sample_method="fixed_envirmap",
        chunk_size=4096,
        device="cpu",
        use_linear2srgb=True,
        args=_Args(),
    ).detach().numpy()

    # --- ours (exact secondary path, dense caps) ---
    our_rgb = np.asarray(render_with_brdf(
        cfg, params, scene,
        jnp.asarray(depth), jnp.asarray(normal), jnp.asarray(albedo),
        jnp.asarray(roughness), jnp.asarray(fresnel), jnp.asarray(rays),
        jnp.asarray(lidx.astype(np.int32)),
        sample_method="fixed_envirmap", key=None,
        second_n_sample=16, second_near=0.05, second_far=1.5,
        secondary_tile=64, second_march_cap=0,
        secondary_use_baked=False))

    np.testing.assert_allclose(our_rgb, ref_rgb, atol=2e-3, rtol=1e-2)


def test_compute_radiance_parity(ref_mod):
    """Secondary visibility + indirect light vs relight_utils.compute_radiance."""
    RU, TensorVMSplit = ref_mod
    import jax.numpy as jnp
    from tests.test_reference_parity import _make_pair
    from tensoir_tpu.render.secondary import compute_radiance

    cfg, params, scene, model = _make_pair(TensorVMSplit, light_num=1)
    # boost density so transmittance is non-trivial
    with torch.no_grad():
        for i in range(3):
            model.density_plane[i].add_(0.8)
    params = dict(params)
    for i in range(3):
        params[f"density_plane_{i}"] = params[f"density_plane_{i}"] + 0.8

    rng = np.random.default_rng(1)
    N = 40
    pts = rng.uniform(-0.5, 0.5, (N, 3)).astype(np.float32)
    dirs = rng.normal(size=(N, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    lidx = np.zeros(N, np.int64)

    nerv_t, nerfactor_t, ind_t = RU.compute_radiance(
        model, torch.from_numpy(pts), torch.from_numpy(dirs),
        torch.from_numpy(lidx)[:, None], nSample=24,
        vis_near=0.05, vis_far=1.5, device="cpu")

    nerv_j, nerfactor_j, ind_j = compute_radiance(
        cfg, params, scene, jnp.asarray(pts), jnp.asarray(dirs),
        jnp.asarray(lidx.astype(np.int32)), n_sample=24,
        vis_near=0.05, vis_far=1.5, app_cap=0, march_cap=0)

    np.testing.assert_allclose(np.asarray(nerv_j), nerv_t.detach().numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(nerfactor_j),
                               nerfactor_t.detach().numpy(), atol=1e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ind_j), ind_t.detach().numpy(),
                               atol=1e-4, rtol=1e-2)
