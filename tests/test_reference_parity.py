"""Numerical parity vs the PyTorch reference (BASELINE.md: allclose on
rendered RGB and pixel gradients).

Loads the ACTUAL reference implementation from /root/reference (read-only) on
CPU, copies our parameters into it (layout conversion only), and asserts that
density features, appearance features, the full radiance forward pass, and
pixel gradients agree.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _install_stubs():
    """Stub the reference's missing deps (kornia, loguru) before import."""
    if "kornia" not in sys.modules:
        kornia = types.ModuleType("kornia")

        def create_meshgrid(h, w, normalized_coordinates=True):
            ys = torch.arange(h, dtype=torch.float32)
            xs = torch.arange(w, dtype=torch.float32)
            if normalized_coordinates:
                ys = ys / (h - 1) * 2 - 1
                xs = xs / (w - 1) * 2 - 1
            gy, gx = torch.meshgrid(ys, xs, indexing="ij")
            return torch.stack([gx, gy], -1)[None]

        kornia.create_meshgrid = create_meshgrid
        sys.modules["kornia"] = kornia
    if "loguru" not in sys.modules:
        loguru = types.ModuleType("loguru")

        class _L:
            def debug(self, *a, **k):
                pass

        loguru.logger = _L()
        sys.modules["loguru"] = loguru
    if "cv2" not in sys.modules:
        try:
            import cv2  # noqa: F401
        except ImportError:
            sys.modules["cv2"] = types.ModuleType("cv2")
    # bypass dataLoader/__init__.py (it imports torchvision via blender.py);
    # the model only needs dataLoader.ray_utils
    if "dataLoader" not in sys.modules:
        pkg = types.ModuleType("dataLoader")
        pkg.__path__ = [REF + "/dataLoader"]
        sys.modules["dataLoader"] = pkg


@pytest.fixture(scope="module")
def ref_model_cls():
    import os
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.tensoRF_rotated_lights import TensorVMSplit
    return TensorVMSplit


GRID = (24, 24, 24)
AABB = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
D_COMP = (4, 4, 4)
A_COMP = (8, 8, 8)
APP_DIM = 12


def _make_pair(ref_model_cls, light_num=2):
    """(jax cfg/params/scene, torch model) with identical parameters."""
    import jax
    from tensoir_tpu.models.field import FieldConfig, init_field_params

    cfg = FieldConfig(
        density_n_comp=D_COMP, app_n_comp=A_COMP, app_dim=APP_DIM,
        shading_mode="MLP_Fea", normals_kind="purely_predicted",
        light_kind="sg", light_num=light_num,
        light_rotations=tuple(120 * i for i in range(light_num)),
        num_sgs=16, envmap_h=4, envmap_w=8, feature_c=32, step_ratio=2.0,
    )
    params, scene = init_field_params(
        jax.random.PRNGKey(0), cfg, GRID, AABB)

    model = ref_model_cls(
        torch.tensor(AABB), list(GRID), "cpu",
        density_n_comp=list(D_COMP), appearance_n_comp=list(A_COMP),
        app_dim=APP_DIM, shadingMode="MLP_Fea",
        normals_kind="purely_predicted",
        light_rotation=[f"{120*i:03d}" for i in range(light_num)],
        light_kind="sg", numLgtSGs=16, envmap_h=4, envmap_w=8,
        featureC=32, step_ratio=2.0, pos_pe=2, view_pe=2, fea_pe=2,
        near_far=[2.0, 6.0],
    )

    with torch.no_grad():
        for i in range(3):
            # ours [H, W, R] -> ref [1, R, H, W]; lines [D, R] -> [1, R, D, 1]
            model.density_plane[i].copy_(torch.from_numpy(
                np.asarray(params[f"density_plane_{i}"])
            ).permute(2, 0, 1)[None])
            model.density_line[i].copy_(torch.from_numpy(
                np.asarray(params[f"density_line_{i}"])
            ).permute(1, 0)[None, :, :, None])
            model.app_plane[i].copy_(torch.from_numpy(
                np.asarray(params[f"app_plane_{i}"])
            ).permute(2, 0, 1)[None])
            model.app_line[i].copy_(torch.from_numpy(
                np.asarray(params[f"app_line_{i}"])
            ).permute(1, 0)[None, :, :, None])
        model.basis_mat.weight.copy_(
            torch.from_numpy(np.asarray(params["basis_mat"])).T)
        model.light_line.weight.copy_(
            torch.from_numpy(np.asarray(params["light_line"])))
        for (ws, layer) in (("1", 0), ("2", 2), ("3", 4)):
            model.renderModule.mlp[layer].weight.copy_(torch.from_numpy(
                np.asarray(params["render_mlp"][f"w{ws}"])).T)
            model.renderModule.mlp[layer].bias.copy_(torch.from_numpy(
                np.asarray(params["render_mlp"][f"b{ws}"])))
    return cfg, params, scene, model


def test_density_feature_parity(ref_model_cls):
    import jax.numpy as jnp
    from tensoir_tpu.models import field as F

    cfg, params, scene, model = _make_pair(ref_model_cls)
    rng = np.random.default_rng(0)
    coords = rng.uniform(-0.98, 0.98, (200, 3)).astype(np.float32)

    ref = model.compute_densityfeature(torch.from_numpy(coords))
    ours = F.density_feature(cfg, params, jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(),
                               atol=2e-5, rtol=1e-4)

    # second-order sampler path must agree too (relight_utils grid_sample)
    ref2 = model.compute_densityfeature_with_xyz_grad(
        torch.from_numpy(coords))
    np.testing.assert_allclose(np.asarray(ours), ref2.detach().numpy(),
                               atol=2e-5, rtol=1e-4)


def test_appearance_feature_parity(ref_model_cls):
    import jax.numpy as jnp
    from tensoir_tpu.models import field as F

    cfg, params, scene, model = _make_pair(ref_model_cls)
    rng = np.random.default_rng(1)
    coords = rng.uniform(-0.98, 0.98, (100, 3)).astype(np.float32)
    lidx = rng.integers(0, 2, 100).astype(np.int64)

    ref_rad, ref_intr = model.compute_bothfeature(
        torch.from_numpy(coords), torch.from_numpy(lidx)[:, None])
    our_rad, our_intr = F.both_features(cfg, params, jnp.asarray(coords),
                                        jnp.asarray(lidx.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(our_rad), ref_rad.detach().numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(our_intr), ref_intr.detach().numpy(),
                               atol=2e-5, rtol=1e-4)


def _test_rays(n=24):
    rng = np.random.default_rng(2)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = -4.0
    d = rng.normal(size=(n, 3)).astype(np.float32) * 0.08
    d[:, 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return np.concatenate([o, d], -1)


def test_radiance_forward_parity(ref_model_cls):
    import jax.numpy as jnp
    from tensoir_tpu.render.primary import render_rays

    cfg, params, scene, model = _make_pair(ref_model_cls)
    rays = _test_rays()
    lidx = np.zeros(rays.shape[0], np.int32)
    n_samples = 40

    ref_out = model(torch.from_numpy(rays),
                    torch.from_numpy(lidx.astype(np.int64))[:, None],
                    white_bg=True, is_train=False, is_relight=False,
                    N_samples=n_samples)
    ref_rgb, ref_depth = ref_out[0], ref_out[1]
    ref_acc = ref_out[6]

    ours = render_rays(cfg, params, scene, jnp.asarray(rays),
                       jnp.asarray(lidx), n_samples=n_samples, key=None,
                       is_train=False, is_relight=False, white_bg=True,
                       app_cap=0)
    np.testing.assert_allclose(np.asarray(ours["rgb_map"]),
                               ref_rgb.detach().numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ours["depth_map"]),
                               ref_depth.detach().numpy(), atol=1e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ours["acc_map"]),
                               ref_acc.detach().numpy(), atol=1e-4, rtol=1e-3)


def test_pixel_gradient_parity(ref_model_cls):
    """d(mse)/d(density_plane_0) matches between frameworks."""
    import jax
    import jax.numpy as jnp
    from tensoir_tpu.render.primary import render_rays

    cfg, params, scene, model = _make_pair(ref_model_cls)
    rays = _test_rays(16)
    lidx = np.zeros(rays.shape[0], np.int32)
    target = np.full((16, 3), 0.5, np.float32)
    n_samples = 32

    # torch side
    ref_out = model(torch.from_numpy(rays),
                    torch.from_numpy(lidx.astype(np.int64))[:, None],
                    white_bg=True, is_train=False, is_relight=False,
                    N_samples=n_samples)
    loss_t = ((ref_out[0] - torch.from_numpy(target)) ** 2).mean()
    loss_t.backward()
    ref_grad = model.density_plane[0].grad[0].permute(1, 2, 0).numpy()

    # jax side
    def loss_fn(p):
        out = render_rays(cfg, p, scene, jnp.asarray(rays),
                          jnp.asarray(lidx), n_samples=n_samples, key=None,
                          is_train=False, is_relight=False, white_bg=True,
                          app_cap=0)
        return jnp.mean((out["rgb_map"] - jnp.asarray(target)) ** 2)

    grads = jax.grad(loss_fn)(params)
    our_grad = np.asarray(grads["density_plane_0"])
    np.testing.assert_allclose(our_grad, ref_grad, atol=1e-6, rtol=1e-3)


def test_ggx_and_sg_parity(ref_model_cls):
    """SG env-map eval matches render_envmap_sg."""
    import jax.numpy as jnp
    from tensoir_tpu.models.lighting import render_envmap_sg as ours_sg

    cfg, params, scene, model = _make_pair(ref_model_cls)
    from models.tensorBase_rotated_lights import render_envmap_sg as ref_sg

    rng = np.random.default_rng(3)
    dirs = rng.normal(size=(50, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    sgs = np.asarray(params["lgt_sgs"])

    ref = ref_sg(torch.from_numpy(sgs), torch.from_numpy(dirs))
    got = ours_sg(jnp.asarray(sgs), jnp.asarray(dirs))
    np.testing.assert_allclose(np.asarray(got), ref.detach().numpy(),
                               atol=1e-4, rtol=1e-3)


def test_get_light_rgbs_parity(ref_model_cls):
    """Rotated-lights SG radiance per light matches get_light_rgbs."""
    import jax.numpy as jnp
    from tensoir_tpu.models.lighting import get_light_rgbs as ours_glr

    cfg, params, scene, model = _make_pair(ref_model_cls, light_num=3)
    with torch.no_grad():
        model.lgtSGs.copy_(torch.from_numpy(np.asarray(params["lgt_sgs"])))

    rng = np.random.default_rng(4)
    dirs = rng.normal(size=(30, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    ref = model.get_light_rgbs(torch.from_numpy(dirs), device="cpu")
    got = ours_glr(params, cfg, jnp.asarray(dirs))
    np.testing.assert_allclose(np.asarray(got), ref.detach().numpy(),
                               atol=1e-4, rtol=1e-3)
