"""Golden tests: tensoir_tpu ops vs PyTorch reference semantics.

Each test re-implements the reference math with torch (CPU) exactly as in
/root/reference and asserts allclose against our JAX ops.
"""
import numpy as np
import pytest
torch = pytest.importorskip("torch")
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from tensoir_tpu.ops import (
    bilerp_plane,
    lerp_line,
    trilerp_volume,
    resize_bilinear_align_corners,
    raw2alpha,
    linear2srgb,
    positional_encoding,
    ggx_specular,
    eval_sh_bases,
    sample_pdf,
)
from tensoir_tpu.ops.rays import safe_l2_normalize, aabb_ray_tmin, sample_ray_equally

RNG = np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _reseed_rng(request):
    # per-test deterministic reseed: each test's random data is
    # reproducible in isolation and independent of which tests ran before
    # (a shared sequentially-consumed RNG made single-test repro
    # impossible). crc32 of the test name: stable across processes.
    import zlib
    global RNG
    RNG = np.random.default_rng(zlib.crc32(request.node.name.encode()))
    yield


def test_bilerp_plane_matches_grid_sample():
    H, W, C = 17, 23, 8
    plane = RNG.standard_normal((H, W, C)).astype(np.float32)
    # in-domain coords (the reference normalizes into [-1,1])
    coords = RNG.uniform(-0.999, 0.999, size=(500, 2)).astype(np.float32)

    # torch: plane as [1, C, H, W], grid [1, N, 1, 2] with (x, y)
    t_plane = torch.from_numpy(plane).permute(2, 0, 1)[None]
    t_grid = torch.from_numpy(coords)[None, :, None, :]
    t_out = F.grid_sample(t_plane, t_grid, align_corners=True)  # [1, C, N, 1]
    t_out = t_out[0, :, :, 0].permute(1, 0).numpy()  # [N, C]

    j_out = bilerp_plane(jnp.asarray(plane), jnp.asarray(coords[:, 0]),
                         jnp.asarray(coords[:, 1]))
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-5, rtol=1e-5)


def test_lerp_line_matches_grid_sample():
    D, C = 31, 6
    line = RNG.standard_normal((D, C)).astype(np.float32)
    z = RNG.uniform(-0.999, 0.999, size=(200,)).astype(np.float32)

    # reference stores lines as [1, C, D, 1] and samples grid (0, z)
    t_line = torch.from_numpy(line).permute(1, 0)[None, :, :, None]
    grid = torch.stack(
        [torch.zeros_like(torch.from_numpy(z)), torch.from_numpy(z)], -1
    )[None, :, None, :]
    t_out = F.grid_sample(t_line, grid, align_corners=True)[0, :, :, 0]
    t_out = t_out.permute(1, 0).numpy()

    j_out = lerp_line(jnp.asarray(line), jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-5, rtol=1e-5)


def test_trilerp_matches_grid_sample_3d():
    D, H, W = 9, 11, 13
    vol = RNG.standard_normal((D, H, W)).astype(np.float32)
    coords = RNG.uniform(-0.999, 0.999, size=(300, 3)).astype(np.float32)

    # alpha-mask convention: F.grid_sample(vol[1,1,D,H,W], xyz[1,N,1,1,3])
    t_vol = torch.from_numpy(vol)[None, None]
    t_grid = torch.from_numpy(coords)[None, :, None, None, :]
    t_out = F.grid_sample(t_vol, t_grid, align_corners=True).reshape(-1).numpy()

    j_out = trilerp_volume(jnp.asarray(vol), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-5, rtol=1e-5)


def test_bilerp_align_corners_false():
    H, W, C = 16, 32, 3
    img = RNG.standard_normal((H, W, C)).astype(np.float32)
    coords = RNG.uniform(-0.95, 0.95, size=(200, 2)).astype(np.float32)

    t_img = torch.from_numpy(img).permute(2, 0, 1)[None]
    t_grid = torch.from_numpy(coords)[None, :, None, :]
    t_out = F.grid_sample(t_img, t_grid, align_corners=False)
    t_out = t_out[0, :, :, 0].permute(1, 0).numpy()

    j_out = bilerp_plane(jnp.asarray(img), jnp.asarray(coords[:, 0]),
                         jnp.asarray(coords[:, 1]), align_corners=False,
                         padding="zeros")
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-5, rtol=1e-5)


def test_resize_matches_interpolate():
    H, W, C = 12, 18, 5
    grid = RNG.standard_normal((H, W, C)).astype(np.float32)
    Hn, Wn = 25, 37
    t_out = F.interpolate(
        torch.from_numpy(grid).permute(2, 0, 1)[None], size=(Hn, Wn),
        mode="bilinear", align_corners=True,
    )[0].permute(1, 2, 0).numpy()
    j_out = resize_bilinear_align_corners(jnp.asarray(grid), (Hn, Wn))
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-5, rtol=1e-5)


def test_raw2alpha_matches_reference():
    sigma = np.abs(RNG.standard_normal((64, 100))).astype(np.float32)
    dist = np.abs(RNG.standard_normal((64, 100))).astype(np.float32) * 0.01

    t_sigma, t_dist = torch.from_numpy(sigma), torch.from_numpy(dist)
    alpha_t = 1.0 - torch.exp(-t_sigma * t_dist)
    T = torch.cumprod(
        torch.cat([torch.ones(alpha_t.shape[0], 1), 1.0 - alpha_t + 1e-10], -1), -1
    )
    weights_t = alpha_t * T[:, :-1]
    bg_t = T[:, -1:]

    alpha_j, weights_j, bg_j = raw2alpha(jnp.asarray(sigma), jnp.asarray(dist))
    np.testing.assert_allclose(np.asarray(alpha_j), alpha_t.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(weights_j), weights_t.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(bg_j), bg_t.numpy(), atol=1e-6)


def test_linear2srgb_matches_reference():
    x = RNG.uniform(0, 1, size=(1000,)).astype(np.float32)
    t = torch.from_numpy(x)
    lin = t * 12.92
    nonlin = 1.055 * torch.pow(t + 1e-6, 1 / 2.4) - 0.055
    expected = torch.where(t <= 0.0031308, lin, nonlin).numpy()
    got = np.asarray(linear2srgb(jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_positional_encoding_matches_reference():
    x = RNG.standard_normal((50, 3)).astype(np.float32)
    freqs = 4
    t = torch.from_numpy(x)
    bands = (2 ** torch.arange(freqs).float())
    pts = (t[..., None] * bands).reshape(t.shape[0], freqs * 3)
    expected = torch.cat([torch.sin(pts), torch.cos(pts)], dim=-1).numpy()
    got = np.asarray(positional_encoding(jnp.asarray(x), freqs))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def _torch_ggx(normal, pts2c, pts2l, roughness, fresnel):
    L = F.normalize(pts2l, dim=-1)
    V = F.normalize(pts2c, dim=-1)
    H = F.normalize((L + V[:, None, :]) / 2.0, dim=-1)
    N = F.normalize(normal, dim=-1)
    NoV = torch.sum(V * N, dim=-1, keepdim=True)
    N = N * NoV.sign()
    NoL = torch.sum(N[:, None, :] * L, dim=-1, keepdim=True).clamp_(1e-6, 1)
    NoV = torch.sum(N * V, dim=-1, keepdim=True).clamp_(1e-6, 1)
    NoH = torch.sum(N[:, None, :] * H, dim=-1, keepdim=True).clamp_(1e-6, 1)
    VoH = torch.sum(V[:, None, :] * H, dim=-1, keepdim=True).clamp_(1e-6, 1)
    alpha = roughness * roughness
    alpha2 = alpha * alpha
    k = (alpha + 2 * roughness + 1.0) / 8.0
    FMi = ((-5.55473) * VoH - 6.98316) * VoH
    frac0 = fresnel[:, None, :] + (1 - fresnel[:, None, :]) * torch.pow(2.0, FMi)
    frac = frac0 * alpha2[:, None, :]
    nom0 = NoH * NoH * (alpha2[:, None, :] - 1) + 1
    nom1 = NoV * (1 - k) + k
    nom2 = NoL * (1 - k[:, None, :]) + k[:, None, :]
    nom = (4 * np.pi * nom0 * nom0 * nom1[:, None, :] * nom2).clamp_(
        1e-6, 4 * np.pi
    )
    return frac / nom


def test_ggx_matches_reference():
    n, l = 40, 16
    normal = RNG.standard_normal((n, 3)).astype(np.float32)
    pts2c = RNG.standard_normal((n, 3)).astype(np.float32)
    pts2l = RNG.standard_normal((n, l, 3)).astype(np.float32)
    roughness = RNG.uniform(0.09, 0.99, (n, 1)).astype(np.float32)
    fresnel = np.full((n, 3), 0.04, np.float32)

    expected = _torch_ggx(
        torch.from_numpy(normal), torch.from_numpy(pts2c),
        torch.from_numpy(pts2l), torch.from_numpy(roughness),
        torch.from_numpy(fresnel),
    ).numpy()
    got = np.asarray(
        ggx_specular(jnp.asarray(normal), jnp.asarray(pts2c),
                     jnp.asarray(pts2l), jnp.asarray(roughness),
                     jnp.asarray(fresnel))
    )
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-4)


def test_sh_bases_deg2():
    dirs = RNG.standard_normal((30, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    got = np.asarray(eval_sh_bases(2, jnp.asarray(dirs)))
    # torch reference constants
    C0, C1 = 0.28209479177387814, 0.4886025119029199
    C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
          -1.0925484305920792, 0.5462742152960396]
    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    expected = np.stack([
        np.full_like(x, C0), -C1 * y, C1 * z, -C1 * x,
        C2[0] * x * y, C2[1] * y * z, C2[2] * (2 * z * z - x * x - y * y),
        C2[3] * x * z, C2[4] * (x * x - y * y),
    ], -1)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_grid_sample_twice_differentiable():
    """The derived-normals path needs grad-of-grad through the sampler
    (reference works around torch's missing 2nd-order grid_sample grad,
    relight_utils.py:57-107). In JAX it must compose for free."""
    plane = jnp.asarray(RNG.standard_normal((8, 8, 4)).astype(np.float32))

    def f(c):
        return bilerp_plane(plane, c[..., 0], c[..., 1]).sum()

    c = jnp.asarray(RNG.uniform(-0.9, 0.9, (10, 2)).astype(np.float32))
    g = jax.grad(f)(c)
    assert np.isfinite(np.asarray(g)).all()

    # second order: grad of (grad-norm) wrt plane params
    def loss(p):
        g = jax.grad(lambda c: bilerp_plane(p, c[..., 0], c[..., 1]).sum())(c)
        return (g ** 2).sum()

    h = jax.grad(loss)(plane)
    assert np.isfinite(np.asarray(h)).all()


def test_safe_normalize_matches_reference():
    x = RNG.standard_normal((100, 3)).astype(np.float32) * 0.001
    expected = F.normalize(torch.from_numpy(x), p=2, dim=-1, eps=1e-6).numpy()
    got = np.asarray(safe_l2_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_aabb_tmin_matches_reference():
    aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
    rays_o = RNG.standard_normal((64, 3)).astype(np.float32) * 4
    rays_d = RNG.standard_normal((64, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)

    t_o, t_d = torch.from_numpy(rays_o), torch.from_numpy(rays_d)
    t_aabb = torch.from_numpy(aabb)
    vec = torch.where(t_d == 0, torch.full_like(t_d, 1e-6), t_d)
    rate_a = (t_aabb[1] - t_o) / vec
    rate_b = (t_aabb[0] - t_o) / vec
    expected = torch.minimum(rate_a, rate_b).amax(-1).clamp(min=2.0, max=6.0).numpy()

    got = np.asarray(
        aabb_ray_tmin(jnp.asarray(rays_o), jnp.asarray(rays_d),
                      jnp.asarray(aabb), 2.0, 6.0)
    )
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_sample_ray_equally_shapes():
    aabb = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], jnp.float32)
    o = jnp.zeros((7, 3))
    d = jnp.asarray(np.tile([0.0, 0.0, 1.0], (7, 1)), jnp.float32)
    xyz, z, valid = sample_ray_equally(o, d, aabb, 0.05, 1.5, 96)
    assert xyz.shape == (7, 96, 3)
    assert z.shape == (1, 96)
    assert bool(valid.all())


def test_sample_pdf_deterministic():
    bins = jnp.asarray(np.linspace(0, 1, 9, dtype=np.float32)[None].repeat(4, 0))
    weights = jnp.asarray(np.abs(RNG.standard_normal((4, 8))).astype(np.float32))
    s = sample_pdf(bins, weights, 16)
    assert s.shape == (4, 16)
    s_np = np.asarray(s)
    assert (np.diff(s_np, axis=-1) >= -1e-6).all()
    assert (s_np >= 0).all() and (s_np <= 1).all()


def test_safe_normalize_grad_finite_at_zero():
    """Backward through normalize at exactly-zero vectors must be 0, not NaN
    (zero vectors occur for empty samples' derived normals and grazing half
    vectors; a single NaN would poison all parameters through the loss)."""
    def f(x):
        return jnp.sum(safe_l2_normalize(x) * jnp.asarray([1.0, 2.0, 3.0]))

    g = jax.grad(f)(jnp.zeros((3,)))
    assert np.isfinite(np.asarray(g)).all()

    # mixed batch: one zero row, one normal row
    def fb(x):
        return jnp.sum(safe_l2_normalize(x, axis=-1))

    x = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 2.0, 2.0]])
    gb = jax.grad(fb)(x)
    assert np.isfinite(np.asarray(gb)).all()


def test_bilerp_plane_packed_matches_bilerp():
    """Corner-packed single-gather plane interp == 4-corner bilerp, for
    values, grads w.r.t. grid, and 1st/2nd-order grads w.r.t. coords."""
    import jax
    import jax.numpy as jnp
    from tensoir_tpu.ops.interp import bilerp_plane, bilerp_plane_packed

    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.normal(size=(9, 7, 5)).astype(np.float32))
    x = jnp.asarray(rng.uniform(-1, 1, (64,)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (64,)).astype(np.float32))

    a = bilerp_plane(plane, x, y)
    b = bilerp_plane_packed(plane, x, y)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    ga = jax.grad(lambda p: jnp.sum(jnp.tanh(bilerp_plane(p, x, y))))(plane)
    gb = jax.grad(lambda p: jnp.sum(jnp.tanh(bilerp_plane_packed(p, x, y))))(plane)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-6)

    gxa = jax.grad(lambda xx: jnp.sum(bilerp_plane(plane, xx, y) ** 2))(x)
    gxb = jax.grad(lambda xx: jnp.sum(bilerp_plane_packed(plane, xx, y) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gxa), np.asarray(gxb), atol=1e-4,
                               rtol=1e-4)

    # second order w.r.t. coords (derived-normals-in-loss path)
    hxa = jax.grad(lambda xx: jnp.sum(
        jax.grad(lambda x2: jnp.sum(bilerp_plane(plane, x2, y) ** 2))(xx) ** 2))(x)
    hxb = jax.grad(lambda xx: jnp.sum(
        jax.grad(lambda x2: jnp.sum(bilerp_plane_packed(plane, x2, y) ** 2))(xx) ** 2))(x)
    np.testing.assert_allclose(np.asarray(hxa), np.asarray(hxb), atol=1e-3,
                               rtol=1e-3)


def test_lerp_line_matmul_matches_lerp():
    import jax
    import jax.numpy as jnp
    from tensoir_tpu.ops.interp import lerp_line, lerp_line_matmul

    rng = np.random.default_rng(1)
    line = jnp.asarray(rng.normal(size=(11, 6)).astype(np.float32))
    z = jnp.asarray(rng.uniform(-1, 1, (64,)).astype(np.float32))

    a = lerp_line(line, z)
    b = lerp_line_matmul(line, z)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    ga = jax.grad(lambda l: jnp.sum(jnp.tanh(lerp_line(l, z))))(line)
    gb = jax.grad(lambda l: jnp.sum(jnp.tanh(lerp_line_matmul(l, z))))(line)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-6)

    gza = jax.grad(lambda zz: jnp.sum(lerp_line(line, zz) ** 2))(z)
    gzb = jax.grad(lambda zz: jnp.sum(lerp_line_matmul(line, zz) ** 2))(z)
    np.testing.assert_allclose(np.asarray(gza), np.asarray(gzb), atol=1e-5)


def test_pack_corner_volume_matches_trilerp():
    import jax.numpy as jnp
    from tensoir_tpu.models.field import (pack_corner_volume,
                                          density_feature_packed)
    from tensoir_tpu.ops.interp import trilerp_volume

    rng = np.random.default_rng(2)
    vol = jnp.asarray((rng.random((7, 6, 5)) > 0.5).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.0, 1.0, (128, 3)).astype(np.float32))
    a = trilerp_volume(vol, coords)
    b = density_feature_packed(pack_corner_volume(vol, jnp.float32), coords)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # Out of [-1, 1] the packed variant border-clamps while trilerp_volume
    # extrapolates on the negative side, so values (and even > 0 decisions)
    # can differ there. That is outside the contract: every sample_alpha_mask
    # call site first gates samples on AABB validity (ops/rays.py sample_ray*
    # `valid` masks), so mask queries are only consumed in-range.
