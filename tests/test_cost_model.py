"""Cost-model + spherical-convention unit tests."""
import numpy as np

from tensoir_tpu.utils import cost_model as CM


def test_gather_rows_breakdown_matches_total():
    rows = CM.gather_rows_per_step(
        batch=4096, n_samples=700, march_cap=192, march_group=1,
        app_cap=32, relight_cap=4096, n_dirs=512, compact_frac=0.5625,
        tile=32768, window=48, prepass_n=12)
    b = rows.breakdown
    # dominant terms are the ones the design optimizes: the secondary
    # window march and prepass on the compacted pair set
    total_pairs = 4096 * 512
    marched = -(-int(total_pairs * 0.5625) // 32768) * 32768
    assert b["secondary_window_march"] == marched * 48
    assert b["secondary_prepass"] == marched * 12
    assert b["primary_mask_march"] == 4096 * 700
    assert b["primary_density_fwd"] == 4096 * 192 * 3
    # scatter rows = differentiable forward gather rows (density + app VJP)
    assert rows.scatter_rows == b["primary_density_fwd"] + b["primary_app_fwd"]
    # window rows are priced separately (big baked table, slower gather)
    assert rows.window_rows == b["secondary_window_march"]
    assert rows.gather_rows == sum(
        v for k, v in b.items()
        if k not in ("primary_vjp_scatter", "secondary_window_march"))
    # 128^3 bf16 corner-packed bake = ~33MB -> mid-table gather rate
    assert 20e6 < rows.window_table_bytes < 100e6
    assert rows.predicted_step_s() > 0


def test_dense_march_rows_when_cap_exceeds_samples():
    """CPU-smoke configs disable the cull (march_cap >= n_samples); the
    model must charge the dense march, not the fictional culled one."""
    rows = CM.gather_rows_per_step(
        batch=256, n_samples=64, march_cap=192, march_group=1, app_cap=8,
        relight_cap=64, n_dirs=32, compact_frac=0.0, tile=1024,
        window=8, prepass_n=4)
    assert rows.breakdown["primary_mask_march"] == 0
    assert rows.breakdown["primary_density_fwd"] == 256 * 64 * 3
    assert rows.breakdown["primary_mask_exact"] == 256 * 64


def test_grouping_divides_density_rows():
    base = CM.gather_rows_per_step(
        batch=128, n_samples=64, march_cap=32, march_group=1, app_cap=8,
        relight_cap=64, n_dirs=32, compact_frac=0.0, tile=512,
        window=8, prepass_n=4)
    grouped = CM.gather_rows_per_step(
        batch=128, n_samples=64, march_cap=32, march_group=4, app_cap=8,
        relight_cap=64, n_dirs=32, compact_frac=0.0, tile=512,
        window=8, prepass_n=4)
    assert (grouped.breakdown["primary_density_fwd"] * 4
            == base.breakdown["primary_density_fwd"])


def test_device_peaks_fallback_and_match():
    class Fake:
        device_kind = "TPU v5e"
    label, fl, bw = CM.device_peaks(Fake())
    assert fl == 197e12 and bw == 819e9

    class Unknown:
        device_kind = "mystery"
    label, fl, bw = CM.device_peaks(Unknown())
    assert "assumed" in label


def test_compiled_cost_on_trivial_fn():
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    cost = CM.compiled_cost(f, x)
    # CPU backend exposes flops; if a backend doesn't, None is the contract
    if cost is not None:
        assert cost["flops"] > 0


def test_sph2cart_conventions_roundtrip():
    """Golden vs the reference math (relight_utils.py:537-593): lat-lng
    z = r sin(lat); theta-phi converts through lat = pi/2 - theta."""
    from tensoir_tpu.ops.rays import convert_sph_conventions, sph2cart
    rng = np.random.default_rng(0)
    n = 64
    r = rng.uniform(0.5, 2.0, n)
    lat = rng.uniform(-np.pi / 2, np.pi / 2, n)
    lng = rng.uniform(-np.pi, np.pi, n)
    sph = np.stack([r, lat, lng], -1)
    cart = sph2cart(sph, "lat-lng")
    np.testing.assert_allclose(np.linalg.norm(cart, axis=-1), r, rtol=1e-6)
    np.testing.assert_allclose(cart[:, 2], r * np.sin(lat), rtol=1e-6)

    # theta-phi -> lat-lng -> theta-phi is the identity on [0,pi]x[0,2pi]
    tp = np.stack([r, np.pi / 2 - lat, np.mod(lng, 2 * np.pi)], -1)
    ll = convert_sph_conventions(tp, "theta-phi_to_lat-lng")
    tp2 = convert_sph_conventions(ll, "lat-lng_to_theta-phi")
    np.testing.assert_allclose(tp2, tp, atol=1e-12)
    # same cartesian point through either convention
    np.testing.assert_allclose(sph2cart(tp, "theta-phi"),
                               sph2cart(ll, "lat-lng"), atol=1e-12)
