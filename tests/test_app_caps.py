"""Secondary app-stage capacity knobs (round-3 trace follow-up).

The app stage is gather-row bound (log/trace_r3): rows/step =
tiles x app_pair_cap x second_app_cap. Tightening either cap must be
EXACT while the telemetry (sec/app_pair_overflow_frac etc.) reads zero:
the same pairs are selected (order-free cumsum+scatter compaction) and
the dropped slots were zero-weight, so the composited sums are
bit-identical. These tests pin that contract, the telemetry itself, and
the pair_ok fix (tile-padding junk must not claim app capacity).

Reference behavior being capped: relight_utils.py:822-825 (app_mask =
weight > thres selects the appearance samples).
"""
import numpy as np
import jax
import jax.numpy as jnp

from tensoir_tpu.models.field import FieldConfig, init_field_params
from tensoir_tpu.models import lifecycle as LC
from tensoir_tpu.render.secondary import secondary_shading_tiled


def _model_with_mask():
    cfg = FieldConfig(density_n_comp=(4, 4, 4), app_n_comp=(4, 4, 4),
                      app_dim=6, feature_c=32, num_sgs=16, envmap_h=4,
                      envmap_w=8, step_ratio=2.0,
                      normals_kind="purely_predicted")
    aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
    params, scene = init_field_params(jax.random.PRNGKey(0), cfg,
                                      (24, 24, 24), aabb)
    params = dict(params)
    for i in range(3):
        g = params[f"density_plane_{i}"]
        H, W, R = g.shape
        yy, xx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                             indexing="ij")
        bump = np.exp(-((xx ** 2 + yy ** 2) / 0.08)).astype(np.float32)
        params[f"density_plane_{i}"] = g + 4.0 * jnp.asarray(bump)[..., None]
    scene, _ = LC.update_alpha_mask(cfg, params, scene, (24, 24, 24))
    return cfg, params, scene


def _pairs(cfg, n_pts=40):
    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, (n_pts, 3)).astype(np.float32))
    L = cfg.envmap_h * cfg.envmap_w
    dirs = rng.normal(size=(n_pts, L, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    lidx = jnp.zeros(n_pts, jnp.int32)
    # hemisphere-like validity (~half the dirs), matching the cosine mask
    # the compaction capacity (0.5625) is tuned for
    mask = jnp.asarray(dirs[..., 2] > 0.0)
    return pts, jnp.asarray(dirs), lidx, mask


def _run(cfg, params, scene, pts, dirs, lidx, mask, **over):
    kw = dict(n_sample=32, vis_near=0.05, vis_far=1.5, tile=256,
              march_cap=24, use_baked=True, bake_reso=0,
              compact_frac=0.5625, return_stats=True)
    kw.update(over)
    return secondary_shading_tiled(cfg, params, scene, pts, dirs, lidx,
                                   mask, **kw)


def test_stats_telemetry_sane():
    cfg, params, scene = _model_with_mask()
    pts, dirs, lidx, mask = _pairs(cfg)
    vis, ind, stats = _run(cfg, params, scene, pts, dirs, lidx, mask)
    s = {k: float(v) for k, v in stats.items()}
    assert 0.0 <= s["app_pair_overflow_frac"] <= 1.0
    assert 0.0 <= s["app_slot_occupancy"] <= 1.0
    assert s["app_pair_occupancy"] >= 0.0
    # generous caps on a tiny scene: nothing should overflow
    assert s["app_pair_overflow_frac"] == 0.0
    assert s["compact_overflow_frac"] == 0.0


def test_stats_do_not_change_results():
    cfg, params, scene = _model_with_mask()
    pts, dirs, lidx, mask = _pairs(cfg)
    vis_s, ind_s, _ = _run(cfg, params, scene, pts, dirs, lidx, mask)
    vis, ind = _run(cfg, params, scene, pts, dirs, lidx, mask,
                    return_stats=False)
    np.testing.assert_array_equal(np.asarray(vis_s), np.asarray(vis))
    np.testing.assert_array_equal(np.asarray(ind_s), np.asarray(ind))


def test_app_cap_tightening_exact_when_slots_fit():
    """second_app_cap=k' < k is bit-exact when no pair demands more than k'
    weight>thres samples: top_k returns the same nonzero slots in the same
    (descending) order and the extra slots were zero-weight. The
    app_slot_demand_max telemetry is exactly the adoption criterion."""
    cfg, params, scene = _model_with_mask()
    pts, dirs, lidx, mask = _pairs(cfg)
    vis32, ind32, st32 = _run(cfg, params, scene, pts, dirs, lidx, mask,
                              app_cap=32)
    demand_max = int(float(st32["app_slot_demand_max"]))
    assert demand_max <= 32
    # a cap BELOW the demand must differ (sanity that the knob is live)...
    if demand_max > 2:
        _, ind2, _ = _run(cfg, params, scene, pts, dirs, lidx, mask,
                          app_cap=2)
        assert not np.array_equal(np.asarray(ind32), np.asarray(ind2))
    # ...and a cap AT the demand must be exact up to float reduction
    # order (the k-slot composite sums reduce over different tree widths;
    # visibility does not go through the app stage at all, so it IS
    # bit-equal)
    vis_k, ind_k, st_k = _run(cfg, params, scene, pts, dirs, lidx, mask,
                              app_cap=max(demand_max, 1))
    assert float(st_k["app_slot_overflow_pairs"]) == 0.0
    np.testing.assert_array_equal(np.asarray(vis32), np.asarray(vis_k))
    np.testing.assert_allclose(np.asarray(ind32), np.asarray(ind_k),
                               atol=1e-7, rtol=1e-6)


def test_app_pair_frac_exact_when_pairs_fit():
    """A tighter per-tile app pair cap is bit-exact while overflow is 0
    (order-free compaction keeps the same pairs, scattered to the same
    output rows)."""
    cfg, params, scene = _model_with_mask()
    pts, dirs, lidx, mask = _pairs(cfg)
    vis_a, ind_a, st_a = _run(cfg, params, scene, pts, dirs, lidx, mask,
                              app_pair_frac=1.0)
    vis_b, ind_b, st_b = _run(cfg, params, scene, pts, dirs, lidx, mask,
                              app_pair_frac=0.5)
    assert float(st_b["app_pair_overflow_frac"]) == 0.0
    np.testing.assert_array_equal(np.asarray(vis_a), np.asarray(vis_b))
    np.testing.assert_array_equal(np.asarray(ind_a), np.asarray(ind_b))


def test_pair_ok_junk_does_not_claim_capacity():
    """With a tiny app_pair_frac, tile-padding junk marching through the
    blob must not displace REAL pairs: the overflow telemetry counts only
    real pairs, and results for valid pairs survive a cap exactly equal to
    the real demand."""
    cfg, params, scene = _model_with_mask()
    pts, dirs, lidx, mask = _pairs(cfg, n_pts=10)
    # no compaction: tiles are padded with mask=False junk rows that STILL
    # march (static shapes) and would otherwise win app slots
    vis_ref, ind_ref, st = _run(cfg, params, scene, pts, dirs, lidx, mask,
                                compact_frac=0.0, app_pair_frac=1.0)
    # run with the cap near the measured occupancy (2x headroom for
    # tile-to-tile imbalance; occupancy is the cross-tile mean)
    occ = float(st["app_pair_occupancy"])
    frac = min(1.0, max(2.0 * occ, 1.0 / 128.0))
    vis_t, ind_t, st_t = _run(cfg, params, scene, pts, dirs, lidx, mask,
                              compact_frac=0.0, app_pair_frac=frac)
    assert float(st_t["app_pair_overflow_frac"]) == 0.0
    np.testing.assert_array_equal(np.asarray(vis_ref), np.asarray(vis_t))
    np.testing.assert_array_equal(np.asarray(ind_ref), np.asarray(ind_t))


def _multilight_model():
    cfg = FieldConfig(density_n_comp=(4, 4, 4), app_n_comp=(4, 4, 4),
                      app_dim=6, feature_c=32, num_sgs=16, envmap_h=4,
                      envmap_w=8, step_ratio=2.0, light_num=3,
                      light_rotations=(0, 120, 240),
                      normals_kind="purely_predicted")
    aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
    params, scene = init_field_params(jax.random.PRNGKey(3), cfg,
                                      (24, 24, 24), aabb)
    params = dict(params)
    for i in range(3):
        g = params[f"density_plane_{i}"]
        H, W, R = g.shape
        yy, xx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                             indexing="ij")
        bump = np.exp(-((xx ** 2 + yy ** 2) / 0.08)).astype(np.float32)
        params[f"density_plane_{i}"] = g + 12.0 * jnp.asarray(bump)[..., None]
    # make the per-light radiance conditioning STRONG so light-index bugs
    # cannot hide inside tolerances
    ll = np.asarray(params["light_line"])
    ll = ll * np.array([0.2, 1.0, 3.0], np.float32)[:, None]
    params["light_line"] = jnp.asarray(ll)
    scene, _ = LC.update_alpha_mask(cfg, params, scene, (24, 24, 24))
    return cfg, params, scene


def test_multilight_knob_stack_light_conditioning():
    """Per-light indirect conditioning through the fast-march knobs on a
    multi-light model — the r3 multilight collapse surface. Pins each
    knob at its true error class on a SOFT (mid-training-like) density:
    compaction is exact (0), the app bake is a tight proxy (<1e-3 rel),
    and the window march is a LOSSY approximation on soft densities
    (measured 0.58 rel here — transmittance does not saturate inside the
    front window, so mid-span indirect is truncated; on trained densities
    it saturates and the r2 demo gates passed). Light conditioning must
    stay live and un-permuted through every knob."""
    cfg, params, scene = _multilight_model()
    rng = np.random.default_rng(11)
    n_pts = 24
    pts = jnp.asarray(rng.uniform(-0.25, 0.25, (n_pts, 3)).astype(np.float32))
    L = cfg.envmap_h * cfg.envmap_w
    dirs = rng.normal(size=(n_pts, L, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs)
    mask = jnp.asarray(np.asarray(dirs)[..., 2] > 0.0)

    def run(l, **kw):
        li = jnp.full((n_pts,), l, jnp.int32)
        return secondary_shading_tiled(
            cfg, params, scene, pts, dirs, li, mask,
            n_sample=32, vis_near=0.05, vis_far=1.5, tile=256,
            march_cap=24, use_baked=True, bake_reso=0, **kw)

    exact = {l: run(l) for l in range(3)}

    # (a) conditioning live in the exact path (relative to ind magnitude)
    mag = float(jnp.abs(exact[0][1]).max()) + 1e-12
    d12 = float(jnp.max(jnp.abs(exact[1][1] - exact[2][1]))) / mag
    assert d12 > 3e-5, d12

    # (b) compaction is EXACT per light
    for l in range(3):
        c = run(l, compact_frac=0.5625)
        np.testing.assert_array_equal(np.asarray(c[1]),
                                      np.asarray(exact[l][1]),
                                      err_msg=f"compact light {l}")

    # (c) app bake is a tight proxy AND preserves per-light structure
    for l in range(3):
        b = run(l, app_bake_reso=24)
        ve = np.asarray(exact[l][1]).ravel()
        vf = np.asarray(b[1]).ravel()
        rel = np.linalg.norm(vf - ve) / (np.linalg.norm(ve) + 1e-9)
        assert rel < 1e-3, (l, rel)

    # (d) window march: lossy on soft density (the truncation error is
    # light-INDEPENDENT), but visibility must stay within the
    # conservative-cull tolerance and the per-light conditioning must
    # stay live through the windowed app stage
    wins = {}
    for l in range(3):
        w = run(l, window=24, window_back=8, prepass_n=16, coarse_dilate=2)
        wins[l] = w
        np.testing.assert_allclose(np.asarray(w[0]),
                                   np.asarray(exact[l][0]),
                                   atol=6e-3, rtol=1e-3,
                                   err_msg=f"vis light {l}")
    wmag = float(jnp.abs(wins[0][1]).max()) + 1e-12
    wd12 = float(jnp.max(jnp.abs(wins[1][1] - wins[2][1]))) / wmag
    assert wd12 > 3e-5, wd12
    # the truncation itself must be identical across lights: the
    # window/exact DIFFERENCE image may not depend on the light index
    diff1 = np.asarray(wins[1][1]) - np.asarray(exact[1][1])
    diff2 = np.asarray(wins[2][1]) - np.asarray(exact[2][1])
    np.testing.assert_allclose(diff1, diff2, atol=5e-4 * (wmag / 1e-4 + 1))


def test_window_truncation_probe_soft_vs_hard():
    """fast_march_start auto-mode signal (secondary.py probe): on a SOFT
    density the configured window would truncate a large fraction of the
    marched weight mass; hardening the same field drives the residual
    toward 0 (the round-3 multilight-collapse mechanism, BASELINE.md)."""
    cfg, params, scene = _model_with_mask()
    pts, dirs, lidx, mask = _pairs(cfg)

    def resid(p, scale):
        p = dict(p)
        for i in range(3):
            p[f"density_plane_{i}"] = p[f"density_plane_{i}"] * scale
        _, _, stats = _run(cfg, p, scene, pts, dirs, lidx, mask,
                           march_cap=0, compact_frac=0.0,
                           window_probe=6, window_probe_back=0)
        assert "window_resid_rel" in stats
        r = float(stats["window_resid_rel"])
        assert 0.0 <= r <= 1.0
        return r

    r_soft = resid(params, 0.05)   # near-transparent: window truncates
    r_hard = resid(params, 50.0)   # saturates within a few samples
    assert r_soft > 0.1, f"soft density must show truncation ({r_soft})"
    assert r_hard < 0.02, f"hard density must read ~0 ({r_hard})"
    assert r_soft > r_hard * 5


def test_window_probe_off_by_default():
    cfg, params, scene = _model_with_mask()
    pts, dirs, lidx, mask = _pairs(cfg)
    _, _, stats = _run(cfg, params, scene, pts, dirs, lidx, mask)
    assert "window_resid_rel" not in stats
