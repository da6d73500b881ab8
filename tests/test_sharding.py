"""Multi-chip sharding: loss/params must be invariant to the mesh size
(SURVEY.md §4: shard-invariance of loss/grad vs single-device)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensoir_tpu.models.field import FieldConfig, init_field_params
from tensoir_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from tensoir_tpu.train.optim import make_optimizer
from tensoir_tpu.train.step import LossWeights, StepStatic, make_train_step


def _setup():
    cfg = FieldConfig(density_n_comp=(4, 4, 4), app_n_comp=(4, 4, 4),
                      app_dim=6, feature_c=32, num_sgs=16,
                      envmap_h=4, envmap_w=8, step_ratio=2.0,
                      normals_kind="purely_predicted")
    aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
    params, scene = init_field_params(jax.random.PRNGKey(0), cfg,
                                      (16, 16, 16), aabb)
    return cfg, params, scene


def _batch(n=64):
    rng = np.random.default_rng(0)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = -4.0
    d = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    d[:, 2] = 1.0
    return {
        "rays": jnp.asarray(np.concatenate([o, d], -1)),
        "rgbs": jnp.full((n, 3), 0.5, jnp.float32),
        "light_idx": jnp.zeros((n,), jnp.int32),
    }


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_step_matches_single_device(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    cfg, params, scene = _setup()
    batch = _batch()
    # deterministic mode so per-shard PRNG folds don't change the math
    st = StepStatic(n_samples=16, is_relight=False, white_bg=True, app_cap=8,
                    deterministic=True)
    w = LossWeights(ortho=1e-3, l1=8e-5, tv_density=0.01, tv_app=0.01,
                    lr_factor=0.999, n_iters=100, relight_start=0)
    lr_factor = 0.999

    def run(mesh):
        optimizer = make_optimizer(params, 0.02, 1e-3, lr_factor)
        opt_state = optimizer.init(params)
        step = make_train_step(cfg, optimizer, st, w, mesh=mesh, donate=False)
        p, s = params, opt_state
        if mesh is not None:
            p = replicate(mesh, p)
            s = replicate(mesh, s)
            b = shard_batch(mesh, batch)
            sc = replicate(mesh, scene)
        else:
            b, sc = batch, scene
        for i in range(3):
            # key=None is not allowed; use a fixed key — but march jitter is
            # only applied under is_train with key, identical on every path
            p, s, m = step(p, s, sc, b, jax.random.PRNGKey(42 + i),
                           jnp.asarray(i))
        return jax.tree.map(np.asarray, p), float(m["total_loss"])

    p1, loss1 = run(None)
    pn, lossn = run(make_mesh(n_dev))

    assert np.isfinite(loss1) and np.isfinite(lossn)
    # losses and updated params agree across mesh sizes
    np.testing.assert_allclose(loss1, lossn, rtol=2e-4, atol=2e-5)
    for k in ("density_plane_0", "basis_mat", "light_line"):
        np.testing.assert_allclose(p1[k], pn[k], rtol=2e-3, atol=2e-5,
                                   err_msg=k)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_relight_sharded_step_matches_single_device(n_dev):
    """Shard invariance of the FULL relight step (VERDICT r1 item 3).

    relight_ray_cap >= batch so every ray is relit under any shard layout
    (per-shard capping then selects all local rays) and the masked BRDF
    mean reduces identically; deterministic=True removes march jitter and
    light-dir sampling randomness."""
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    cfg, params, scene = _setup()
    B = 32
    batch = _batch(B)
    st = StepStatic(n_samples=16, is_relight=True, white_bg=True, app_cap=8,
                    relight_ray_cap=B, second_n_sample=8, secondary_tile=64,
                    second_march_cap=8, deterministic=True)
    w = LossWeights(ortho=1e-3, l1=8e-5, lr_factor=0.999, n_iters=100,
                    relight_start=0)

    def run(mesh):
        optimizer = make_optimizer(params, 0.02, 1e-3, 0.999)
        opt_state = optimizer.init(params)
        step = make_train_step(cfg, optimizer, st, w, mesh=mesh, donate=False)
        p, s = params, opt_state
        if mesh is not None:
            p = replicate(mesh, p)
            s = replicate(mesh, s)
            b = shard_batch(mesh, batch)
            sc = replicate(mesh, scene)
        else:
            b, sc = batch, scene
        for i in range(2):
            p, s, m = step(p, s, sc, b, jax.random.PRNGKey(7 + i),
                           jnp.asarray(i))
        return jax.tree.map(np.asarray, p), float(m["total_loss"])

    p1, loss1 = run(None)
    pn, lossn = run(make_mesh(n_dev))
    assert np.isfinite(loss1) and np.isfinite(lossn)
    np.testing.assert_allclose(loss1, lossn, rtol=2e-4, atol=2e-5)
    for k in ("density_plane_0", "app_plane_0", "basis_mat", "light_line"):
        np.testing.assert_allclose(p1[k], pn[k], rtol=2e-3, atol=2e-5,
                                   err_msg=k)


def test_relight_sharded_step_runs():
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    cfg, params, scene = _setup()
    mesh = make_mesh(4)
    batch = _batch(32)
    st = StepStatic(n_samples=16, is_relight=True, white_bg=True, app_cap=8,
                    relight_ray_cap=8, second_n_sample=8, secondary_tile=128)
    w = LossWeights(lr_factor=0.999, n_iters=100, relight_start=0)
    optimizer = make_optimizer(params, 0.02, 1e-3, 0.999)
    step = make_train_step(cfg, optimizer, st, w, mesh=mesh, donate=False)
    p = replicate(mesh, params)
    s = replicate(mesh, optimizer.init(params))
    sc = replicate(mesh, scene)
    b = shard_batch(mesh, batch)
    p2, s2, m = step(p, s, sc, b, jax.random.PRNGKey(0), jnp.asarray(0))
    assert np.isfinite(float(m["total_loss"]))
    # replicated updates are identical across devices — check it for real:
    # every per-device shard of the replicated param must be bit-equal
    # (a missing pmean on any loss term would desynchronize replicas)
    arr = p2["basis_mat"]
    assert np.isfinite(np.asarray(arr)).all()
    shards = [np.asarray(sh.data) for sh in arr.addressable_shards]
    for sh in shards[1:]:
        np.testing.assert_array_equal(sh, shards[0])
