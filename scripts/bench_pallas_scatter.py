"""Pallas TPU scatter-add / gather microbenchmark.

XLA's TPU scatter-add runs at ~11-20M rows/s (measured, CLAUDE.md) — the
floor under the VM-plane VJPs that dominate the radiance backward pass. This
probes whether a Pallas kernel with the accumulator table resident in VMEM
and a serial scalar-indexed accumulate loop can beat that floor, and at what
table sizes VMEM residency holds.

Kernels:
  scatter_add  out[idx[i], :] += val[i, :] — table whole in VMEM (revisited
               across grid steps), values/indices streamed per grid step.
  gather       out[i, :] = table[idx[i], :] — same structure, read side.

Phases print rows/s; vmem_probe prints the largest f32 VMEM scratch that
compiles (binary search 8..128 MB).

CPU check: interpret mode asserts allclose vs jnp .at[].add.
TPU run (CLAUDE.md: detached, never under timeout; pallas remote-compiles
can wedge the axon tunnel — keep this run isolated):
  nohup python scripts/bench_pallas_scatter.py > /tmp/pallas_scatter.log 2>&1 &
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np


def make_scatter_add(R: int, C: int, chunk: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, val_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, carry):
            r = idx_ref[i]
            out_ref[pl.ds(r, 1), :] += val_ref[pl.ds(i, 1), :]
            return carry

        jax.lax.fori_loop(0, chunk, body, 0)

    @jax.jit
    def scatter_add(idx, val):
        n = val.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(n // chunk,),
            in_specs=[
                pl.BlockSpec((chunk,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((chunk, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, C), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, C), val.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(idx, val)

    return scatter_add


def make_gather(R: int, C: int, chunk: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, tab_ref, out_ref):
        def body(i, carry):
            r = idx_ref[i]
            out_ref[pl.ds(i, 1), :] = tab_ref[pl.ds(r, 1), :]
            return carry

        jax.lax.fori_loop(0, chunk, body, 0)

    @jax.jit
    def gather(idx, tab):
        n = idx.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(n // chunk,),
            in_specs=[
                pl.BlockSpec((chunk,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((R, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((chunk, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, C), tab.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(idx, tab)

    return gather


def main():
    import jax
    import jax.numpy as jnp
    from tensoir_tpu.utils.platform import apply_platform_override
    apply_platform_override()

    platform = jax.devices()[0].platform
    interpret = platform == "cpu"

    R, C = 39601, 64          # density-plane VJP shape at grid 200
    N = 2359296 if not interpret else 65536   # 3 * 4096 * 192 rows
    CHUNK = 16384 if not interpret else 8192

    idx = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, R,
                             dtype=jnp.int32)
    vals = jax.random.normal(jax.random.PRNGKey(1), (N, C), jnp.float32)

    scatter_add = make_scatter_add(R, C, CHUNK, interpret)

    # correctness first (always) — probe size must be a nonzero multiple
    # of CHUNK or the pallas grid is (0,) and the kernel never runs
    small_n = CHUNK
    out = scatter_add(idx[:small_n], vals[:small_n])
    ref = jnp.zeros((R, C)).at[idx[:small_n]].add(vals[:small_n])
    err = float(jnp.max(jnp.abs(out - ref)))
    print(json.dumps({"phase": "scatter_correct", "max_abs_err": err}),
          flush=True)
    assert err < 1e-4, err

    gather = make_gather(R, C, CHUNK, interpret)
    tab = jax.random.normal(jax.random.PRNGKey(2), (R, C), jnp.float32)
    gout = gather(idx[:small_n], tab)
    gref = jnp.take(tab, idx[:small_n], axis=0)
    gerr = float(jnp.max(jnp.abs(gout - gref)))
    print(json.dumps({"phase": "gather_correct", "max_abs_err": gerr}),
          flush=True)
    assert gerr < 1e-6, gerr

    if interpret:
        print("done (interpret mode, no timing)", flush=True)
        return

    n_iters = 8

    def timeit(name, fn, rows):
        out = fn(0)
        float(jnp.asarray(out).ravel()[0])
        t0 = time.perf_counter()
        for i in range(n_iters):
            out = fn(i + 1)
        float(jnp.asarray(out).ravel()[0])
        ms = (time.perf_counter() - t0) / n_iters * 1e3
        print(json.dumps({"phase": name, "ms": round(ms, 2),
                          "rows_per_s": round(rows / (ms / 1e3))}),
              flush=True)

    roll = jax.jit(lambda i: jnp.roll(idx, i))
    timeit("pallas_scatter_add", lambda i: scatter_add(roll(i), vals), N)
    timeit("pallas_gather", lambda i: gather(roll(i), tab), N)

    # XLA reference on the same shapes, same process. vals/tab MUST be
    # explicit arguments: closure-captured arrays are inlined as HLO
    # constants and the 600MB serialized module blows the axon
    # remote-compile body limit (HTTP 413 — observed r3 stage D)
    xla_sc = jax.jit(lambda ix, v: jnp.zeros((R, C)).at[ix].add(v).sum())
    timeit("xla_scatter_add", lambda i: xla_sc(roll(i), vals), N)
    xla_g = jax.jit(lambda ix, t: jnp.take(t, ix, axis=0).sum())
    timeit("xla_gather", lambda i: xla_g(roll(i), tab), N)

    # app-plane shape: 192-wide rows
    C2 = 192
    vals2 = jax.random.normal(jax.random.PRNGKey(3), (N // 4, C2))
    sc2 = make_scatter_add(R, C2, CHUNK, False)
    timeit("pallas_scatter_w192",
           lambda i: sc2(roll(i)[: N // 4], vals2), N // 4)

    # VMEM residency probe: largest (R8, 128) f32 scratch that compiles+runs
    lo, hi = 8, 128
    best = 0
    while lo <= hi:
        mid = (lo + hi) // 2
        rows = mid * 1024 * 1024 // (128 * 4)
        try:
            g = make_gather(rows, 128, 8192, False)
            tt = jnp.zeros((rows, 128), jnp.float32)
            ii = jnp.zeros((8192,), jnp.int32)
            float(g(ii, tt).ravel()[0])
            best = mid
            lo = mid + 1
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"phase": "vmem_probe_fail", "mb": mid,
                              "err": str(e)[:200]}), flush=True)
            hi = mid - 1
    print(json.dumps({"phase": "vmem_probe_max_mb", "value": best}),
          flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
