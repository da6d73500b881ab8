"""Device mesh + sharding helpers (the reference has none — SURVEY.md §2.8:
its NCCL setup never performs a collective; this module is the TPU-native
distributed backbone instead).

Design (BASELINE.json north star):
  * 1-D mesh over a 'data' axis. Primary-ray batches AND the much larger
    secondary (surface-point x light-dir) batches are sharded on their
    leading ray axis; VM factors / MLPs / light params are replicated.
  * Losses are global-batch means, so jit's SPMD partitioner emits the
    gradient all-reduce (psum over ICI) automatically — no hand-written
    collectives on the training path.
  * Multi-host: call `jax.distributed.initialize()` before `make_mesh`
    (DCN), load host-local ray shards, and fold the host index into data
    PRNG keys (`host_fold_key`).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the first n_data devices."""
    devs = jax.devices()
    n = n_data or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return jax.make_mesh((n,), ("data",), devices=devs[:n])


def shard_batch(mesh: Mesh, batch: Dict):
    """Put a batch dict on the mesh, sharded on the leading (ray) axis.

    Single-process: `batch` holds the global batch. Multi-process: each
    process passes its HOST-LOCAL slice (global_batch / process_count rows,
    in process-index order) and the global array is assembled over DCN-split
    shards without any cross-host data movement
    (jax.make_array_from_process_local_data)."""
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / scene / optimizer state) on every chip.

    Multi-process: every process must hold the SAME host array (true here:
    init / lifecycle events are computed identically on each host from the
    same seed)."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), tree)


def host_fold_key(key: jax.Array) -> jax.Array:
    """Deterministic per-host PRNG stream for host-sharded data pipelines."""
    return jax.random.fold_in(key, jax.process_index())


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0):
    """Pad the leading axis so it divides the mesh; returns (padded, n_valid)."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, rem)
    return np.pad(arr, pad), n
