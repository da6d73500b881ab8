"""Multi-host execution scaffolding (SURVEY.md §2.8 item 2).

The reference's torch.distributed setup never performed a collective; this
is the real thing: `jax.distributed.initialize` over DCN, a global mesh over
every chip, host-local ray shards, deterministic per-host RNG.

Typical multi-host entry:

    from tensoir_tpu.parallel import multihost
    multihost.initialize()                      # no-op on single host
    shard = multihost.host_shard(all_rays)      # this host's ray slice
    mesh  = make_mesh()                         # all chips, all hosts
    ...
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """jax.distributed.initialize with env-based autodetection; no-op when
    running single-process."""
    import jax

    if num_processes in (None, 1) and coordinator_address is None:
        import os
        if "JAX_COORDINATOR_ADDRESS" not in os.environ:
            return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def host_shard(arr: np.ndarray, axis: int = 0) -> Tuple[np.ndarray, int, int]:
    """This host's contiguous slice of a global array (host-local data
    loading: each process materializes only its own rays)."""
    import jax

    n_proc = jax.process_count()
    pid = jax.process_index()
    n = arr.shape[axis]
    per = -(-n // n_proc)
    start = min(pid * per, n)
    stop = min(start + per, n)
    return np.take(arr, np.arange(start, stop), axis=axis), start, stop


def host_key(key):
    """Deterministic per-host PRNG stream."""
    import jax
    return jax.random.fold_in(key, jax.process_index())


def agree(flag: bool) -> bool:
    """All-process agreement on a host-local predicate (process 0 decides).

    Needed wherever a host-local observation (e.g. a stop-file on disk)
    gates collective work: if processes decided independently they could
    exit the train loop at different iterations and deadlock the next
    collective (same failure class as the round-2 ckpt-barrier bug).
    Collective when n_proc > 1 — every process must call it at the same
    program point. No-op single-process.
    """
    import jax

    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils
    return bool(multihost_utils.broadcast_one_to_all(np.asarray(bool(flag))))


def barrier(name: str = "barrier"):
    """Block until every process reaches this point.

    The reference's `synchronize` (utils.py:231-242) wraps
    torch.distributed.barrier around artifact writes; this is the JAX
    multihost analog — used e.g. so non-zero processes don't read a
    checkpoint that process 0 is still writing. No-op single-process.
    """
    import jax

    if jax.process_count() == 1:
        return
    # sync_global_devices: every process must call it with the SAME name
    # (it asserts on mismatch), and the call blocks until all processes
    # arrive — so it must only appear under conditions every process
    # computes identically
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)
