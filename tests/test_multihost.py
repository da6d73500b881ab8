"""Multi-host execution tests: REAL jax.distributed processes on localhost.

Covers SURVEY.md §2.8 item 2 (multi-host training) without pod hardware:
two OS processes, each with its own CPU device(s), coordinated over
127.0.0.1 — the same code path (initialize / global mesh /
make_array_from_process_local_data / cross-process pmean) a TPU pod uses
over DCN. The reference's DDP init never ran a collective
(train_tensoIR.py:21-27); this asserts ours does, and that the update is
bit-comparable to the single-process run.
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_layout(tmp_path, num_procs: int, devices_per_proc: int,
                timeout: int = 600):
    """Launch num_procs workers; return list of result dicts."""
    port = _free_port()
    env = dict(os.environ)
    env["TENSOIR_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                        f"{devices_per_proc}")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    outs = []
    for pid in range(num_procs):
        out = tmp_path / f"proc_{num_procs}x{devices_per_proc}_{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER,
             "--coordinator", f"127.0.0.1:{port}",
             "--num-procs", str(num_procs), "--pid", str(pid),
             "--out", str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    results = []
    try:
        for p, out in zip(procs, outs):
            stdout, _ = p.communicate(timeout=timeout)
            assert p.returncode == 0, f"worker failed:\n{stdout[-4000:]}"
            with open(out) as f:
                results.append(json.load(f))
    finally:
        # a failed/hung worker must not orphan its peers: they block in
        # jax.distributed collectives forever and leak across test runs
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    return results


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    """2 procs x 1 device == 1 proc x 2 devices: same global device count,
    same deterministic batch -> identical params after 3 relight steps."""
    single = _run_layout(tmp_path, num_procs=1, devices_per_proc=2)
    multi = _run_layout(tmp_path, num_procs=2, devices_per_proc=1)

    assert single[0]["device_count"] == 2
    assert all(r["device_count"] == 2 for r in multi)
    assert all(r["process_count"] == 2 for r in multi)

    # every process of the distributed run holds identical replicated params
    for k, v in multi[0]["checksums"].items():
        assert np.isclose(v, multi[1]["checksums"][k], rtol=1e-6), k

    # and they match the single-process global run
    assert np.isfinite(single[0]["loss"])
    assert np.isclose(single[0]["loss"], multi[0]["loss"], rtol=1e-5)
    for k, v in single[0]["checksums"].items():
        assert np.isclose(v, multi[0]["checksums"][k], rtol=1e-5), k
