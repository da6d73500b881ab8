"""Profiling / observability (SURVEY.md §5.1 — the reference has only
wall-clock prints; here: rays/s counters + jax.profiler trace hooks)."""
from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax


@dataclass
class RayThroughputMeter:
    """Tracks primary+visibility rays/s (the BASELINE.json metric)."""
    primary_per_step: int
    visibility_per_step: int
    _t0: Optional[float] = None
    _steps: int = 0

    def start(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def step(self, n: int = 1):
        self._steps += n

    @property
    def rays_per_step(self) -> int:
        return self.primary_per_step + self.visibility_per_step

    def report(self) -> Dict[str, float]:
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        total = self.rays_per_step * self._steps
        return {
            "steps": self._steps,
            "elapsed_s": dt,
            "steps_per_s": self._steps / dt if dt > 0 else 0.0,
            "rays_per_s": total / dt if dt > 0 else 0.0,
            "primary_rays_per_s": self.primary_per_step * self._steps / dt
            if dt > 0 else 0.0,
        }


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context (view with TensorBoard/XProf);
    no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class MetricsLogger:
    """JSONL metrics sink + optional TensorBoard (SURVEY.md §5.5)."""

    def __init__(self, log_dir: Optional[str] = None,
                 use_tensorboard: bool = False):
        self._file = None
        self._tb = None
        if log_dir:
            import os
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(f"{log_dir}/metrics.jsonl", "a")
            if use_tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter
                    self._tb = SummaryWriter(log_dir)
                except ImportError:
                    pass

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "train"):
        rec = {"step": step, **{f"{prefix}/{k}": float(v)
                                for k, v in metrics.items()}}
        if self._file:
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
        if self._tb:
            for k, v in metrics.items():
                self._tb.add_scalar(f"{prefix}/{k}", float(v), step)

    def close(self):
        if self._file:
            self._file.close()
        if self._tb:
            self._tb.close()
