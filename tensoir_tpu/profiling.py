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
    """JSONL metrics sink + TensorBoard event files (SURVEY.md §5.5).

    TensorBoard scalars/images go through the self-contained
    `utils.tb_writer.EventWriter` (this image has no tensorboard package);
    the files load in any standard TensorBoard install — matching the
    reference's SummaryWriter usage (train_tensoIR.py:153,328-334,
    renderer.py:443-452)."""

    def __init__(self, log_dir: Optional[str] = None,
                 use_tensorboard: bool = True):
        self._file = None
        self._tb = None
        if log_dir:
            import os
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(f"{log_dir}/metrics.jsonl", "a")
            if use_tensorboard:
                from tensoir_tpu.utils.tb_writer import EventWriter
                self._tb = EventWriter(log_dir)

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "train"):
        rec = {"step": step, **{f"{prefix}/{k}": float(v)
                                for k, v in metrics.items()}}
        if self._file:
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
        if self._tb:
            self._tb.add_scalars({k: float(v) for k, v in metrics.items()},
                                 step, prefix=f"{prefix}/")

    def log_image(self, step: int, tag: str, img) -> None:
        """Eval image panel (renderer.py:443-452's add_image equivalent)."""
        if self._tb:
            self._tb.add_image(tag, img, step)
            self._tb.flush()

    def close(self):
        if self._file:
            self._file.close()
        if self._tb:
            self._tb.close()
