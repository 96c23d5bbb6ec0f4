"""Tracing, latency histograms, metric logging.

The reference has only ad-hoc wall timers (reference:
streamvln_agent.py:243-246, http_realworld_server.py:95-108). Since p50
step latency is this framework's north-star metric, latency tracking is
first-class:

- LatencyTracker: streaming percentile histogram per named phase
- trace(): jax.profiler trace context for TPU timeline capture
- MetricsLogger: JSONL sink + optional wandb (reference logs to wandb,
  scripts/streamvln_train_slurm.sh:74), rank-0 gated
- AverageMeter: running averages with cross-process reduction
  (replaces the NCCL all_reduce meter, reference: utils/utils.py:60-121)
"""
from __future__ import annotations

import bisect
import contextlib
import json
import os
import time
from typing import Dict, List, Optional

import numpy as np


class LatencyTracker:
    """Per-phase latency records with percentile summaries."""

    def __init__(self, capacity: int = 100_000):
        self.capacity = capacity
        self._data: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def measure(self, phase: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(phase, time.perf_counter() - t0)

    def record(self, phase: str, seconds: float):
        arr = self._data.setdefault(phase, [])
        if len(arr) < self.capacity:
            arr.append(seconds)

    def summary(self, phase: Optional[str] = None) -> dict:
        def one(name):
            a = np.asarray(self._data.get(name, []))
            if a.size == 0:
                return {}
            return {
                "count": int(a.size),
                "mean_ms": float(a.mean() * 1e3),
                "p50_ms": float(np.percentile(a, 50) * 1e3),
                "p90_ms": float(np.percentile(a, 90) * 1e3),
                "p99_ms": float(np.percentile(a, 99) * 1e3),
                "max_ms": float(a.max() * 1e3),
            }
        if phase is not None:
            return one(phase)
        return {name: one(name) for name in self._data}

    def hz(self, phase: str, percentile: float = 50) -> float:
        a = np.asarray(self._data.get(phase, []))
        if a.size == 0:
            return 0.0
        return 1.0 / float(np.percentile(a, percentile))


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """jax.profiler TPU timeline capture around a code region."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricsLogger:
    """JSONL metric sink; optional wandb mirror; rank-0 gated."""

    def __init__(self, output_dir: str, rank: int = 0,
                 use_wandb: bool = False, run_name: str = "streamvln"):
        self.rank = rank
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self._wandb = None
        if rank == 0:
            os.makedirs(output_dir, exist_ok=True)
            if use_wandb:
                try:
                    import wandb
                    # Honor WANDB_MODE so unauthenticated hosts/tests can
                    # run offline/disabled instead of blocking on a
                    # networked login.
                    self._wandb = wandb.init(
                        project="streamvln_tpu", name=run_name,
                        mode=os.environ.get("WANDB_MODE", "online"))
                except Exception as e:  # noqa: BLE001 - degrade to JSONL
                    import warnings
                    warnings.warn(f"wandb.init failed ({e!r}); "
                                  "metrics degrade to JSONL only")
                    self._wandb = None

    def log(self, metrics: dict, step: Optional[int] = None):
        if self.rank != 0:
            return
        rec = dict(metrics)
        if step is not None:
            rec["step"] = step
        rec.setdefault("ts", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            wb = {k: v for k, v in metrics.items() if k != "step"}
            self._wandb.log(wb, step=step)

    def close(self):
        if self._wandb is not None:
            try:
                self._wandb.finish()
            finally:
                self._wandb = None


class AverageMeter:
    """Running average; `all_reduce()` folds in other processes' sums
    via jax (replaces the reference's NCCL meter)."""

    def __init__(self, name: str = ""):
        self.name = name
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.sum += float(value) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)

    def all_reduce(self):
        import jax
        if jax.process_count() == 1:
            return self
        from jax.experimental import multihost_utils
        import jax.numpy as jnp
        vals = multihost_utils.process_allgather(
            jnp.asarray([self.sum, float(self.count)]))
        self.sum = float(np.asarray(vals)[:, 0].sum())
        self.count = int(np.asarray(vals)[:, 1].sum())
        return self
