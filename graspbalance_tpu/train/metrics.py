"""Metric aggregation + logging.

The reference aggregates every end_points key matching
loss|acc|prec|recall|count into TensorBoard every 10 batches
(train.py:157-174). Here: a windowed aggregator + JSONL sink (always) and a
TensorBoard sink when a writer lib is importable (never required).
Per-step wall-clock timing and optional jax.profiler traces cover the
reference's missing tracing story (SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import json
import os
import time

import jax
import numpy as np


class MetricAggregator:
    """Windowed mean aggregator. Sums stay as device arrays (lazy adds) so
    per-step updates never force a host sync — the training pipeline only
    blocks at flush(), i.e. every log_every steps (the reference's
    stat_dict += .item() per batch synchronizes every step,
    train.py:157-160)."""

    def __init__(self):
        self._sums: dict[str, object] = {}
        self._n = 0

    def update(self, metrics: dict):
        for k, v in metrics.items():
            self._sums[k] = v if k not in self._sums else self._sums[k] + v
        self._n += 1

    def flush(self) -> dict:
        if self._n == 0:
            return {}
        out = {k: float(np.asarray(v)) / self._n for k, v in self._sums.items()}
        self._sums, self._n = {}, 0
        return out


class MetricLogger:
    def __init__(self, log_dir: str, name: str = "train"):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, f"{name}_metrics.jsonl"), "a")
        self._txt = open(os.path.join(log_dir, "log_train.txt"), "a")
        self._tb = None
        try:  # optional TensorBoard sink
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(os.path.join(log_dir, name))
        except Exception:
            pass

    def log(self, step: int, metrics: dict, echo: bool = True):
        rec = {"step": int(step), "time": time.time(), **{
            k: float(v) for k, v in metrics.items()
        }}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), int(step))
        if echo:
            msg = f"step {step}: " + " ".join(
                f"{k}={float(v):.4f}" for k, v in sorted(metrics.items())
            )
            self._txt.write(msg + "\n")
            self._txt.flush()
            print(msg)

    def close(self):
        self._jsonl.close()
        self._txt.close()
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def step_timer(metrics_out: dict, key: str = "time/step_ms"):
    t0 = time.perf_counter()
    yield
    metrics_out[key] = (time.perf_counter() - t0) * 1000.0


@contextlib.contextmanager
def profiler_trace(log_dir: str, enabled: bool = False):
    """jax.profiler trace hook (SURVEY.md §5: reference has no tracing)."""
    if not enabled:
        yield
        return
    trace_dir = os.path.join(log_dir, "profile")
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
