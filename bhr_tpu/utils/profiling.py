"""Profiling: stage timers + jax.profiler trace hooks.

The reference's observability is print-based timing (render.py:4071-4074,
4455-4476) plus perf-budget unit tests. Here: a lightweight `StageTimer`
for per-stage wall-clock accounting, a `device_time` helper that
amortizes the host<->device tunnel round-trip out of measurements, and a
context manager around jax.profiler for deep traces.

Measurement note: on tunneled TPU runtimes a single dispatch+sync pays
one RTT (~tens of ms); `device_time` issues N iterations with ONE final
sync so per-iteration cost approaches true device time.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


class StageTimer:
    """Accumulates wall-clock per named stage; print a summary at the end."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            total = self.totals[name]
            n = self.counts[name]
            lines.append(f"{name:24s} {total * 1000:9.1f} ms "
                         f"({n} calls, {total / n * 1000:7.2f} ms avg)")
        return "\n".join(lines)


def device_time(fn: Callable[[], jnp.ndarray], iters: int = 10,
                warmup: int = 1) -> float:
    """Median-free amortized per-call seconds: N dispatches, one sync.

    `fn` must return a device array each call; results are reduced and
    fetched once at the end so the tunnel RTT is paid once, not N times.
    """
    iters = max(int(iters), 1)
    out = None
    for _ in range(warmup):
        out = fn()
    if out is not None:
        jax.block_until_ready(out)
    acc = None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
        red = jnp.sum(out)
        acc = red if acc is None else acc + red
    float(acc)  # single host sync
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def profiler_trace(log_dir: str = "/tmp/bhr_tpu_trace",
                   enabled: bool = True):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
