"""Tracing / profiling utilities.

The reference has none (SURVEY §5: tqdm bars + CUDA_LAUNCH_BLOCKING only).
Here: jax.profiler trace capture around any callable, and a lightweight
stage timer that forces completion via a device-to-host transfer of a small
output buffer — the reliable barrier on remote-dispatch platforms where
block_until_ready can return early (observed on the tunneled single-chip
environment; see bench.py)."""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax
import numpy as np


def sync(tree: Any) -> Any:
    """Barrier: device-to-host copy of the first (smallest) array leaf."""
    leaves = [leaf for leaf in jax.tree.leaves(tree) if hasattr(leaf, "shape")]
    if leaves:
        smallest = min(leaves, key=lambda a: int(np.prod(a.shape)))
        np.asarray(smallest)
    return tree


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context: view with xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates wall-clock per named stage; each stop() syncs the stage's
    outputs so device work is attributed to the right stage."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, outputs: Any = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if outputs is not None:
                sync(outputs)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def timed(self, name: str, fn: Callable) -> Callable:
        def wrapped(*a, **kw):
            t0 = time.perf_counter()
            out = sync(fn(*a, **kw))
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            return out

        return wrapped

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "calls": self.counts[name],
                "mean_ms": round(1000 * self.totals[name] / self.counts[name], 2),
            }
            for name in self.totals
        }
