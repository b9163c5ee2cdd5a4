"""Tracing / profiling hooks (SURVEY.md section 5).

The reference's only profiling artifact is a FLOP counter in its dormant
hdit model; wall-clock is eyeballed via tqdm.  Here: jax.profiler trace
capture (XLA/TPU timeline viewable in TensorBoard/Perfetto), phase timers
that bracket a device sync, and a step-rate meter - wired into main.py via
``--profile`` and the trainer's log stream.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace into ``logdir`` for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates wall-clock per named phase; `sync` fetches a tiny array
    to force device completion (block_until_ready is unreliable over the
    axon tunnel - see bench.py)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_value is not None:
                np.asarray(jax.tree.leaves(sync_value)[0]).ravel()[:1]
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {
            f"time/{k}_ms": 1e3 * self.totals[k] / max(self.counts[k], 1)
            for k in self.totals
        }


class StepRate:
    """Images/sec EMA for the trainer log stream."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self._t: Optional[float] = None
        self.rate = 0.0

    def tick(self, n_items: int) -> float:
        now = time.perf_counter()
        if self._t is not None:
            inst = n_items / max(now - self._t, 1e-9)
            self.rate = inst if self.rate == 0 else (
                self.alpha * inst + (1 - self.alpha) * self.rate
            )
        self._t = now
        return self.rate
