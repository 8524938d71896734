"""Timing / profiling helpers.

The reference hand-rolls wall-clock timing around its GPU calls with
explicit stream synchronization (ref dft.py:205-208, 245-261).  The JAX
equivalents: block_until_ready-fenced timers plus optional jax.profiler
traces for TensorBoard.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulates fenced wall-clock per named phase (the 'xc_times' list
    of ref dft.py:195,208 generalized)."""

    def __init__(self):
        self.times = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.time()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.times[name].append(time.time() - t0)

    def avg_ms(self, name: str) -> float:
        ts = self.times.get(name)
        return sum(ts) / len(ts) * 1000.0 if ts else 0.0

    def report(self) -> str:
        lines = ["Kernel statistics (avg per call):"]
        for name, ts in self.times.items():
            lines.append(
                f"  {name}: {sum(ts)/len(ts)*1000.0:.4f} ms over {len(ts)} calls"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
