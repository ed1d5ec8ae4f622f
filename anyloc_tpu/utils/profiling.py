"""Profiling / tracing utilities (SURVEY.md §5 tracing row: the reference
only wall-clocks ``main`` and counts FLOPs with torchscan; here we expose
jax.profiler traces, per-stage timers, and XLA cost analysis)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class StageTimer:
    """Wall-clock per-stage accumulation with device fencing.

    NOTE: under the axon TPU tunnel ``block_until_ready`` does not reliably
    fence (see bench.py) — ``fence`` fetches a scalar from the array instead.
    """

    def __init__(self):
        self.times: Dict[str, float] = {}

    @staticmethod
    def fence(x) -> None:
        import jax.numpy as jnp

        if hasattr(x, "block_until_ready"):
            float(jnp.ravel(x)[0])

    @contextlib.contextmanager
    def stage(self, name: str, fence_on=None):
        t0 = time.perf_counter()
        yield
        if fence_on is not None:
            self.fence(fence_on)
        self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.times.values()) or 1.0
        lines = [
            f"{k:>24}: {v:8.3f}s ({100 * v / total:5.1f}%)"
            for k, v in sorted(self.times.items(), key=lambda kv: -kv[1])
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def flops_of(fn, *args) -> Optional[float]:
    """Static FLOP estimate from XLA cost analysis (replaces torchscan,
    dvgl util.py:14-19). Returns None when the backend can't analyze."""
    import jax

    try:
        lowered = jax.jit(fn).lower(*args)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return None
