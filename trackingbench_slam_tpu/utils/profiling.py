"""Tracing / profiling utilities.

The reference's only instrumentation is ad-hoc chrono timing in one demo
(test/test_projection.cpp:156,190-192). This module provides:
  * stage timers with device fencing (readback-based — on remote/tunneled
    backends `block_until_ready` can return before execution finishes, so
    the fence reads one scalar back)
  * jax.profiler trace capture around a region (xplane dump for xprof)
  * a running per-stage stats table
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any

import jax
import jax.numpy as jnp


def fence(tree: Any) -> None:
    """Force real completion of a pytree: block + one scalar readback."""
    jax.block_until_ready(tree)
    leaves = jax.tree_util.tree_leaves(tree)
    for leaf in leaves:
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0) > 0:
            jnp.asarray(leaf).ravel()[0].item()
            break


class StageTimer:
    """Accumulates wall-time per named stage.

    >>> t = StageTimer()
    >>> with t.time("extract"):
    ...     out = extract(...)  # fenced on exit
    >>> print(t.report())
    """

    def __init__(self, fence_outputs: bool = True):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self._fence = fence_outputs

    @contextlib.contextmanager
    def time(self, name: str, result_tree: Any = None):
        t0 = time.time()
        try:
            yield
        finally:
            if self._fence and result_tree is not None:
                fence(result_tree)
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def add(self, name: str, seconds: float):
        self.totals[name] += seconds
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name:30s} {tot * 1000:10.1f} ms total "
                         f"{tot / max(n, 1) * 1000:8.2f} ms/call x{n}")
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tbs_trace"):
    """Capture a jax.profiler trace (open with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
