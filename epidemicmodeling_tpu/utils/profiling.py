"""Lightweight tracing/profiling utilities (SURVEY.md §5: the reference has
none — progress is bare disp() statements; here every pipeline stage can be
timed and optionally captured with the JAX profiler)."""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class StageTimer:
    """Collects wall-clock per named stage; blocks on device results."""

    def __init__(self, log_fn=None):
        self.times = {}
        self._log = log_fn

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.time()
        try:
            yield
        finally:
            if block_on is not None:
                import jax
                jax.block_until_ready(block_on)
            dt = time.time() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            if self._log:
                self._log(f"[{name}] {dt:.2f}s")

    def summary(self) -> str:
        total = sum(self.times.values())
        lines = [f"{k}: {v:.2f}s ({100*v/total:.0f}%)"
                 for k, v in sorted(self.times.items(), key=lambda kv: -kv[1])]
        return f"total {total:.2f}s | " + ", ".join(lines)


@contextlib.contextmanager
def jax_trace(log_dir: Optional[str] = None):
    """Capture a JAX profiler trace viewable in TensorBoard/Perfetto when a
    log_dir is given; no-op otherwise."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
