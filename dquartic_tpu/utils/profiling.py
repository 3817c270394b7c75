"""Profiling and timing utilities.

The reference's observability is ad hoc host-side instrumentation
(memory_profiler decorators, tracemalloc brackets, psutil RSS —
/root/reference/dquartic/utils/data_generation.py:20-23, 344-360 and
test_duckdb_parquet_fetching.py). The TPU-native equivalents:

  * :func:`trace` — context manager around ``jax.profiler`` emitting an
    xplane trace viewable in TensorBoard/XProf.
  * :class:`StepTimer` — wall-clock step statistics with proper
    ``block_until_ready`` boundaries (the headline metric harness).
  * :func:`device_memory_stats` — per-device HBM usage.
  * :func:`host_rss_mb` — the psutil RSS probe, same as the reference's.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/dquartic_trace"):
    """Capture a jax.profiler trace for the enclosed block."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Collect per-step wall-clock timings around device work.

    Usage::

        timer = StepTimer()
        for batch in data:
            with timer.step():
                state, metrics = train_step(state, batch, ...)
        print(timer.summary())

    Only the exit of the context syncs when ``sync=True``; leave False to
    measure pipelined dispatch (the realistic steady-state number).
    """

    def __init__(self, sync: bool = False):
        self.sync = sync
        self.times: List[float] = []
        self._last_out = None

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield self
        if self.sync and self._last_out is not None:
            import jax

            jax.block_until_ready(self._last_out)
        self.times.append(time.perf_counter() - t0)

    def observe(self, out):
        """Register the step output for sync-mode blocking."""
        self._last_out = out
        return out

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times[1:] or self.times) * 1000.0  # skip warmup
        return {
            "steps": len(self.times),
            "mean_ms": float(arr.mean()),
            "p50_ms": float(np.percentile(arr, 50)),
            "p95_ms": float(np.percentile(arr, 95)),
            "max_ms": float(arr.max()),
        }


def device_memory_stats() -> List[Dict[str, float]]:
    """Per-device memory stats in MB (empty when unsupported)."""
    import jax

    out = []
    for d in jax.devices():
        try:
            s = d.memory_stats() or {}
            out.append(
                {
                    "device": str(d),
                    "bytes_in_use_mb": s.get("bytes_in_use", 0) / 1e6,
                    "peak_bytes_mb": s.get("peak_bytes_in_use", 0) / 1e6,
                    "bytes_limit_mb": s.get("bytes_limit", 0) / 1e6,
                }
            )
        except Exception:
            continue
    return out


def host_rss_mb() -> Optional[float]:
    """Resident set size of this process in MB (reference
    data_generation.py:20-23)."""
    try:
        import psutil

        return psutil.Process(os.getpid()).memory_info().rss / 1024 / 1024
    except ImportError:
        return None
