"""Profiling / tracing utilities.

The reference's only timing is ad-hoc prints (train/train.py:114-119,
inference_test.py:193-217). Here:

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace directory.
- :class:`StepTimer` — honest step timing with host-materialization fences
  (``block_until_ready`` alone reports early through remote TPU relays —
  measured in this environment) and warmup discard.
- :func:`device_memory_stats` — live HBM usage per device when the backend
  exposes it.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, python_tracer: bool = False):
    """``with trace("logs/profile"): run_steps()`` -> TensorBoard trace.

    The Python tracer is OFF by default: the exported chrome trace caps at
    1e6 events and a profiled bench loop emits enough host-python events to
    evict every device op from the export (measured — a 10-iter serving
    trace had 1,000,000 python events and zero XLA op events)."""
    options = None
    try:
        options = jax.profiler.ProfileOptions()
        options.python_tracer_level = 1 if python_tracer else 0
    except Exception:  # noqa: BLE001 — older jax without ProfileOptions
        options = None
    jax.profiler.start_trace(log_dir, profiler_options=options)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def fence(x) -> None:
    """Force completion of everything dispatched before ``x`` by
    materializing a scalar on host (in-order execution guarantees)."""
    leaves = jax.tree.leaves(x)
    if leaves:
        np.asarray(jax.jit(lambda v: v.astype(jnp.float32).sum())(leaves[0]))


class StepTimer:
    """Accumulates wall-clock per step with fenced boundaries.

    >>> timer = StepTimer(warmup=3)
    >>> for batch in data:
    ...     with timer.step():
    ...         out = train_step(...)
    ...     timer.mark(out)   # fence + record
    """

    def __init__(self, warmup: int = 3) -> None:
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._seen = 0

    @contextlib.contextmanager
    def step(self):
        self._t0 = time.perf_counter()
        yield

    def mark(self, out) -> None:
        fence(out)
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_ms": float(arr.mean() * 1e3),
            "median_ms": float(np.median(arr) * 1e3),
            "p90_ms": float(np.percentile(arr, 90) * 1e3),
            "steps_per_sec": float(1.0 / arr.mean()),
        }


def device_memory_stats() -> List[Dict]:
    out = []
    for d in jax.devices():
        try:
            stats = d.memory_stats() or {}
            out.append(
                {
                    "device": str(d),
                    "bytes_in_use": stats.get("bytes_in_use"),
                    "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                    "bytes_limit": stats.get("bytes_limit"),
                }
            )
        except Exception:  # noqa: BLE001 — backend without memory_stats
            out.append({"device": str(d)})
    return out
