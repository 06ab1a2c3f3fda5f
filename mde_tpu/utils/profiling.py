"""Tracing / profiling helpers (SURVEY.md §5.1).

The reference's observability is a process-time ``Timer`` + timestamp banners
(``utils/common_utils.py:139-147, 60-62``). The TPU-native replacement adds:

* :func:`trace` — a context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace (XLA ops, fusion boundaries, HBM usage);
* :class:`StepTimer` — wall-clock per-step EMA with device-sync on demand;
* :func:`device_memory_stats` — per-device live/peak HBM bytes where the
  backend exposes them.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """``with trace("/tmp/jax-trace"): run_steps()`` then load in
    TensorBoard's profile plugin. No-op safe on backends without profiler
    support (the tunneled sandbox TPU may not export device traces)."""
    import jax
    started = False
    try:
        jax.profiler.start_trace(log_dir,
                                 create_perfetto_link=create_perfetto_link)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class StepTimer:
    """Wall-clock EMA of step latency. ``sync=True`` blocks on a pytree of
    device values first so async dispatch doesn't hide device time."""

    def __init__(self, momentum: float = 0.9):
        self.momentum = momentum
        self.ema_ms: Optional[float] = None
        self._t0 = time.perf_counter()

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, sync_on=None) -> float:
        if sync_on is not None:
            import jax
            jax.block_until_ready(sync_on)
        ms = (time.perf_counter() - self._t0) * 1000.0
        self.ema_ms = ms if self.ema_ms is None else (
            self.momentum * self.ema_ms + (1 - self.momentum) * ms)
        return ms


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """{device: {bytes_in_use, peak_bytes_in_use, ...}} where available."""
    import jax
    out: Dict[str, Dict[str, int]] = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {k: int(v) for k, v in stats.items()
                           if isinstance(v, (int, float))}
    return out
