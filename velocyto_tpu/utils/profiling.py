"""Profiling utilities (new capability vs the reference, which has none
beyond log timestamps - SURVEY.md §5).

Wraps the JAX profiler so any pipeline stage can be traced and viewed
in TensorBoard/Perfetto:

    from velocyto_tpu.utils.profiling import trace
    with trace("/tmp/vtpu-trace"):
        vlm.estimate_transition_prob(...)

`stage_timer` gives lightweight wall-clock stage telemetry with a
device sync, so on-accelerator time is attributed to the stage that
launched it rather than to the next host sync point.
"""
from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a JAX profiler trace (XLA ops, device timeline) to logdir."""
    import jax
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class stage_timer:
    """Accumulating per-stage wall-clock timer with device sync.

        timers = stage_timer()
        with timers("knn"):
            ...
        timers.report()
    """

    def __init__(self, sync: bool = True) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self._sync = sync

    def _sync_devices(self) -> None:
        if not self._sync:
            return
        try:
            import jax
            for d in jax.live_arrays():
                d.block_until_ready()
        except Exception:
            pass

    @contextlib.contextmanager
    def __call__(self, name: str) -> Iterator[None]:
        self._sync_devices()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._sync_devices()
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, log: Optional[logging.Logger] = None) -> str:
        lines = [f"{name:>24s}: {tot:8.3f}s  ({self.counts[name]}x)"
                 for name, tot in
                 sorted(self.totals.items(), key=lambda kv: -kv[1])]
        text = "\n".join(lines)
        (log or logging).info("stage timings:\n%s", text)
        return text
