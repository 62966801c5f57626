"""Span timer for the engine's metric contract.

The reference instruments with ad-hoc `time.time()` prints (frame fetch /
processing / prefill / e2e breakdown, reference
lvu/models/qwen25_lvu.py:748-753, qwen25_lvu_interleaved.py:929-934). This
utility produces the same labeled spans as structured data, and can emit the
reference-style report. jax.profiler traces are layered separately.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict

_barrier_fn = None


def device_barrier():
    """Block until every program dispatched so far has finished.

    TPU executes programs in enqueue order on one stream, so a trivial
    jitted computation enqueued now completes only after all pending work —
    a cheap full-device barrier without holding references to live arrays."""
    global _barrier_fn
    import jax
    import jax.numpy as jnp

    if _barrier_fn is None:
        _barrier_fn = jax.jit(lambda: jnp.zeros(()))
    _barrier_fn().block_until_ready()


class SpanTimer:
    """sync=True (or env QV_SYNC_SPANS=1) inserts a device barrier at both
    span edges so the spans PARTITION device time instead of measuring
    dispatch time — under async dispatch, queued prefill work otherwise
    piles into whichever span first synchronizes (usually `decode`). Sync
    mode serializes the overlap the engine works to create, so it is for
    attribution runs, never for headline timing. Caveat: over a REMOTE
    device transport each barrier costs a round trip, which inflates
    many-iteration spans (measured ~300 ms/barrier in tunnel degradation
    windows) — attribution is trustworthy on locally-attached devices."""

    def __init__(self, sync: bool | None = None):
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)
        self.sync = (
            os.environ.get("QV_SYNC_SPANS", "") == "1" if sync is None
            else sync
        )

    @contextlib.contextmanager
    def span(self, name: str):
        if self.sync:
            device_barrier()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                device_barrier()
            dt = time.perf_counter() - t0
            self._totals[name] += dt
            self._counts[name] += 1

    def add(self, name: str, seconds: float):
        self._totals[name] += seconds
        self._counts[name] += 1

    def totals(self) -> Dict[str, float]:
        return dict(self._totals)

    def report(self) -> str:
        """Reference-style breakdown (README.md:350-358 output contract)."""
        lines = []
        for name, tot in sorted(self._totals.items(), key=lambda kv: -kv[1]):
            lines.append(f"{name}: {tot:.2f}s (n={self._counts[name]})")
        return "\n".join(lines)
