"""Span timer for the engine's metric contract.

The reference instruments with ad-hoc `time.time()` prints (frame fetch /
processing / prefill / e2e breakdown, reference
lvu/models/qwen25_lvu.py:748-753, qwen25_lvu_interleaved.py:929-934). This
utility produces the same labeled spans as structured data, and can emit the
reference-style report. jax.profiler traces are layered separately.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class SpanTimer:
    def __init__(self):
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
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
