"""Structured tracing — jax.profiler integration.

The reference has no tracer (torch.profiler imported but unused, reference
lvu/models/qwen25_lvu.py:23; SURVEY.md section 5.1). This module provides the
TPU-native upgrade: optional jax.profiler traces around engine phases plus
named TraceAnnotations that show up in Perfetto/XProf timelines.

Usage:
    with maybe_trace("/tmp/qv_trace"):       # env QV_TRACE_DIR also works
        lvu.generate(...)
    with annotate("prefill_group"):          # nestable, cheap no-op when off
        ...
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional

import jax


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str] = None):
    """Start a jax.profiler trace if a directory is given (or QV_TRACE_DIR
    env is set); no-op otherwise."""
    trace_dir = trace_dir or os.environ.get("QV_TRACE_DIR")
    if not trace_dir:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)
