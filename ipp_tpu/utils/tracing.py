"""Tracing / profiling helpers.

The reference has no tracer (SURVEY §5: tqdm bars + tic/toc logs); here
stages can capture real device profiles via jax.profiler, plus a
lightweight annotation context that composes with StageTimer.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator

__all__ = ["trace_to", "annotate"]


@contextlib.contextmanager
def trace_to(log_dir, enabled: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace (TensorBoard/Perfetto readable) for the
    enclosed block.  No-op when disabled."""
    if not enabled:
        yield
        return
    import jax

    log_dir = str(log_dir)
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region visible in profiler traces (TraceAnnotation)."""
    try:
        import jax

        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield
