"""Profiling / tracing hooks.

The reference has no tracing at all (SURVEY.md §5.1); here dispatch can
be annotated for the JAX profiler so device kernels show up named in
TensorBoard / Perfetto traces.

Usage:
    with profiling.trace_region("align_batch"):
        aligner.align_batch(...)
    profiling.start_server(9999)          # live capture endpoint
    with profiling.capture("/tmp/trace"): # programmatic capture
        ...
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace_region(name: str):
    """Named region in the JAX profiler timeline (no-op cost when no
    capture is active)."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


def start_server(port: int = 9999):
    """Start the profiler's capture server (TensorBoard 'capture profile')."""
    import jax.profiler

    return jax.profiler.start_server(port)


@contextlib.contextmanager
def capture(log_dir: str):
    """Capture a device trace for the duration of the block."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
