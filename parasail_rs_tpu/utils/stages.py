"""Per-stage wall-time accounting of the engine host path.

The reference's hot path is a single opaque FFI call; here one user call
crosses four host stages around the device kernel — pack (sequences →
padded tensors), dispatch (trace-cache lookup + async enqueue + arg
upload), fetch (blocking device→host transfer of results), and build
(Alignment object construction).  On the dev-tunnel TPU the fetch stage
pays a fixed ~25-50 ms per blocking transfer that a directly-attached
chip does not (tools/probe_d2h.py), so an aggregate e2e number cannot
distinguish framework overhead from tunnel overhead.  This module gives
the decomposition: bench.py enables it around each e2e config and emits
the per-stage totals into the driver artifact.

Disabled by default; a single module-level bool keeps the cost of an
inactive ``stage(...)`` block to one attribute read.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict

enabled = False
_lock = threading.Lock()
_acc: dict[str, float] = defaultdict(float)
_cnt: dict[str, int] = defaultdict(int)


def enable(on: bool = True) -> None:
    global enabled
    enabled = on


def reset() -> None:
    with _lock:
        _acc.clear()
        _cnt.clear()


def record(name: str, seconds: float) -> None:
    with _lock:
        _acc[name] += seconds
        _cnt[name] += 1


def snapshot() -> dict[str, dict[str, float]]:
    """{stage: {"ms": total, "calls": n}} accumulated since reset()."""
    with _lock:
        return {k: {"ms": round(_acc[k] * 1e3, 2), "calls": _cnt[k]}
                for k in sorted(_acc)}


@contextlib.contextmanager
def stage(name: str):
    if not enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        record(name, time.perf_counter() - t0)


@contextlib.contextmanager
def measuring():
    """Enable + reset for a `with` block; restores the previous state."""
    prev = enabled
    enable(True)
    reset()
    try:
        yield
    finally:
        enable(prev)
