"""Calibrate the dev-tunnel host<->device channel: dispatch RTT and
transfer bandwidth in both directions.

These numbers decompose the e2e engine gap (VERDICT r3 item 1): the
kernel runs in ~2-5 ms per batch while the user-visible path pays tens
of ms per launch.  This probe measures what a directly-attached chip
would NOT pay: per-dispatch round-trip latency and the tunnel's
host<->device bandwidth.

Usage: python tools/probe_tunnel.py
Prints one JSON line with the calibration numbers.
"""

import json
import sys
import time

import numpy as np


def timeit(fn, reps=7):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return {"median_ms": round(float(np.median(ts)) * 1e3, 3),
            "min_ms": round(float(np.min(ts)) * 1e3, 3),
            "max_ms": round(float(np.max(ts)) * 1e3, 3)}


def main():
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    dev = jax.devices()[0]
    out = {"backend": backend, "device": str(dev)}

    # 1. dispatch RTT: tiny jitted op, eager dispatch + block
    tiny = jax.device_put(np.ones((8,), np.int32))
    f = jax.jit(lambda x: x + 1)
    jax.block_until_ready(f(tiny))
    out["rtt_tiny_op"] = timeit(lambda: jax.block_until_ready(f(tiny)))

    # 1b. dispatch-only (no block): is the enqueue itself synchronous?
    def enq():
        f(tiny)
    out["dispatch_enqueue"] = timeit(enq)
    jax.block_until_ready(f(tiny))

    # 2. host->device bandwidth at several sizes
    for mb in (1, 4, 16):
        buf = np.random.default_rng(0).integers(
            0, 255, size=(mb << 20,), dtype=np.uint8)
        jax.block_until_ready(jax.device_put(buf))  # warm any layout path
        r = timeit(lambda: jax.block_until_ready(jax.device_put(buf)),
                   reps=3)
        r["MBps"] = round(mb / (r["median_ms"] / 1e3), 1)
        out[f"h2d_{mb}MB"] = r

    # 3. device->host bandwidth
    for mb in (1, 4, 16):
        dbuf = jax.device_put(np.zeros((mb << 20,), np.uint8))
        jax.block_until_ready(dbuf)
        r = timeit(lambda: np.asarray(dbuf), reps=3)
        r["MBps"] = round(mb / (r["median_ms"] / 1e3), 1)
        out[f"d2h_{mb}MB"] = r

    # 4. a realistic launch: jitted fn taking NUMPY args (forces the
    # arg transfer inside the call) of cfg7-bucket size, tiny compute
    qb = np.zeros((4096, 160), np.uint8)
    rb = np.zeros((4096, 160), np.uint8)
    g = jax.jit(lambda a, b: (a.astype(jnp.int32).sum(1)
                              + b.astype(jnp.int32).sum(1)))
    jax.block_until_ready(g(qb, rb))
    out["launch_numpy_args_1p3MB"] = timeit(
        lambda: jax.block_until_ready(g(qb, rb)), reps=5)
    out["launch_numpy_args_dispatch_only"] = timeit(lambda: g(qb, rb),
                                                    reps=5)
    jax.block_until_ready(g(qb, rb))

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
