"""Characterize device->host transfers of FRESH device buffers (results
of device computation — the engine fetch path's exact shape).

probe_tunnel.py reused one device buffer per size, so reps 2+ hit the
jax host-copy cache; its first-call numbers showed seconds-long stalls.
Here every rep fetches a NEW buffer produced by a jitted op, matching
what PendingResult.fetch() pays per engine launch.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    out = {}

    key = [np.int32(0)]

    def fresh(nbytes):
        # a new device array each call: jitted iota + seed so no caching
        n = nbytes
        f = fresh.cache.get(n)
        if f is None:
            f = fresh.cache[n] = jax.jit(
                lambda s: (jnp.arange(n, dtype=jnp.int32) % 251
                           + s).astype(jnp.uint8))
            jax.block_until_ready(f(np.int32(0)))
        key[0] += 1
        d = f(np.int32(key[0]))
        d.block_until_ready()
        return d
    fresh.cache = {}

    for label, nbytes in (("64KB", 1 << 16), ("1MB", 1 << 20),
                          ("13MB", 13 << 20)):
        ts = []
        for _ in range(5):
            d = fresh(nbytes)
            t0 = time.perf_counter()
            np.asarray(d)
            ts.append((time.perf_counter() - t0) * 1e3)
        out[f"d2h_fresh_{label}_ms"] = [round(t, 2) for t in ts]

    # with copy_to_host_async started right after compute
    ts = []
    for _ in range(5):
        d = fresh(13 << 20)
        d.copy_to_host_async()
        t0 = time.perf_counter()
        np.asarray(d)
        ts.append((time.perf_counter() - t0) * 1e3)
    out["d2h_fresh_13MB_async_ms"] = [round(t, 2) for t in ts]

    # does a d2h stall poison the next dispatch?
    g = jax.jit(lambda a: a + 1)
    tiny = jax.device_put(np.ones((8,), np.int32))
    jax.block_until_ready(g(tiny))
    ts = []
    for _ in range(5):
        d = fresh(1 << 20)
        np.asarray(d)
        t0 = time.perf_counter()
        jax.block_until_ready(g(tiny))
        ts.append((time.perf_counter() - t0) * 1e3)
    out["tiny_op_after_d2h_ms"] = [round(t, 2) for t in ts]

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
