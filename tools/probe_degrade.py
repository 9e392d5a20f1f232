"""Characterize the tunnel's degraded mode: what flips it, what it costs,
and whether anything restores the fast path.

Observed: before any d2h, uploads run ~1.5 GB/s and launches block in
~2 ms; after ONE np.asarray (any size), blocking ops cost ~30 ms and a
5 MB-arg launch ~200 ms.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label}: {1e3*(time.perf_counter()-t0):.1f} ms",
          file=sys.stderr, flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    buf = np.random.default_rng(0).integers(
        0, 255, size=(5 << 20,), dtype=np.uint8)
    g = jax.jit(lambda x: x.astype(jnp.int32).sum())
    jax.block_until_ready(g(jax.device_put(buf)))

    for rep in range(2):
        t("h2d 5MB (clean)", lambda: jax.block_until_ready(
            jax.device_put(buf)))
    d = g(jax.device_put(buf))
    d.block_until_ready()
    t("first d2h (4B scalar)", lambda: np.asarray(d))
    for rep in range(3):
        t("h2d 5MB (post-d2h)", lambda: jax.block_until_ready(
            jax.device_put(buf)))
    # recovery attempts
    time.sleep(1.0)
    t("h2d 5MB (after 1s idle)", lambda: jax.block_until_ready(
        jax.device_put(buf)))
    for _ in range(20):
        g(jax.device_put(np.ones(8, np.uint8)))
    t("h2d 5MB (after tiny-op burst)", lambda: jax.block_until_ready(
        jax.device_put(buf)))
    # does async h2d (no block) stay fast? dispatch N uploads then block once
    t0 = time.perf_counter()
    ds = [jax.device_put(buf) for _ in range(4)]
    t1 = time.perf_counter()
    jax.block_until_ready(ds)
    print(f"4x5MB h2d post-d2h: enqueue={1e3*(t1-t0):.1f} ms "
          f"block={1e3*(time.perf_counter()-t1):.1f} ms",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
