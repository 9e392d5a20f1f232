"""Isolate the per-launch cost of jit calls with host-resident numpy
arguments (the engine's dispatch shape) on the dev-tunnel TPU.

probe_tunnel.py showed: RTT 0.04 ms, h2d 1.2 GB/s, but a jit call with
two (4096, 160) uint8 numpy args blocks ~37 ms.  This probe bisects:
arg transfer path (2-D layout? per-array fixed cost?), device-resident
args, explicit device_put, and shape/count scaling.
"""

import json
import time

import numpy as np


def timeit(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(float(np.median(ts)) * 1e3, 3)


def main():
    import jax
    import jax.numpy as jnp

    out = {}
    g = jax.jit(lambda a, b: (a.astype(jnp.int32).sum(1)
                              + b.astype(jnp.int32).sum(1)))
    qb = np.zeros((4096, 160), np.uint8)
    rb = np.zeros((4096, 160), np.uint8)
    jax.block_until_ready(g(qb, rb))

    # A. numpy args (baseline of the mystery)
    out["numpy_args_ms"] = timeit(lambda: jax.block_until_ready(g(qb, rb)))

    # B. device-resident args
    qd, rd = jax.device_put(qb), jax.device_put(rb)
    jax.block_until_ready([qd, rd])
    out["device_args_ms"] = timeit(lambda: jax.block_until_ready(g(qd, rd)))

    # C. explicit device_put of the same arrays, alone
    out["device_put_2d_u8_one_ms"] = timeit(
        lambda: jax.block_until_ready(jax.device_put(qb)))
    out["device_put_2d_u8_two_ms"] = timeit(
        lambda: jax.block_until_ready([jax.device_put(qb),
                                       jax.device_put(rb)]))

    # D. 1-D contiguous same bytes
    q1 = qb.reshape(-1)
    out["device_put_1d_u8_ms"] = timeit(
        lambda: jax.block_until_ready(jax.device_put(q1)))

    # E. int32 2-D same element count
    qi = qb.astype(np.int32)
    out["device_put_2d_i32_ms"] = timeit(
        lambda: jax.block_until_ready(jax.device_put(qi)))

    # F. 2-D uint8 with 128-multiple last dim
    qb128 = np.zeros((4096, 128), np.uint8)
    out["device_put_2d_u8_128_ms"] = timeit(
        lambda: jax.block_until_ready(jax.device_put(qb128)))

    # G. scaling with rows: (128, 160) u8
    qs = np.zeros((128, 160), np.uint8)
    out["device_put_2d_u8_128rows_ms"] = timeit(
        lambda: jax.block_until_ready(jax.device_put(qs)))

    # H. many small scalars/arrays as args (per-arg fixed cost?)
    h = jax.jit(lambda *xs: sum(x.sum() for x in xs))
    args8 = [np.zeros((8,), np.int32) for _ in range(8)]
    jax.block_until_ready(h(*args8))
    out["eight_tiny_numpy_args_ms"] = timeit(
        lambda: jax.block_until_ready(h(*args8)))

    # I. device_put via a batched call (one device_put of a list)
    out["device_put_pair_batched_ms"] = timeit(
        lambda: jax.block_until_ready(jax.device_put((qb, rb))))

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
