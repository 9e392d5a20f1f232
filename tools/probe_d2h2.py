"""Second d2h probe: pipelining and decay behavior of the tunnel's
device->host path.

Questions:
  1. Do N outstanding copy_to_host_async transfers overlap (total ~ max)
     or serialize (total ~ sum)?
  2. Does the post-d2h dispatch poisoning decay with idle time?
  3. Is one concatenated d2h of N buffers cheaper than N separate?
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    out = {}
    n = 1 << 18  # 256KB each

    f = jax.jit(lambda s: (jnp.arange(n, dtype=jnp.int32) % 251
                           + s).astype(jnp.uint8))
    jax.block_until_ready(f(np.int32(0)))
    seed = [0]

    def fresh():
        seed[0] += 1
        d = f(np.int32(seed[0]))
        d.block_until_ready()
        return d

    # warm the d2h path once
    np.asarray(fresh())

    # 1a. four separate d2h, serial
    bufs = [fresh() for _ in range(4)]
    t0 = time.perf_counter()
    for b in bufs:
        np.asarray(b)
    out["four_256KB_serial_ms"] = round((time.perf_counter() - t0) * 1e3, 1)

    # 1b. four d2h with async prefetch first
    bufs = [fresh() for _ in range(4)]
    t0 = time.perf_counter()
    for b in bufs:
        b.copy_to_host_async()
    for b in bufs:
        np.asarray(b)
    out["four_256KB_async_ms"] = round((time.perf_counter() - t0) * 1e3, 1)

    # 1c. one concatenated 1MB d2h (device-side concat first)
    cat = jax.jit(lambda a, b, c, d: jnp.concatenate([a, b, c, d]))
    bufs = [fresh() for _ in range(4)]
    d = cat(*bufs)
    d.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(d)
    out["one_1MB_concat_ms"] = round((time.perf_counter() - t0) * 1e3, 1)

    # 2. poisoning decay: d2h, then tiny ops at 0/10/50/200 ms idle
    g = jax.jit(lambda a: a + 1)
    tiny = jax.device_put(np.ones((8,), np.int32))
    jax.block_until_ready(g(tiny))
    for idle_ms in (0, 10, 50, 200):
        np.asarray(fresh())
        time.sleep(idle_ms / 1e3)
        t0 = time.perf_counter()
        jax.block_until_ready(g(tiny))
        out[f"tiny_after_d2h_idle{idle_ms}ms"] = round(
            (time.perf_counter() - t0) * 1e3, 2)

    # 3. tiny scalar d2h (engine single-pair fetch shape)
    ts = []
    for _ in range(4):
        d = fresh()
        s = jax.jit(lambda x: x[:4].astype(jnp.int32))(d)
        s.block_until_ready()
        t0 = time.perf_counter()
        np.asarray(s)
        ts.append(round((time.perf_counter() - t0) * 1e3, 2))
    out["d2h_16B_ms"] = ts

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
