#!/usr/bin/env python
"""Time the scol (substitution-column tensor) build variants on TPU.

CAVEAT (r5): uses identical-call chains — see the CSE note in
tools/perf_lab.py; A/B orderings valid, absolute magnitudes 1/N-scaled.

The scan kernel's input prep — one-hot matmul + lanes-last transpose —
showed up as ~2 ms of the 6 ms headline batch (tools/perf_lab.py full
vs base).  This times each stage and candidate reformulations:

  dot_f32   — current build_scol einsum (f32 accum) -> int8
  dot_s8    — int8 x int8 -> int32 MXU dot -> int8
  transpose — the (B, Rp, Qp) -> (nb, Rp, Qp, LANES) relayout alone
  fused     — build + transpose in one jit (what scan_score_align runs)
  fused_s8  — int8 dot + transpose in one jit
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES = 128


def with_timeout(fn, t):
    box = {}

    def work():
        try:
            box["out"] = fn()
        except Exception as e:  # noqa: BLE001
            box["err"] = e

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(t)
    if th.is_alive():
        raise TimeoutError(f"no result in {t}s")
    if "err" in box:
        raise box["err"]
    return box.get("out")


def time_fn(name, f, seed, dep):
    import jax

    t0 = time.time()
    with_timeout(lambda: jax.block_until_ready(f(seed)), 180)
    compile_s = time.time() - t0
    best = None
    for iters in (4, 16, 16):
        def window(iters=iters):
            x = seed
            t0 = time.time()
            out = None
            for _ in range(iters):
                out = f(x)
                x = dep(seed, out)
            jax.block_until_ready(out)
            return (time.time() - t0) / iters
        try:
            dt = with_timeout(window, 90)
        except Exception as e:  # noqa: BLE001
            print(f"[{name}] window x{iters} failed: {e}", flush=True)
            continue
        best = dt if best is None else min(best, dt)
    print(json.dumps({"variant": name, "compile_s": round(compile_s, 2),
                      "best_ms": None if best is None else
                      round(best * 1e3, 3)}), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    B, Qp, Rp, A = 8192, 160, 160, 25
    nb = B // LANES
    rng = np.random.default_rng(0)
    profile = jax.device_put(
        rng.integers(-4, 12, size=(B, Qp, A)).astype(np.int32))
    ridx = jax.device_put(rng.integers(0, A, size=(B, Rp)).astype(np.int32))
    scol_pre = jax.device_put(
        rng.integers(-4, 12, size=(B, Rp, Qp)).astype(np.int8))
    jax.block_until_ready([profile, ridx, scol_pre])

    @jax.jit
    def dot_f32(ridx):
        onehot = jax.nn.one_hot(ridx, A, dtype=jnp.float32)
        s = jax.lax.dot_general(
            onehot, profile.astype(jnp.float32),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return s.astype(jnp.int8)

    @jax.jit
    def dot_s8(ridx):
        onehot = jax.nn.one_hot(ridx, A, dtype=jnp.int8)
        s = jax.lax.dot_general(
            onehot, profile.astype(jnp.int8),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        return s.astype(jnp.int8)

    @jax.jit
    def transpose(scol):
        return scol.reshape(nb, LANES, Rp, Qp).transpose(0, 2, 3, 1)

    @jax.jit
    def fused(ridx):
        return transpose(dot_f32(ridx))

    @jax.jit
    def fused_s8(ridx):
        return transpose(dot_s8(ridx))

    rdep = lambda seed, out: seed + (out.reshape(-1)[:1].astype(
        jnp.int32).reshape(1, 1) & 0)
    sdep = lambda seed, out: seed + (out.reshape(-1)[:1].reshape(1, 1, 1) & 0)

    time_fn("dot_f32", dot_f32, ridx, rdep)
    time_fn("dot_s8", dot_s8, ridx, rdep)
    time_fn("transpose", transpose, scol_pre, sdep)
    time_fn("fused", fused, ridx, rdep)
    time_fn("fused_s8", fused_s8, ridx, rdep)


if __name__ == "__main__":
    try:
        main()
    finally:
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)
