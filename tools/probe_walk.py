"""Prototype: device-side batched traceback walk — is the per-step
B-element gather fast enough on TPU?

Times a lax.scan of Qp+Rp steps over a (B, Qp, Rp) int8 plane where each
step gathers one flag per pair plus qidx/ridx chars, at cfg4's shape
(B=512, 160x160).  Compares against the current path's plane-transfer
cost (13 MB d2h in degraded mode).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    B, Qp, Rp = 512, 160, 160
    L = Qp + Rp
    rng = np.random.default_rng(0)
    trace = jax.device_put(
        rng.integers(0, 127, size=(B, Qp, Rp)).astype(np.int8))
    qidx = jax.device_put(rng.integers(0, 25, size=(B, Qp)).astype(np.int32))
    ridx = jax.device_put(rng.integers(0, 25, size=(B, Rp)).astype(np.int32))
    ei = jax.device_put(np.full(B, Qp - 1, np.int32))
    ej = jax.device_put(np.full(B, Rp - 1, np.int32))
    jax.block_until_ready([trace, qidx, ridx])

    @jax.jit
    def walk(trace, qidx, ridx, ei, ej):
        tf = trace.reshape(B, Qp * Rp)
        barange = jnp.arange(B)

        def step(carry, _):
            i, j, state = carry
            ii = jnp.clip(i, 0, Qp - 1)
            jj = jnp.clip(j, 0, Rp - 1)
            t = tf[barange, ii * Rp + jj].astype(jnp.int32)
            qc = qidx[barange, ii]
            rc = ridx[barange, jj]
            # fake state machine with similar op mix
            h = t & 7
            diag = (h & 4) != 0
            ins = (h & 1) != 0
            op = jnp.where(diag, jnp.where(qc == rc, 1, 2),
                           jnp.where(ins, 3, 4)).astype(jnp.int8)
            live = (i >= 0) & (j >= 0) & (state < 3)
            op = jnp.where(live, op, 0)
            i = jnp.where(live & (diag | ins), i - 1, i)
            j = jnp.where(live & (diag | ~ins), j - 1, j)
            state = jnp.where(live, state, 3)
            return (i, j, state), op

        (_, _, _), ops = jax.lax.scan(
            step, (ei, ej, jnp.zeros(B, jnp.int32)), None, length=L)
        return ops.T  # (B, L)

    t0 = time.perf_counter()
    out = walk(trace, qidx, ridx, ei, ej)
    jax.block_until_ready(out)
    print(f"compile+first: {time.perf_counter()-t0:.1f} s",
          file=sys.stderr, flush=True)
    for rep in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(walk(trace, qidx, ridx, ei, ej))
        print(f"walk rep{rep}: {1e3*(time.perf_counter()-t0):.1f} ms "
              f"({B} pairs, {L} steps)", file=sys.stderr, flush=True)
    # fetch cost of the compact ops
    o = walk(trace, qidx, ridx, ei, ej)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    np.asarray(o)
    print(f"ops d2h ({B}x{L} u8): {1e3*(time.perf_counter()-t0):.1f} ms",
          file=sys.stderr, flush=True)
    # reference point: the current path's plane transfer
    t0 = time.perf_counter()
    np.asarray(trace)
    print(f"plane d2h (13MB): {1e3*(time.perf_counter()-t0):.1f} ms",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
