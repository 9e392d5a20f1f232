#!/usr/bin/env python
"""Microbenchmark for the Pallas scan kernel (chained-dependency timing).

Usage: python tools/bench_kernel.py [score|stats|trace|all] [B] [L]
Times the kernel only — device arrays in, one fetch at the end of each
chained window — on whatever backend jax selects (intended: TPU).
"""

import sys
import time

import numpy as np
import jax

from parasail_rs_tpu.ops.scan_kernel import scan_score_align


def bench(outputs, B=8192, L=150, Qp=160, Rp=160, A=25, iters=(8, 16, 16)):
    rng = np.random.default_rng(0)
    profile = jax.device_put(
        rng.integers(-4, 12, size=(B, Qp, A)).astype(np.int32))
    qidx = jax.device_put(rng.integers(0, A, size=(B, Qp)).astype(np.int32))
    ridx = jax.device_put(rng.integers(0, A, size=(B, Rp)).astype(np.int32))
    qlen = jax.device_put(np.full(B, L, np.int32))
    rlen = jax.device_put(np.full(B, L, np.int32))
    jax.block_until_ready([profile, qidx, ridx])

    def run(ql):
        return scan_score_align(
            profile, ridx, ql, rlen,
            qidx if outputs in ("stats",) else None,
            open_=np.int32(11), ext=np.int32(1),
            mode="sw", free=(True,) * 4, width="sat", outputs=outputs,
            interpret=False)

    t0 = time.time()
    jax.block_until_ready(run(qlen)["score"])
    print(f"[{outputs}] compile+first={time.time()-t0:.2f}s", flush=True)
    best = None
    for n in iters:
        ql = qlen
        t0 = time.time()
        for _ in range(n):
            out = run(ql)
            ql = qlen + (out["score"] & 0)
        float(np.asarray(out["score"]).sum())
        dt = (time.time() - t0) / n
        best = dt if best is None else min(best, dt)
        print(f"[{outputs}] window x{n}: {dt*1e3:.2f} ms/call", flush=True)
    print(f"[{outputs}] BEST {best*1e3:.2f} ms  "
          f"{B/best/1e6:.3f}M aln/s  {B*L*L/best/1e9:.1f} GCUPS", flush=True)
    return best


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 150
    for o in (("score", "stats", "trace") if which == "all" else (which,)):
        bench(o, B=B, L=L)
