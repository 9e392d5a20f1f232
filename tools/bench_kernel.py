#!/usr/bin/env python
"""Microbenchmark for the Pallas scan kernel (chained-dependency timing).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_kernel.py \
           [score|stats|trace|all] [B] [L]

Every device interaction runs under a watchdog thread (the dev tunnel
stalls unpredictably); windows that hang are dropped and the best
completed window wins.  Results append as JSON lines to
``/tmp/pt_kernel_bench.jsonl`` so a driver loop can retry until numbers
land.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import with_timeout  # noqa: E402

OUT_PATH = "/tmp/pt_kernel_bench.jsonl"




def bench(outputs, B=8192, L=150, Qp=160, Rp=160, A=25):
    import jax

    from parasail_rs_tpu.ops.scan_kernel import scan_score_align

    rng = np.random.default_rng(0)
    profile = jax.device_put(
        rng.integers(-4, 12, size=(B, Qp, A)).astype(np.int32))
    qidx = jax.device_put(rng.integers(0, A, size=(B, Qp)).astype(np.int32))
    ridx = jax.device_put(rng.integers(0, A, size=(B, Rp)).astype(np.int32))
    qlen = jax.device_put(np.full(B, L, np.int32))
    rlen = jax.device_put(np.full(B, L, np.int32))
    with_timeout(lambda: jax.block_until_ready([profile, qidx, ridx]), 120)

    # (smax + open + ext) * (Qp + Rp), rounded up to a power of two —
    # unlocks the packed candidate tracker (engine passes the same bound)
    hb = 1 << (((12 + 11 + 1) * (Qp + Rp)) - 1).bit_length()

    def run(ql):
        return scan_score_align(
            profile, ridx, ql, rlen,
            qidx if outputs == "stats" else None,
            open_=np.int32(11), ext=np.int32(1),
            mode="sw", free=(True,) * 4, width="sat", outputs=outputs,
            interpret=False, hmax_bound=hb)

    t0 = time.time()
    with_timeout(lambda: jax.block_until_ready(run(qlen)["score"]), 150)
    print(f"[{outputs}] compile+first={time.time()-t0:.2f}s", flush=True)
    best = None
    completed = 0
    for iters in (1, 2, 4, 8, 16, 16, 32):
        def window(iters=iters):
            ql = qlen
            t0 = time.time()
            for _ in range(iters):
                out = run(ql)
                ql = qlen + (out["score"] & 0)
            float(np.asarray(out["score"]).sum())
            return (time.time() - t0) / iters
        try:
            dt = with_timeout(window, 60)
        except Exception as e:  # noqa: BLE001
            # the first sustained burst after process start often wedges
            # for minutes then recovers — later windows usually land
            print(f"[{outputs}] window x{iters} failed: {e}", flush=True)
            continue
        completed += 1
        best = dt if best is None else min(best, dt)
        print(f"[{outputs}] x{iters}: {dt*1e3:.2f} ms/call", flush=True)
        time.sleep(0.05)
    # Ground truth: the roll-chain DIFFERENTIAL.  A chain of identical
    # calls is CSE-collapsed to ONE kernel by XLA (even through a
    # `score & 0` data dependency; caught 2026-08-20), so each step
    # rolls the reference plane (same work, distinct buffers) and the
    # per-kernel time is (wall_2N - wall_N)/N with medians-of-3 — the
    # fixed RTT/dispatch term cancels exactly.
    import functools

    import jax
    import jax.numpy as jnp

    NCH = 8

    # device arrays enter as jit ARGUMENTS — closure capture would embed
    # the (B,Qp,A) profile as a ~131 MB constant (unstable cache key,
    # 30-180 s compiles; same pathology bench.py fixed 2026-08-20)
    @functools.partial(jax.jit, static_argnums=(5,))
    def chained(prof, rix, ql, rl, qix, n):
        acc = None
        for _ in range(n):
            out = scan_score_align(
                prof, rix, ql, rl,
                qix if outputs == "stats" else None,
                open_=np.int32(11), ext=np.int32(1),
                mode="sw", free=(True,) * 4, width="sat", outputs=outputs,
                interpret=False, hmax_bound=hb)
            s = out["score"]
            acc = s if acc is None else acc + s
            rix = jnp.roll(rix, 1, axis=0) + (s[:, None] & 0)
        return acc

    fused_ms = None
    try:
        t0 = time.time()
        with_timeout(lambda: jax.block_until_ready(
            chained(profile, ridx, qlen, rlen, qidx, NCH)), 300)
        with_timeout(lambda: jax.block_until_ready(
            chained(profile, ridx, qlen, rlen, qidx, 2 * NCH)), 300)
        print(f"[{outputs}] roll-chain compile+first={time.time()-t0:.1f}s",
              flush=True)
        walls = {NCH: [], 2 * NCH: []}
        for n in (NCH, 2 * NCH) * 3:
            def win(n=n):
                t0 = time.time()
                float(np.asarray(chained(
                    profile, ridx, qlen, rlen, qidx, n)).sum())
                return time.time() - t0
            try:
                walls[n].append(with_timeout(win, 120))
            except Exception as e:  # noqa: BLE001
                print(f"[{outputs}] chain window x{n} failed: {e}",
                      flush=True)
        if walls[NCH] and walls[2 * NCH]:
            m1 = float(np.median(walls[NCH]))
            m2 = float(np.median(walls[2 * NCH]))
            k = (m2 - m1) / NCH
            naive = m2 / (2 * NCH)
            if not (0.25 * naive <= k <= 1.05 * naive):
                print(f"[{outputs}] differential {k*1e3:.2f} out of "
                      f"bounds; using naive {naive*1e3:.2f}", flush=True)
                k = naive
            fused_ms = k
            print(f"[{outputs}] differential: {k*1e3:.2f} ms/kernel "
                  f"(walls x{NCH} {m1*1e3:.1f} / x{2*NCH} {m2*1e3:.1f})",
                  flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[{outputs}] roll chain unavailable: {e}", flush=True)

    if fused_ms is not None:
        best = fused_ms  # the differential IS the per-kernel time
    if best is not None:
        rec = {"outputs": outputs, "B": B, "L": L,
               "best_ms": round(best * 1e3, 3),
               "aln_per_sec": round(B / best),
               "gcups": round(B * L * L / best / 1e9, 1),
               "fused_ms": None if fused_ms is None else
               round(fused_ms * 1e3, 3),
               "windows": completed, "ts": time.time()}
        print(f"[{outputs}] BEST {rec['best_ms']} ms  "
              f"{rec['aln_per_sec']/1e6:.3f}M aln/s  "
              f"{rec['gcups']} GCUPS", flush=True)
        with open(OUT_PATH, "a") as f:
            f.write(json.dumps(rec) + "\n")
    return best


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 150
    try:
        for o in (("score", "stats", "trace") if which == "all" else (which,)):
            if bench(o, B=B, L=L) is None:
                break
    except Exception:  # noqa: BLE001
        import traceback

        traceback.print_exc()
    finally:
        sys.stdout.flush()
        sys.stderr.flush()
        # abandoned watchdog threads stuck in a wedged runtime would
        # abort a normal interpreter exit
        os._exit(0)
