#!/usr/bin/env python
"""Time the Pallas sequence-parallel route on real hardware.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_seqpar.py \
           [B] [L] [q_chunk] [outputs]

Runs ``seqpar_align_scan`` on a single-chip mesh (the pipelined
superstep scan compiles identically for D=1; halos are no-ops) and
reports GCUPS, next to the one-shot ``scan_score_align`` on the same
problem as the no-superstep upper bound.  The whole superstep pipeline
is ONE dispatch (lax.scan), so wall-clock divided by supersteps is true
device time — no tunnel per-call overhead in the timed region.

Results append as JSON lines to /tmp/pt_seqpar_bench.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import with_timeout  # noqa: E402

OUT_PATH = "/tmp/pt_seqpar_bench.jsonl"




def main(B=128, L=2048, q_chunk=256, outputs="score"):
    import jax

    from parasail_rs_tpu.dist import make_device_mesh
    from parasail_rs_tpu.dist.seqpar_scan import seqpar_align_scan
    from parasail_rs_tpu.ops.scan_kernel import scan_score_align, scan_fits

    mesh = make_device_mesh(1)
    A = 4
    rng = np.random.default_rng(0)
    prof = rng.integers(-3, 3, size=(B, L, A)).astype(np.int32)
    qidx = rng.integers(0, A, size=(B, L)).astype(np.int32)
    ridx = rng.integers(0, A, size=(B, L)).astype(np.int32)
    qlen = np.full(B, L, np.int32)
    rlen = np.full(B, L, np.int32)

    def run():
        return seqpar_align_scan(
            prof, ridx, qlen, rlen, qidx if outputs == "stats" else None,
            open_=5, ext=1, mesh=mesh, mode="sw", free=(True,) * 4,
            q_chunk=q_chunk, outputs=outputs)

    t0 = time.time()
    out = with_timeout(lambda: jax.block_until_ready(run()["score"]), 600)
    print(f"[seqpar {outputs}] compile+first={time.time()-t0:.2f}s",
          flush=True)
    best = None
    for _ in range(5):
        def window():
            t0 = time.time()
            s = run()["score"]
            float(np.asarray(s).sum())
            return time.time() - t0
        try:
            dt = with_timeout(window, 180)
        except Exception as e:  # noqa: BLE001
            print(f"[seqpar {outputs}] window failed: {e}", flush=True)
            continue
        best = dt if best is None else min(best, dt)
        print(f"[seqpar {outputs}] {dt*1e3:.2f} ms", flush=True)

    one_ms = None
    if outputs in ("score", "stats") and scan_fits(L, L, outputs, A=A):
        hb = 1 << (((3 + 5 + 1) * (L + L)) - 1).bit_length()

        def one():
            return scan_score_align(
                prof, ridx, qlen, rlen,
                qidx if outputs == "stats" else None,
                open_=np.int32(5), ext=np.int32(1), mode="sw",
                free=(True,) * 4, width="32", outputs=outputs,
                hmax_bound=hb)
        try:
            t0 = time.time()
            with_timeout(lambda: jax.block_until_ready(one()["score"]), 600)
            print(f"[one-shot] compile+first={time.time()-t0:.2f}s",
                  flush=True)
            for _ in range(3):
                def w1():
                    t0 = time.time()
                    float(np.asarray(one()["score"]).sum())
                    return time.time() - t0
                try:
                    dt = with_timeout(w1, 180)
                except Exception as e:  # noqa: BLE001
                    print(f"[one-shot] window failed: {e}", flush=True)
                    continue
                one_ms = dt if one_ms is None else min(one_ms, dt)
                print(f"[one-shot] {dt*1e3:.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[one-shot] unavailable: {e}", flush=True)

    if best is not None:
        cells = B * L * L
        rec = {"outputs": outputs, "B": B, "L": L, "q_chunk": q_chunk,
               "seqpar_ms": round(best * 1e3, 2),
               "seqpar_gcups": round(cells / best / 1e9, 1),
               "oneshot_ms": None if one_ms is None else
               round(one_ms * 1e3, 2),
               "oneshot_gcups": None if one_ms is None else
               round(cells / one_ms / 1e9, 1),
               "ts": time.time()}
        print(f"BEST seqpar {rec['seqpar_ms']} ms ({rec['seqpar_gcups']} "
              f"GCUPS) vs one-shot {rec['oneshot_ms']} ms", flush=True)
        with open(OUT_PATH, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    args = sys.argv[1:]
    try:
        main(B=int(args[0]) if len(args) > 0 else 128,
             L=int(args[1]) if len(args) > 1 else 2048,
             q_chunk=int(args[2]) if len(args) > 2 else 256,
             outputs=args[3] if len(args) > 3 else "score")
    except Exception:  # noqa: BLE001
        import traceback

        traceback.print_exc()
    finally:
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)
