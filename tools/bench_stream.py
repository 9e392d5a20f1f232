#!/usr/bin/env python
"""Segment-size sensitivity of the streamed scan route (long pairs).

Usage: python tools/bench_stream.py [score|stats|both] [B] [L]

Sweeps PT_STREAM_SEG for the streamed-segment kernel on a 16kbp x 16kbp
batch and reports e2e GCUPS per segment size.  This is the measurement
behind the ROADMAP item "streamed stats segment size": before spending
kernel complexity on bigger segments, find out how much they buy.

Appends JSON lines to /tmp/pt_stream_bench.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import with_timeout  # noqa: E402

OUT_PATH = "/tmp/pt_stream_bench.jsonl"


def bench(outputs, segs, B=128, L=16384):
    from parasail_rs_tpu.prelude import Aligner

    rng = np.random.default_rng(0)
    dna = "ACGT"
    qs = ["".join(rng.choice(list(dna), size=L)) for _ in range(B)]
    rs = ["".join(rng.choice(list(dna), size=L)) for _ in range(B)]
    b = Aligner.new().gap_open(5).gap_extend(1).local()
    if outputs == "stats":
        b = b.use_stats()
    al = b.build()
    rows = []
    for seg in segs:
        os.environ["PT_STREAM_SEG"] = str(seg)
        try:
            t0 = time.time()
            with_timeout(lambda: al.align_batch(qs, rs), 420)
            warm = time.time() - t0
            t0 = time.time()
            with_timeout(lambda: al.align_batch(qs, rs), 300)
            dt = time.time() - t0
        except Exception as e:  # noqa: BLE001
            print(f"[{outputs}] seg={seg}: FAILED {e}", flush=True)
            continue
        gcups = B * L * L / dt / 1e9
        row = {"outputs": outputs, "seg": seg, "B": B, "L": L,
               "warm_s": round(warm, 2), "run_s": round(dt, 3),
               "gcups": round(gcups, 2)}
        rows.append(row)
        print(f"[{outputs}] seg={seg}: warm {warm:.1f}s run {dt:.2f}s "
              f"= {gcups:.1f} GCUPS", flush=True)
        with open(OUT_PATH, "a") as f:
            f.write(json.dumps(row) + "\n")
    os.environ.pop("PT_STREAM_SEG", None)
    return rows


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 16384
    if which in ("stats", "both"):
        bench("stats", (2048, 2560, 3072), B=B, L=L)
    if which in ("score", "both"):
        bench("score", (2048, 4096, 8192), B=B, L=L)
    os._exit(0)


if __name__ == "__main__":
    main()
