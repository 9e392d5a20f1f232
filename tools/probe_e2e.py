"""Stage-decomposed cfg7 (streaming e2e) measurement on the live TPU.

Runs the StreamingAligner path at several flush sizes with the stage
collector on, printing total wall time + per-stage totals, so the
kernel→e2e residual (VERDICT r3 item 1) is attributed by measurement.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from parasail_rs_tpu.engine import Aligner
from parasail_rs_tpu.engine.stream import StreamingAligner
from parasail_rs_tpu.matrices import Matrix
from parasail_rs_tpu.utils import stages


def main():
    rng = np.random.default_rng(1)
    aa = list(b"ARNDCQEGHILKMFPSTWYV")

    def seqs(n, lo, hi):
        return [rng.choice(aa, size=rng.integers(lo, hi))
                .astype("uint8").tobytes() for _ in range(n)]

    blosum = Matrix.from_name("blosum62")
    sw = (Aligner.new().matrix(blosum).gap_open(11).gap_extend(1)
          .local().build())

    n7 = 16384
    q7 = seqs(n7, 140, 160)
    r7 = seqs(n7, 140, 160)

    for flush in (4096, 8192, 16384):
        def stream_run():
            with StreamingAligner(sw, flush_size=flush) as st:
                handles = st.submit_many(q7, r7)
                st.flush()
                return sum(h.result().get_score() for h in handles)

        stream_run()  # warm/compile
        for rep in range(3):
            with stages.measuring():
                t0 = time.perf_counter()
                stream_run()
                dt = time.perf_counter() - t0
                snap = stages.snapshot()
            staged = sum(v["ms"] for v in snap.values())
            print(f"flush={flush} rep={rep}: {dt*1e3:.0f} ms "
                  f"({n7/dt/1e3:.0f}k aln/s) staged={staged:.0f}ms "
                  f"{ {k: v['ms'] for k, v in snap.items()} }",
                  file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
