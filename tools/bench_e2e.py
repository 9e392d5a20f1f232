#!/usr/bin/env python
"""End-to-end engine breakdown on the current backend (dev tool).

Times the stages of Aligner.align_batch for a 1024-pair protein batch:
pack (host), dispatch enqueue, device fetch, result-object build.  Run
on the TPU to see where the e2e overhead beyond the kernel goes.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from parasail_rs_tpu.engine import Aligner, dispatch
    from parasail_rs_tpu.matrices import Matrix

    rng = np.random.default_rng(1)
    aa = list(b"ARNDCQEGHILKMFPSTWYV")
    n = int(os.environ.get("PT_E2E_N", "1024"))
    qs = [rng.choice(aa, size=rng.integers(140, 160)).astype("uint8")
          .tobytes() for _ in range(n)]
    rs = [rng.choice(aa, size=rng.integers(140, 160)).astype("uint8")
          .tobytes() for _ in range(n)]

    blosum = Matrix.from_name("blosum62")
    al = (Aligner.new().matrix(blosum).gap_open(11).gap_extend(1)
          .local().build())

    # warm (compile)
    t0 = time.time()
    al.align_batch(qs, rs)
    print(f"warm align_batch: {(time.time()-t0)*1e3:.1f} ms "
          f"(backend={jax.default_backend()})")

    for rep in range(4):
        t0 = time.time()
        batch, qlens, rlens = al._pack(qs, rs)
        t_pack = time.time() - t0

        t0 = time.time()
        pend = dispatch.execute(
            batch, gap_open=al.gap_open, gap_extend=al.gap_extend,
            mode=al.key.mode, free=al.key.free, outputs="score",
            width=al.key.width, fetch=False)
        t_enq = time.time() - t0

        t0 = time.time()
        out = pend.fetch()
        t_fetch = time.time() - t0

        t0 = time.time()
        res = al._alignments_from(out, qlens, rlens)
        assert len(res) == n
        t_build = time.time() - t0

        total = t_pack + t_enq + t_fetch + t_build
        print(f"rep{rep}: pack={t_pack*1e3:6.1f}  enq={t_enq*1e3:6.1f}  "
              f"fetch={t_fetch*1e3:6.1f}  build={t_build*1e3:6.1f}  "
              f"total={total*1e3:6.1f} ms  ({n/total:.0f} aln/s)")

    # full path timing for reference
    for rep in range(3):
        t0 = time.time()
        al.align_batch(qs, rs)
        print(f"full align_batch rep{rep}: {(time.time()-t0)*1e3:.1f} ms")


if __name__ == "__main__":
    try:
        main()
    finally:
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)
