"""Is the 200ms kernel_block the h2d arg upload or the device kernel?

Times the SAME jitted engine function with (a) host numpy args and
(b) pre-uploaded device args, at B=8192 and B=16384.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from parasail_rs_tpu.engine import Aligner  # noqa: E402
from parasail_rs_tpu.matrices import Matrix  # noqa: E402


def main():
    import jax

    rng = np.random.default_rng(1)
    aa = list(b"ARNDCQEGHILKMFPSTWYV")

    def seqs(n, lo, hi):
        return [rng.choice(aa, size=rng.integers(lo, hi))
                .astype("uint8").tobytes() for _ in range(n)]

    blosum = Matrix.from_name("blosum62")
    sw = (Aligner.new().matrix(blosum).gap_open(11).gap_extend(1)
          .local().build())

    for B in (8192, 16384):
        q, r = seqs(B, 140, 160), seqs(B, 140, 160)
        batch, _, _ = sw._pack(q, r)
        pend = sw._execute(batch, fetch=False)
        jax.block_until_ready(pend._packed[1])  # compile warm

        # (a) numpy args (fresh pack each rep)
        for rep in range(3):
            batch, _, _ = sw._pack(q, r)
            t0 = time.perf_counter()
            pend = sw._execute(batch, fetch=False)
            jax.block_until_ready(pend._packed[1])
            print(f"B={B} numpy-args rep{rep}: "
                  f"{1e3*(time.perf_counter()-t0):.1f} ms",
                  file=sys.stderr, flush=True)

        # (b) device-resident args: device_put the batch tensors first
        batch, _, _ = sw._pack(q, r)
        batch.qbytes = jax.device_put(batch.qbytes)
        batch.rbytes = jax.device_put(batch.rbytes)
        dql = jax.device_put(np.asarray(batch.qlen))
        drl = jax.device_put(np.asarray(batch.rlen))
        jax.block_until_ready([batch.qbytes, batch.rbytes, dql, drl])
        batch.qlen, batch.rlen = np.asarray(batch.qlen), np.asarray(batch.rlen)
        for rep in range(3):
            t0 = time.perf_counter()
            pend = sw._execute(batch, fetch=False)
            jax.block_until_ready(pend._packed[1])
            print(f"B={B} device-args rep{rep}: "
                  f"{1e3*(time.perf_counter()-t0):.1f} ms",
                  file=sys.stderr, flush=True)

        # (c) upload alone
        batch2, _, _ = sw._pack(q, r)
        for rep in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready([jax.device_put(batch2.qbytes),
                                   jax.device_put(batch2.rbytes)])
            print(f"B={B} upload-only rep{rep}: "
                  f"{1e3*(time.perf_counter()-t0):.1f} ms "
                  f"({2*B*160/1e6:.1f} MB)", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
