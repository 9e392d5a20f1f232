"""Split the cfg7 fetch cost: kernel completion vs pure d2h transfer.

Dispatches ONE 16384-pair launch through the engine's exact path, then
times block_until_ready (upload + device compute) separately from
np.asarray (device->host of the packed scalars).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from parasail_rs_tpu.engine import Aligner, dispatch  # noqa: E402
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
    n = 16384
    q7, r7 = seqs(n, 140, 160), seqs(n, 140, 160)

    # warm
    batch, qlens, rlens = sw._pack(q7, r7)
    pend = sw._execute(batch, fetch=False)
    pend.fetch()

    for rep in range(3):
        t0 = time.perf_counter()
        batch, qlens, rlens = sw._pack(q7, r7)
        t1 = time.perf_counter()
        pend = sw._execute(batch, fetch=False)
        t2 = time.perf_counter()
        jax.block_until_ready(pend._packed[1])
        t3 = time.perf_counter()
        host = np.asarray(pend._packed[1])
        t4 = time.perf_counter()
        print(f"rep{rep}: pack={1e3*(t1-t0):.1f} disp={1e3*(t2-t1):.1f} "
              f"kernel_block={1e3*(t3-t2):.1f} d2h={1e3*(t4-t3):.1f} "
              f"shape={host.shape}", file=sys.stderr, flush=True)

    # same but with start_transfer right after dispatch
    for rep in range(3):
        batch, qlens, rlens = sw._pack(q7, r7)
        t2 = time.perf_counter()
        pend = sw._execute(batch, fetch=False).start_transfer()
        t2b = time.perf_counter()
        jax.block_until_ready(pend._packed[1])
        t3 = time.perf_counter()
        host = np.asarray(pend._packed[1])
        t4 = time.perf_counter()
        print(f"rep{rep}+async: disp+start={1e3*(t2b-t2):.1f} "
              f"kernel_block={1e3*(t3-t2b):.1f} d2h={1e3*(t4-t3):.1f}",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
