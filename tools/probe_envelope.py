#!/usr/bin/env python
"""Hardware validation of the VMEM plan envelope (dev tool).

The plan model (ops/scan_kernel._plan) is checked against Mosaic's real
scoped-VMEM limits only when a shape actually compiles on the TPU —
the CPU test suite runs interpret mode, which ignores VMEM entirely.
This sweep compiles + runs ONE 128-pair batch for every (shape, output
class) the planner accepts near its edge, under a watchdog, and
reports ok / compile-OOM / wrong so plan miscalibrations surface as a
table instead of a production fallback (or a crash).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_envelope.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import with_timeout  # noqa: E402




CASES = [
    # (Qp, Rp, outputs) — the planner's edge shapes per class
    (2048, 2048, "score"),
    (8192, 8192, "score"),
    (2048, 2048, "stats"),
    (1024, 1024, "stats_table"),
    (2048, 2048, "stats_rowcol"),
    (4096, 4096, "trace"),
    (2048, 2048, "rowcol"),
    (1024, 1024, "table"),
]


def main():
    import jax

    from parasail_rs_tpu.golden import model as golden
    from parasail_rs_tpu.matrices import Matrix
    from parasail_rs_tpu.engine.dispatch import build_batch, _execute_pallas
    from parasail_rs_tpu.engine.profile import profile_rows
    from parasail_rs_tpu.ops.scan_kernel import scan_fits

    assert jax.default_backend() == "tpu", "run on the real chip"
    m = Matrix.create(b"ACGT", 2, -3)
    rng = np.random.default_rng(12)

    for Qp, Rp, outputs in CASES:
        if not scan_fits(Qp, Rp, outputs, A=m.size):
            print(f"{Qp:>6} x {Rp:<6} {outputs:<13} planner declines "
                  "(streams/wavefronts instead)", flush=True)
            continue
        B = 128
        ql = Qp - 3
        rl = Rp - 5
        q = rng.choice(list(b"ACGT"), size=ql).astype("uint8").tobytes()
        r = rng.choice(list(b"ACGT"), size=rl).astype("uint8").tobytes()
        qi, ri = m.encode(q), m.encode(r)
        prows = [profile_rows(m, qi)] * B
        batch = build_batch(prows, [qi] * B, [ri] * B, Qp=Qp, Rp=Rp)
        t0 = time.time()
        try:
            out = with_timeout(lambda: _execute_pallas(
                batch, gap_open=5, gap_extend=1, mode="sw",
                free=(True,) * 4, width="32", outputs=outputs), 420)
            g = golden.align_seqs(q, r, m, 5, 1, "sw")
            s0 = int(np.asarray(out["score"])[0])
            verdict = "ok" if s0 == g.score else f"WRONG ({s0} != {g.score})"
            print(f"{Qp:>6} x {Rp:<6} {outputs:<13} {verdict}  "
                  f"({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:110]
            print(f"{Qp:>6} x {Rp:<6} {outputs:<13} FAIL "
                  f"{type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    try:
        main()
    finally:
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)
