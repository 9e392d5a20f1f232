"""Decompose the amortized align_cigars batch (2048/4096 pairs):
is the device walk superlinear in B (bigger flag-plane gathers), or is
the 196 ms at 2048 pairs all transfer + RTT weather?
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def t(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/pt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from parasail_rs_tpu.engine import Aligner, dispatch
    from parasail_rs_tpu.matrices import Matrix
    from parasail_rs_tpu.ops.trace_walk import device_walk

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(1)
    aa = list(b"ARNDCQEGHILKMFPSTWYV")
    blosum = Matrix.from_name("blosum62")
    tr = (Aligner.new().matrix(blosum).gap_open(11).gap_extend(1)
          .semi_global().build())

    # NO d2h yet: clean channel — measure pure device costs first
    for n in (512, 2048, 4096):
        qs = [rng.choice(aa, size=rng.integers(140, 160)).astype("uint8")
              .tobytes() for _ in range(n)]
        rs = [rng.choice(aa, size=rng.integers(140, 160)).astype("uint8")
              .tobytes() for _ in range(n)]
        batch, _, _ = tr._pack(qs, rs)

        def kern():
            return dispatch.execute(
                batch, gap_open=tr.gap_open, gap_extend=tr.gap_extend,
                mode=tr.key.mode, free=tr.key.free, outputs="trace",
                width=tr.key.width, fetch=False)._packed

        names, packed, big, B = kern()
        jax.block_until_ready(packed)
        k = t(lambda: jax.block_until_ready(kern()[1]))
        trace_dev = big["trace_table"]
        eq = packed[names.index("end_query")]
        er = packed[names.index("end_ref")]

        def wk():
            return device_walk(trace_dev, batch.qbytes, batch.rbytes,
                               eq, er, tr.key.mode, tr.key.free)[0]

        jax.block_until_ready(wk())
        w = t(lambda: jax.block_until_ready(wk()))
        print(f"n={n}: trace-kernel block {k:.2f}ms; walk-on-ready-plane "
              f"block {w:.2f}ms", flush=True)

    # now the degraded-mode e2e at each size
    for n in (512, 2048, 4096):
        qs = [rng.choice(aa, size=rng.integers(140, 160)).astype("uint8")
              .tobytes() for _ in range(n)]
        rs = [rng.choice(aa, size=rng.integers(140, 160)).astype("uint8")
              .tobytes() for _ in range(n)]
        tr.align_cigars(qs, rs)
        ms = t(lambda: tr.align_cigars(qs, rs))
        print(f"n={n}: align_cigars {ms:.1f}ms ({n/ms*1e3:.0f}/s)",
              flush=True)
    print("route counts:", dict(tr.route_counter), flush=True)


if __name__ == "__main__":
    main()
