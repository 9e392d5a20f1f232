"""Decompose cfg4 (align_cigars) and cfg5 (align_many mixed) on the TPU.

cfg4's latest stage capture says fetch=61.45ms of a 62.6ms wall for 512
sg pairs.  "fetch" there is np.asarray(fused) — it blocks on the WHOLE
pipeline (trace kernel + device walk + fuse jit + d2h).  This probe
separates device compute (block_until_ready on the fused device array)
from the d2h transfer (np.asarray after the block), and times the host
run-length encode loop separately.

cfg5: counts bins/launches and stages align_many per phase.

Run: timeout 420 python tools/probe_cfg45.py
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
    return min(ts) * 1e3, float(np.median(ts)) * 1e3


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/pt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from parasail_rs_tpu.engine import Aligner
    from parasail_rs_tpu.engine import dispatch
    from parasail_rs_tpu.matrices import Matrix
    from parasail_rs_tpu.utils import stages

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(1)
    aa = list(b"ARNDCQEGHILKMFPSTWYV")
    dna = list(b"ACGT")

    def seqs(alpha, n, lo, hi):
        return [rng.choice(alpha, size=rng.integers(lo, hi))
                .astype("uint8").tobytes() for _ in range(n)]

    blosum = Matrix.from_name("blosum62")
    tr = (Aligner.new().matrix(blosum).gap_open(11).gap_extend(1)
          .semi_global().build())
    n4 = 512
    q4 = seqs(aa, n4, 140, 160)
    r4 = seqs(aa, n4, 140, 160)

    # -- cfg4 full path -------------------------------------------------
    tr.align_cigars(q4, r4)  # warm/compile
    best, med = t(lambda: tr.align_cigars(q4, r4))
    print(f"cfg4 align_cigars 512: best={best:.1f}ms med={med:.1f}ms "
          f"({n4/best*1e3:.0f}/s)", flush=True)

    # -- decompose: pack / device-compute / d2h / host rle ---------------
    batch, qlens, rlens = tr._pack(q4, r4)
    pb, _ = t(lambda: tr._pack(q4, r4))
    print(f"cfg4 pack: {pb:.2f}ms", flush=True)

    from parasail_rs_tpu.ops.trace_walk import device_walk, ops_to_runs
    from parasail_rs_tpu.engine.aligner import _cigar_fuse

    def enqueue():
        pend = dispatch.execute(
            batch, gap_open=tr.gap_open, gap_extend=tr.gap_extend,
            mode=tr.key.mode, free=tr.key.free, outputs="trace",
            width=tr.key.width, fetch=False)
        names, packed, big, B = pend._packed
        trace_dev = big["trace_table"]
        eq = packed[names.index("end_query")]
        er = packed[names.index("end_ref")]
        qi, ri = batch.qbytes, batch.rbytes
        ops_dev, bq, br = device_walk(trace_dev, qi, ri, eq, er,
                                      tr.key.mode, tr.key.free)
        L = ops_dev.shape[1]
        Lp = (L + 7) // 8 * 8
        fused = _cigar_fuse()(ops_dev, packed, bq, br, Lp - L)
        return fused

    fused = enqueue()
    jax.block_until_ready(fused)
    enq, _ = t(lambda: enqueue())
    dev, _ = t(lambda: jax.block_until_ready(enqueue()))
    print(f"cfg4 enqueue-only: {enq:.2f}ms; device-complete: {dev:.1f}ms",
          flush=True)

    def d2h():
        f = enqueue()
        jax.block_until_ready(f)
        t0 = time.perf_counter()
        np.asarray(f)
        return (time.perf_counter() - t0) * 1e3

    xs = [d2h() for _ in range(3)]
    print(f"cfg4 d2h after block: {min(xs):.1f}ms (fused shape "
          f"{fused.shape}, {fused.size*4/1024:.0f} KB)", flush=True)

    from parasail_rs_tpu.engine.aligner import _unpack_nibbles
    from parasail_rs_tpu.ops.trace_walk import ops_to_runs_batch

    L = batch.qp + batch.rp
    host = np.asarray(fused)
    nn = host.shape[0] - 2 - ((L + 7) // 8)
    ops_host = _unpack_nibbles(host[nn + 2:], n4, L)
    rle, _ = t(lambda: ops_to_runs_batch(ops_host))
    print(f"cfg4 host batch-rle x512: {rle:.1f}ms", flush=True)

    # scalar result-build side
    out, ops_h, _, _ = tr._device_trace_walk(batch)
    alb, _ = t(lambda: tr._alignments_from(out, qlens, rlens))
    print(f"cfg4 alignments_from: {alb:.1f}ms", flush=True)

    # -- cfg4 amortization: 2048 pairs -----------------------------------
    n4b = 2048
    q4b = seqs(aa, n4b, 140, 160)
    r4b = seqs(aa, n4b, 140, 160)
    tr.align_cigars(q4b, r4b)
    best, med = t(lambda: tr.align_cigars(q4b, r4b))
    print(f"cfg4b align_cigars 2048: best={best:.1f}ms med={med:.1f}ms "
          f"({n4b/best*1e3:.0f}/s)", flush=True)

    # -- cfg5 ------------------------------------------------------------
    mixed_q = seqs(dna, 256, 100, 2000)
    mixed_r = seqs(dna, 256, 100, 2000)
    mx = Aligner.new().gap_open(5).gap_extend(2).local().build()
    mx.align_many(mixed_q, mixed_r)  # warm

    from parasail_rs_tpu.batch import merge_bins, plan_bins

    qlens = [len(q) for q in mixed_q]
    rlens = [len(r) for r in mixed_r]
    bins = merge_bins(plan_bins(qlens, rlens, max_cells=1 << 33,
                                lane_quantum=128),
                      max_launches=8, max_cells=1 << 33)
    cells = sum(a * b for a, b in zip(qlens, rlens))
    padded = sum(len(b.indices) * b.qp * b.rp for b in bins)
    print(f"cfg5 bins={len(bins)} shapes="
          f"{[(len(b.indices), b.qp, b.rp) for b in bins]} "
          f"cells={cells/1e6:.0f}M padded={padded/1e6:.0f}M", flush=True)

    with stages.measuring():
        t0 = time.perf_counter()
        mx.align_many(mixed_q, mixed_r)
        wall = (time.perf_counter() - t0) * 1e3
        snap = stages.snapshot()
    print(f"cfg5 wall={wall:.1f}ms stages="
          f"{ {k: round(v['ms'], 1) for k, v in snap.items()} } "
          f"gcups={cells/wall/1e6:.2f}", flush=True)
    best, med = t(lambda: mx.align_many(mixed_q, mixed_r))
    print(f"cfg5 best={best:.1f}ms med={med:.1f}ms "
          f"gcups={cells/best/1e6:.2f}", flush=True)


if __name__ == "__main__":
    main()
