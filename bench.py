"""Headline benchmark: 150bp Smith-Waterman alignments/sec on one chip.

Matches BASELINE.json config 2/3 (local affine-gap SW, protein-sized
alphabet, large pair batch) and the north-star metric "150bp SW
alignments/sec/chip".  The timed region is the device-resident production
hot loop — the Pallas prefix-scan kernel on TPU (XLA wavefront path on
other backends) over an 8192-pair batch; inputs live on device as they
would in a streaming pipeline (host staging overlaps compute there).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "alignments/sec/chip", "vs_baseline": N}
vs_baseline is value / 1e6 (the BASELINE.json target of 10^6 aln/s/chip).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    """Measure on the default backend; if the TPU path hangs or errors
    (the dev tunnel occasionally wedges with FailedPrecondition), re-exec
    on the CPU backend so ONE honest JSON line is always printed."""
    if os.environ.get("PT_BENCH_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
        _run()
        return
    import multiprocessing as mp

    proc = mp.Process(target=_run)
    proc.start()
    proc.join(timeout=480)
    if proc.exitcode == 0:
        return
    if proc.is_alive():
        proc.terminate()
        proc.join()
    print("[bench] TPU run hung or failed; falling back to CPU backend",
          file=sys.stderr)
    os.environ["PT_BENCH_CPU"] = "1"
    os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)])


def _run():
    import jax

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    B, L, A = (8192, 150, 25) if on_tpu else (256, 150, 25)
    Qp = Rp = 160
    rng = np.random.default_rng(0)
    profile = jax.device_put(
        rng.integers(-4, 12, size=(B, Qp, A)).astype(np.int32))
    qidx = jax.device_put(rng.integers(0, A, size=(B, Qp)).astype(np.int32))
    ridx = jax.device_put(rng.integers(0, A, size=(B, Rp)).astype(np.int32))
    qlen = jax.device_put(np.full(B, L, np.int32))
    rlen = jax.device_put(np.full(B, L, np.int32))
    jax.block_until_ready([profile, ridx])

    if on_tpu:
        from parasail_rs_tpu.ops.scan_kernel import scan_score_align

        def run(ql):
            return scan_score_align(
                profile, ridx, ql, rlen,
                open_=np.int32(11), ext=np.int32(1),
                mode="sw", free=(True,) * 4, width="sat", interpret=False)
    else:
        from parasail_rs_tpu.ops.wavefront import wavefront_align

        def run(ql):
            return wavefront_align(
                profile, qidx, ridx, ql, rlen,
                open_=np.int32(11), ext=np.int32(1),
                mode="sw", free=(True,) * 4, outputs="score", width="sat")

    t0 = time.time()
    jax.block_until_ready(run(qlen))
    print(f"[bench] backend={backend} B={B} compile+first={time.time()-t0:.2f}s",
          file=sys.stderr)

    # Chain ITERS runs with a data dependency (next qlen consumes the
    # previous scores) and fetch once: per-kernel device time without the
    # per-call host round-trip, and no run can be elided or cached.
    ITERS = 32 if on_tpu else 4
    trials = []
    for _ in range(3):
        ql = qlen
        t0 = time.time()
        for _ in range(ITERS):
            out = run(ql)
            ql = qlen + (out["score"] & 0)
        float(np.asarray(out["score"]).sum())
        trials.append((time.time() - t0) / ITERS)
    dt = float(np.median(trials))
    aps = B / dt
    gcups = B * L * L / dt / 1e9
    print(f"[bench] median={dt*1e3:.2f}ms  {aps/1e6:.3f}M aln/s  "
          f"{gcups:.1f} GCUPS", file=sys.stderr)

    try:
        _secondary_configs(on_tpu)
    except Exception as e:  # secondary sweeps never break the headline
        print(f"[bench] secondary sweep failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    print(json.dumps({
        "metric": "150bp SW alignments/sec/chip",
        "value": round(aps),
        "unit": "alignments/sec/chip",
        "vs_baseline": round(aps / 1e6, 3),
        "backend": backend,
    }))


def _timeit(fn, reps=3):
    times = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return float(np.median(times))


def _secondary_configs(on_tpu):
    """BASELINE.json configs 1-5, engine end-to-end (encode -> dispatch ->
    fetch).  Reported on stderr; the headline JSON stays the kernel metric."""
    from parasail_rs_tpu.engine import Aligner, Profile
    from parasail_rs_tpu.matrices import Matrix

    rng = np.random.default_rng(1)
    dna = list(b"ACGT")
    aa = list(b"ARNDCQEGHILKMFPSTWYV")

    def seqs(alpha, n, lo, hi):
        return [rng.choice(alpha, size=rng.integers(lo, hi))
                .astype("uint8").tobytes() for _ in range(n)]

    scale = 1 if on_tpu else 8  # smaller sweeps off-TPU

    # 1: NW global score-only, DNA, single 150bp pair (latency)
    nw = Aligner.new().gap_open(5).gap_extend(2).build()
    q150, r150 = seqs(dna, 2, 150, 151)
    nw.align(q150, r150)  # warm
    dt = _timeit(lambda: nw.align(q150, r150))
    print(f"[bench] cfg1 NW 150bp single-pair latency: {dt*1e3:.2f} ms",
          file=sys.stderr)

    # 2: SW local blosum62, batch of 1k pairs
    blosum = Matrix.from_name("blosum62")
    sw = Aligner.new().matrix(blosum).gap_open(11).gap_extend(1).local().build()
    qs = seqs(aa, 1024 // scale, 140, 160)
    rs = seqs(aa, 1024 // scale, 140, 160)
    sw.align_batch(qs, rs)  # warm
    dt = _timeit(lambda: sw.align_batch(qs, rs))
    print(f"[bench] cfg2 SW blosum62 {len(qs)}-pair batch: {dt*1e3:.1f} ms "
          f"({len(qs)/dt:.0f} aln/s e2e)", file=sys.stderr)

    # 3: profile reuse - one query vs many references
    nrefs = 16384 // scale
    prof = Profile.new(qs[0], False, blosum)
    pa = (Aligner.new().profile(prof).gap_open(11).gap_extend(1)
          .local().scan().build())
    refs = seqs(aa, nrefs, 140, 160)
    pa.align_batch(None, refs[:64])  # warm
    dt = _timeit(lambda: pa.align_batch(None, refs), reps=1)
    print(f"[bench] cfg3 profile vs {nrefs} refs: {dt*1e3:.0f} ms "
          f"({nrefs/dt:.0f} aln/s e2e)", file=sys.stderr)

    # 4: semi-global + trace -> CIGAR emission (device flags + host walk)
    tr = (Aligner.new().matrix(blosum).gap_open(11).gap_extend(1)
          .semi_global().use_trace().build())
    n4 = 512 // scale
    q4, r4 = qs[:n4], rs[:n4]
    res = tr.align_batch(q4, r4)

    def cig():
        out = tr.align_batch(q4, r4)
        return [a.get_cigar(q, r) for a, q, r in zip(out, q4, r4)]

    cig()  # warm
    dt = _timeit(lambda: cig())
    print(f"[bench] cfg4 sg trace+CIGAR {n4} pairs: {dt*1e3:.1f} ms "
          f"({n4/dt:.0f} CIGARs/s e2e)", file=sys.stderr)

    # 5: length-binned mixed batch (100bp - 10kbp here 100-2k for time)
    mixed_q = seqs(dna, 256 // scale, 100, 2000)
    mixed_r = seqs(dna, 256 // scale, 100, 2000)
    mx = Aligner.new().gap_open(5).gap_extend(2).local().build()
    mx.align_many(mixed_q, mixed_r)  # warm
    dt = _timeit(lambda: mx.align_many(mixed_q, mixed_r), reps=1)
    cells = sum(len(a) * len(b) for a, b in zip(mixed_q, mixed_r))
    print(f"[bench] cfg5 mixed 100bp-2kbp x{len(mixed_q)}: {dt*1e3:.0f} ms "
          f"({cells/dt/1e9:.2f} GCUPS e2e)", file=sys.stderr)


if __name__ == "__main__":
    main()
