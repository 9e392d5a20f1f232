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
import sys
import time

import numpy as np


def main():
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

    print(json.dumps({
        "metric": "150bp SW alignments/sec/chip",
        "value": round(aps),
        "unit": "alignments/sec/chip",
        "vs_baseline": round(aps / 1e6, 3),
    }))


if __name__ == "__main__":
    main()
