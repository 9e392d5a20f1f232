"""A/B the device walk's scan unroll factor + trace kernel scaling.

cfg4 decomposition (probe_cfg4_dev, 2026-08-20): trace kernel ~6.3ms,
walk ~8.4ms (26us/step over 320 steps) for 512 sg 150bp pairs.  The
walk's per-step work is a (B,) gather + flag decode — loop overhead and
gather lowering dominate, so scan-unrolling may help.
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
    from parasail_rs_tpu.ops import trace_walk

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(1)
    aa = list(b"ARNDCQEGHILKMFPSTWYV")
    q4 = [rng.choice(aa, size=rng.integers(140, 160)).astype("uint8")
          .tobytes() for _ in range(512)]
    r4 = [rng.choice(aa, size=rng.integers(140, 160)).astype("uint8")
          .tobytes() for _ in range(512)]
    blosum = Matrix.from_name("blosum62")
    tr = (Aligner.new().matrix(blosum).gap_open(11).gap_extend(1)
          .semi_global().build())
    batch, _, _ = tr._pack(q4, r4)

    def kern(outputs):
        pend = dispatch.execute(
            batch, gap_open=tr.gap_open, gap_extend=tr.gap_extend,
            mode=tr.key.mode, free=tr.key.free, outputs=outputs,
            width=tr.key.width, fetch=False)
        return pend._packed

    # trace vs score kernel at 512 pairs (same batch)
    for outputs in ("score", "trace"):
        jax.block_until_ready(kern(outputs)[1])
        ms = t(lambda: jax.block_until_ready(kern(outputs)[1]))
        print(f"block on {outputs} kernel scalars @512: {ms:.1f}ms",
              flush=True)

    names, packed, big, B = kern("trace")
    trace_dev = big["trace_table"]
    eq = packed[names.index("end_query")]
    er = packed[names.index("end_ref")]
    jax.block_until_ready(trace_dev)
    base = t(lambda: jax.block_until_ready(kern("trace")[1]))

    # walk alone on a READY plane (no kernel in the timed pipeline)
    for unroll in (1, 2, 4, 8):
        trace_walk._WALK_UNROLL = unroll
        trace_walk._WALK_JIT.clear()
        ops, bq, br = trace_walk.device_walk(
            trace_dev, batch.qbytes, batch.rbytes, eq, er,
            tr.key.mode, tr.key.free)
        jax.block_until_ready(ops)
        ms = t(lambda: jax.block_until_ready(trace_walk.device_walk(
            trace_dev, batch.qbytes, batch.rbytes, eq, er,
            tr.key.mode, tr.key.free)[0]))
        print(f"walk unroll={unroll}: {ms:.1f}ms (ops sum "
              f"{int(np.asarray(ops).sum())})", flush=True)


if __name__ == "__main__":
    main()
