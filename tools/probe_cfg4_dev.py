"""Split cfg4's device time: trace kernel vs device walk vs fuse vs RTT.

probe_cfg45 measured device-complete ~48 ms for 512 sg pairs; the walk
was previously believed ~0.2 ms.  This probe blocks on each pipeline
stage separately, with a no-op blocking RTT reference measured in the
same (degraded) channel state, so each stage's device cost is the
difference from the RTT floor.
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
    from parasail_rs_tpu.engine.aligner import _cigar_fuse
    from parasail_rs_tpu.matrices import Matrix
    from parasail_rs_tpu.ops.trace_walk import device_walk

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
    tr.align_cigars(q4, r4)  # warm everything incl. degrade

    batch, _, _ = tr._pack(q4, r4)

    def kern():
        pend = dispatch.execute(
            batch, gap_open=tr.gap_open, gap_extend=tr.gap_extend,
            mode=tr.key.mode, free=tr.key.free, outputs="trace",
            width=tr.key.width, fetch=False)
        return pend._packed

    def walk(pk):
        names, packed, big, B = pk
        trace_dev = big["trace_table"]
        eq = packed[names.index("end_query")]
        er = packed[names.index("end_ref")]
        return device_walk(trace_dev, batch.qbytes, batch.rbytes, eq, er,
                           tr.key.mode, tr.key.free), packed

    def fuse(wk):
        (ops_dev, bq, br), packed = wk
        L = ops_dev.shape[1]
        Lp = (L + 7) // 8 * 8
        return _cigar_fuse()(ops_dev, packed, bq, br, Lp - L)

    # warm each jit
    f = fuse(walk(kern()))
    jax.block_until_ready(f)

    # no-op RTT in this channel state
    tiny = jax.device_put(np.ones(8, np.int32))
    g = jax.jit(lambda x: x + 1)
    jax.block_until_ready(g(tiny))
    rtt = t(lambda: jax.block_until_ready(g(tiny)))
    print(f"noop blocking RTT: {rtt:.1f}ms", flush=True)

    k = t(lambda: jax.block_until_ready(kern()[1]))
    print(f"block on trace kernel scalars: {k:.1f}ms "
          f"(device ~{k-rtt:.1f})", flush=True)
    w = t(lambda: jax.block_until_ready(walk(kern())[0][0]))
    print(f"block on walk ops: {w:.1f}ms (walk ~{w-k:.1f})", flush=True)
    fz = t(lambda: jax.block_until_ready(fuse(walk(kern()))))
    print(f"block on fuse: {fz:.1f}ms (fuse ~{fz-w:.1f})", flush=True)

    def full():
        fx = fuse(walk(kern()))
        cp = getattr(fx, "copy_to_host_async", None)
        if cp:
            cp()
        np.asarray(fx)

    fl = t(full)
    print(f"full incl. d2h: {fl:.1f}ms (transfer ~{fl-fz:.1f}; "
          f"fused bytes {f.size*4/1024:.0f} KB)", flush=True)


if __name__ == "__main__":
    main()
