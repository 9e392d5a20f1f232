"""Decompose cfg4b (4096-pair align_cigars) wall time on the dev chip.

Eager differential method: block on successive pipeline cuts in the
same (degraded) channel state, null-RTT measured alongside.
"""
import sys, time
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
    from parasail_rs_tpu.engine.aligner import _cigar_fuse

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(1)
    aa = list(b"ARNDCQEGHILKMFPSTWYV")
    N = 4096
    q = [rng.choice(aa, size=rng.integers(140, 160)).astype("uint8").tobytes() for _ in range(N)]
    r = [rng.choice(aa, size=rng.integers(140, 160)).astype("uint8").tobytes() for _ in range(N)]
    blosum = Matrix.from_name("blosum62")
    tr = (Aligner.new().matrix(blosum).gap_open(11).gap_extend(1)
          .semi_global().build())
    t0 = time.perf_counter()
    tr.align_cigars(q, r)   # warm everything + degrade channel
    print(f"warm call {time.perf_counter()-t0:.2f}s", flush=True)

    tiny = jax.device_put(np.ones(8, np.int32))
    g = jax.jit(lambda x: x + 1)
    jax.block_until_ready(g(tiny))
    rtt = t(lambda: jax.block_until_ready(g(tiny)))
    print(f"null blocking RTT: {rtt:.1f}ms", flush=True)

    # full wall
    full = t(lambda: tr.align_cigars(q, r), reps=3)
    print(f"full align_cigars: {full:.1f}ms ({N/full*1e3:.0f}/s)", flush=True)

    # pack only
    pk = t(lambda: tr._pack(q, r), reps=3)
    print(f"pack: {pk:.1f}ms", flush=True)

    batch, qlens, rlens = tr._pack(q, r)

    # upload only (fresh numpy each rep to avoid committed-array reuse)
    def upload():
        b2, _, _ = tr._pack(q, r)
        b2.to_device()
        jax.block_until_ready([b2.qbytes, b2.rbytes])
    up = t(upload, reps=3)
    print(f"pack+upload(block): {up:.1f}ms (upload ~{up-pk-rtt:.1f})", flush=True)

    batch.to_device()
    jax.block_until_ready([batch.qbytes, batch.rbytes])

    def kern():
        # pallas packed form required (TPU route); guard for clarity
        pend = dispatch.execute(
            batch, gap_open=tr.gap_open, gap_extend=tr.gap_extend,
            mode=tr.key.mode, free=tr.key.free, outputs="trace",
            width=tr.key.width, fetch=False)
        assert pend._packed is not None, "probe needs the pallas route (TPU backend)"
        return pend._packed

    k = t(lambda: jax.block_until_ready(kern()[1]), reps=3)
    print(f"trace kernel (block scalars): {k:.1f}ms (dev ~{k-rtt:.1f})", flush=True)

    def walk(pk_):
        names, packed, big, B = pk_
        eq = packed[names.index("end_query")]
        er = packed[names.index("end_ref")]
        return device_walk(big["trace_table"], batch.qbytes, batch.rbytes,
                           eq, er, tr.key.mode, tr.key.free), packed

    w = t(lambda: jax.block_until_ready(walk(kern())[0][0]), reps=3)
    print(f"+walk (block ops): {w:.1f}ms (walk ~{w-k:.1f})", flush=True)

    def fuse(wk):
        (ops_dev, bq, br), packed = wk
        L = ops_dev.shape[1]
        Lp = (L + 7) // 8 * 8
        return _cigar_fuse()(ops_dev, packed, bq, br, Lp - L)

    fz = t(lambda: jax.block_until_ready(fuse(walk(kern()))), reps=3)
    print(f"+fuse (block): {fz:.1f}ms (fuse ~{fz-w:.1f})", flush=True)

    fx = fuse(walk(kern()))
    nb = fx.size * fx.dtype.itemsize
    def d2h():
        fx2 = fuse(walk(kern()))
        cp = getattr(fx2, "copy_to_host_async", None)
        if cp: cp()
        np.asarray(fx2)
    dl = t(d2h, reps=3)
    print(f"+d2h: {dl:.1f}ms (transfer ~{dl-fz:.1f}; payload {nb/1024:.0f} KB)", flush=True)

    # host encode
    from parasail_rs_tpu.constants import cigar_strings_batch
    from parasail_rs_tpu.ops.trace_walk import ops_to_runs_flat
    host = np.asarray(fx)
    # reproduce the unfuse used by _device_trace_walk? approximate: time RLE+string on ops rows
    out, ops_host, _bq, _br = tr._device_trace_walk(batch)
    e1 = t(lambda: ops_to_runs_flat(ops_host[:batch.size]), reps=3)
    runs = ops_to_runs_flat(ops_host[:batch.size])
    e2 = t(lambda: cigar_strings_batch(*runs), reps=3)
    print(f"host RLE: {e1:.1f}ms  string build: {e2:.1f}ms", flush=True)


if __name__ == "__main__":
    main()
