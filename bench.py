"""Headline benchmark: 150bp Smith-Waterman alignments/sec on one chip.

Matches BASELINE.json config 2/3 (local affine-gap SW, protein-sized
alphabet, large pair batch) and the north-star metric "150bp SW
alignments/sec/chip".  The timed region is the device-resident production
hot loop — the Pallas prefix-scan kernel on TPU (XLA wavefront path on
other backends) over an 8192-pair batch; inputs live on device as they
would in a streaming pipeline (host staging overlaps compute there).

Robustness: the dev-tunnel TPU occasionally wedges mid-run (ops hang for
minutes, then FailedPrecondition — see ROADMAP).  Both round-1 hangs
happened AFTER a successful compile+first batch, so the harness now
times many short chained windows, each under its own watchdog thread,
and persists partial results to a scratch file after every window.  The
parent process kills a hung child, keeps whatever windows completed,
retries once after a cool-down, and only then falls back to CPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "alignments/sec/chip", "vs_baseline": N}
vs_baseline is value / 1e6 (the BASELINE.json target of 10^6 aln/s/chip).
"""

import json
import os
import sys
import tempfile
import threading
import time

import numpy as np

CHILD_TIMEOUT = 420          # parent's patience per TPU attempt (s)
WEDGE_COOLDOWN = 240         # s to wait for the tunnel claim to reset
WINDOW_TIMEOUT = 90          # per-window watchdog (s)
WINDOWS = (1, 2, 4, 8, 16, 32, 32, 32)   # chained-kernel calls per window


def main():
    if os.environ.get("PT_BENCH_CPU") == "1":
        _run_cpu()
        return
    import multiprocessing as mp

    scratch = os.path.join(tempfile.gettempdir(), "pt_bench_partial.json")
    try:
        os.unlink(scratch)
    except OSError:
        pass

    best = None
    for attempt in (1, 2):
        proc = mp.Process(target=_run_tpu, args=(scratch,))
        proc.start()
        proc.join(timeout=CHILD_TIMEOUT)
        if proc.is_alive():
            proc.terminate()
            proc.join(5)
            if proc.is_alive():
                proc.kill()
                proc.join()
            print(f"[bench] attempt {attempt}: child hit the {CHILD_TIMEOUT}s "
                  "parent watchdog", file=sys.stderr)
        partial = _read_json(scratch)
        if partial:
            partial["attempts"] = attempt
            if best is None or len(partial.get("windows", [])) > len(
                    best.get("windows", [])):
                best = partial
        if best and best.get("windows"):
            break  # we have at least one timed TPU window — good enough
        if partial and partial.get("backend") not in (None, "tpu"):
            break  # no TPU in this environment; go straight to CPU
        if attempt == 1:
            print(f"[bench] no TPU window yet; cooling down {WEDGE_COOLDOWN}s "
                  "before retry", file=sys.stderr)
            time.sleep(WEDGE_COOLDOWN)

    if best and best.get("windows"):
        _emit(best)
        return
    print("[bench] TPU attempts exhausted; falling back to CPU backend",
          file=sys.stderr)
    os.environ["PT_BENCH_CPU"] = "1"
    os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)])


def _read_json(path):
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _write_json(path, obj):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


HISTORY = os.path.join(tempfile.gettempdir(), "pt_bench_history.jsonl")


def _emit(res):
    """Print the single driver-parsed JSON line from a partial-result dict."""
    B, L = res["B"], res["L"]
    # Every overhead source (tunnel RTT, relay stalls) only ever inflates a
    # window's wall time, so the per-call floor across windows is the least
    # contaminated device-time estimate; the median is reported alongside.
    per_call = [w["dt"] / w["iters"] for w in res["windows"]]
    best_dt = min(per_call)
    med_dt = float(np.median(per_call))
    aps = B / best_dt
    print(f"[bench] backend={res['backend']} windows={len(per_call)} "
          f"best={best_dt*1e3:.2f}ms median={med_dt*1e3:.2f}ms "
          f"{aps/1e6:.3f}M aln/s {B*L*L/best_dt/1e9:.1f} GCUPS",
          file=sys.stderr)
    out = {
        "metric": "150bp SW alignments/sec/chip",
        "value": round(aps),
        "unit": "alignments/sec/chip",
        "vs_baseline": round(aps / 1e6, 3),
        "backend": res["backend"],
        "attempts": res.get("attempts", 1),
        "windows": len(per_call),
        "median_aln_per_sec": round(B / med_dt),
        "gcups": round(B * L * L / best_dt / 1e9, 1),
        "compile_first_s": res.get("compile_first_s"),
        "stats_aln_per_sec": res.get("stats_aln_per_sec"),
        "e2e": res.get("e2e", {}),
    }
    if res["backend"] == "tpu":
        try:
            with open(HISTORY, "a") as f:
                f.write(json.dumps({"ts": time.time(),
                                    "aln_per_sec": out["value"],
                                    "gcups": out["gcups"]}) + "\n")
        except OSError:
            pass
    else:
        # CPU fallback (dev-tunnel outage): point at the most recent
        # REAL TPU measurement this machine recorded, clearly labeled —
        # the headline value stays the honest CPU number.
        prior = _last_tpu_record()
        if prior:
            out["prior_tpu_aln_per_sec"] = prior["aln_per_sec"]
            out["prior_tpu_age_hours"] = round(
                (time.time() - prior["ts"]) / 3600, 1)
            print(f"[bench] NOTE: last successful TPU bench on this "
                  f"machine: {prior['aln_per_sec']} aln/s "
                  f"({out['prior_tpu_age_hours']}h ago); this run's "
                  f"value is the CPU fallback", file=sys.stderr)
    print(json.dumps(out))


def _last_tpu_record():
    try:
        with open(HISTORY) as f:
            lines = [json.loads(l) for l in f if l.strip()]
        return lines[-1] if lines else None
    except (OSError, ValueError):
        return None


def _with_timeout(fn, timeout):
    """Run fn() on a worker thread; return its result or raise TimeoutError.

    block_until_ready on a wedged tunnel does not respond to Python
    signals, so a joinable worker thread is the only reliable watchdog.
    The abandoned thread keeps blocking harmlessly; the child exits via
    os._exit so it never joins at shutdown.
    """
    box = {}

    def work():
        try:
            box["out"] = fn()
        except Exception as e:  # noqa: BLE001 — report, don't crash the child
            box["err"] = e

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout)
    if t.is_alive():
        raise TimeoutError(f"no result within {timeout}s")
    if "err" in box:
        raise box["err"]
    return box.get("out")


def _run_tpu(scratch):
    import jax

    backend = jax.default_backend()
    res = {"backend": backend, "windows": []}
    _write_json(scratch, res)
    if backend != "tpu":
        os._exit(3)

    B, L, A = 8192, 150, 25
    Qp = Rp = 160
    rng = np.random.default_rng(0)
    profile = jax.device_put(
        rng.integers(-4, 12, size=(B, Qp, A)).astype(np.int32))
    ridx = jax.device_put(rng.integers(0, A, size=(B, Rp)).astype(np.int32))
    qlen = jax.device_put(np.full(B, L, np.int32))
    rlen = jax.device_put(np.full(B, L, np.int32))
    jax.block_until_ready([profile, ridx])
    res.update(B=B, L=L)

    from parasail_rs_tpu.ops.scan_kernel import scan_score_align

    def run(ql):
        return scan_score_align(
            profile, ridx, ql, rlen,
            open_=np.int32(11), ext=np.int32(1),
            mode="sw", free=(True,) * 4, width="sat", interpret=False,
            hmax_bound=8192)  # (smax 12 + open 11 + ext 1) * 320, pow2

    t0 = time.time()
    try:
        _with_timeout(lambda: jax.block_until_ready(run(qlen)), 180)
    except Exception as e:
        print(f"[bench] compile+first failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        os._exit(4)
    res["compile_first_s"] = round(time.time() - t0, 2)
    _write_json(scratch, res)
    print(f"[bench] backend={backend} B={B} "
          f"compile+first={res['compile_first_s']}s", file=sys.stderr)

    for iters in WINDOWS:
        def window(iters=iters):
            ql = qlen
            t0 = time.time()
            for _ in range(iters):
                out = run(ql)
                ql = qlen + (out["score"] & 0)  # data dep: no elision/caching
            float(np.asarray(out["score"]).sum())
            return time.time() - t0
        try:
            dt = _with_timeout(window, WINDOW_TIMEOUT)
        except Exception as e:
            print(f"[bench] window iters={iters} failed: "
                  f"{type(e).__name__}: {e}; trying the next window",
                  file=sys.stderr)
            # the first sustained burst after process start often wedges
            # for minutes then recovers; a truly dead runtime is bounded
            # by the parent's CHILD_TIMEOUT watchdog either way
            continue
        res["windows"].append({"iters": iters, "dt": dt})
        _write_json(scratch, res)
        print(f"[bench] window iters={iters}: {dt/iters*1e3:.2f} ms/call",
              file=sys.stderr)
        time.sleep(0.05)

    # Fused chain: NCH kernel calls inside ONE jit — a single dispatch,
    # so the timed region holds zero per-call host/tunnel overhead.
    # This is the ground-truth device time (tools/bench_kernel.py agrees
    # with it); the eager windows above bound it from the host side.
    NCH = 8

    @jax.jit
    def chained(ql):
        out = None
        for _ in range(NCH):
            out = run(ql)
            ql = ql + (out["score"] & 0)
        return out["score"]

    try:
        _with_timeout(lambda: jax.block_until_ready(chained(qlen)), 180)
        for _ in range(3):
            def fwin():
                t0 = time.time()
                float(np.asarray(chained(qlen)).sum())
                return time.time() - t0
            dt = _with_timeout(fwin, WINDOW_TIMEOUT)
            res["windows"].append({"iters": NCH, "dt": dt, "fused": True})
            _write_json(scratch, res)
            print(f"[bench] fused x{NCH}: {dt/NCH*1e3:.2f} ms/call",
                  file=sys.stderr)
    except Exception as e:
        print(f"[bench] fused windows unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)

    if res["windows"]:
        _stats_kernel_windows(res, scratch, profile, ridx, qlen, rlen, B)
        res["e2e"] = {}
        _secondary_configs(True, res["e2e"],
                           lambda: _write_json(scratch, res))
    os._exit(0)


def _stats_kernel_windows(res, scratch, profile, ridx, qlen, rlen, B):
    """Chained-dependency timing of the stats kernel (matches/similar/
    length accumulators) — the second headline of the kernel family."""
    import jax

    from parasail_rs_tpu.ops.scan_kernel import scan_score_align

    rng = np.random.default_rng(3)
    A = profile.shape[2]
    qidx = jax.device_put(
        rng.integers(0, A, size=(B, profile.shape[1])).astype(np.int32))

    def run(ql):
        return scan_score_align(
            profile, ridx, ql, rlen, qidx,
            open_=np.int32(11), ext=np.int32(1),
            mode="sw", free=(True,) * 4, width="sat", outputs="stats",
            interpret=False, hmax_bound=8192)

    try:
        _with_timeout(lambda: jax.block_until_ready(run(qlen)["score"]), 180)
        per_call = []
        for iters in (4, 8):
            def window(iters=iters):
                ql = qlen
                t0 = time.time()
                for _ in range(iters):
                    out = run(ql)
                    ql = qlen + (out["score"] & 0)
                float(np.asarray(out["score"]).sum())
                return time.time() - t0
            dt = _with_timeout(window, WINDOW_TIMEOUT)
            per_call.append(dt / iters)
            print(f"[bench] stats window iters={iters}: "
                  f"{dt/iters*1e3:.2f} ms/call", file=sys.stderr)
        res["stats_aln_per_sec"] = round(B / min(per_call))
        _write_json(scratch, res)

        NCH = 8

        @jax.jit
        def chained(ql):
            out = None
            for _ in range(NCH):
                out = run(ql)
                ql = ql + (out["score"] & 0)
            return out["score"]

        _with_timeout(lambda: jax.block_until_ready(chained(qlen)), 180)
        for _ in range(2):
            def fwin():
                t0 = time.time()
                float(np.asarray(chained(qlen)).sum())
                return time.time() - t0
            dt = _with_timeout(fwin, WINDOW_TIMEOUT)
            per_call.append(dt / NCH)
            print(f"[bench] stats fused x{NCH}: {dt/NCH*1e3:.2f} ms/call",
                  file=sys.stderr)
        res["stats_aln_per_sec"] = round(B / min(per_call))
        _write_json(scratch, res)
    except Exception as e:  # stats headline is best-effort
        print(f"[bench] stats windows failed: {type(e).__name__}: {e}",
              file=sys.stderr)


def _run_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    backend = jax.default_backend()
    B, L, A = 256, 150, 25
    Qp = Rp = 160
    rng = np.random.default_rng(0)
    profile = jax.device_put(
        rng.integers(-4, 12, size=(B, Qp, A)).astype(np.int32))
    qidx = jax.device_put(rng.integers(0, A, size=(B, Qp)).astype(np.int32))
    ridx = jax.device_put(rng.integers(0, A, size=(B, Rp)).astype(np.int32))
    qlen = jax.device_put(np.full(B, L, np.int32))
    rlen = jax.device_put(np.full(B, L, np.int32))
    jax.block_until_ready([profile, ridx])

    from parasail_rs_tpu.ops.wavefront import wavefront_align

    def run(ql):
        return wavefront_align(
            profile, qidx, ridx, ql, rlen,
            open_=np.int32(11), ext=np.int32(1),
            mode="sw", free=(True,) * 4, outputs="score", width="sat")

    jax.block_until_ready(run(qlen))
    res = {"backend": backend, "B": B, "L": L, "windows": []}
    for iters in (4, 4, 4):
        ql = qlen
        t0 = time.time()
        for _ in range(iters):
            out = run(ql)
            ql = qlen + (out["score"] & 0)
        float(np.asarray(out["score"]).sum())
        res["windows"].append({"iters": iters, "dt": time.time() - t0})
    res["e2e"] = {}
    _secondary_configs(False, res["e2e"], lambda: None)
    _emit(res)


def _timeit(fn, reps=3):
    times = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return float(np.median(times))


def _secondary_configs(on_tpu, out, checkpoint):
    """BASELINE.json configs 1-5, engine end-to-end (encode -> dispatch ->
    fetch).  Results land in the final JSON's "e2e" dict; each config runs
    under its own watchdog on TPU and a failure stops the sweep (a wedged
    runtime won't recover mid-process)."""
    from parasail_rs_tpu.engine import Aligner, Profile
    from parasail_rs_tpu.matrices import Matrix

    rng = np.random.default_rng(1)
    dna = list(b"ACGT")
    aa = list(b"ARNDCQEGHILKMFPSTWYV")

    def seqs(alpha, n, lo, hi):
        return [rng.choice(alpha, size=rng.integers(lo, hi))
                .astype("uint8").tobytes() for _ in range(n)]

    def guard(name, fn, timeout=150):
        try:
            if on_tpu:
                return _with_timeout(fn, timeout)
            return fn()
        except Exception as e:  # noqa: BLE001
            print(f"[bench] {name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            out[name + "_error"] = f"{type(e).__name__}"
            checkpoint()
            raise SystemExit if on_tpu else e  # stop sweep on TPU

    scale = 1 if on_tpu else 8  # smaller sweeps off-TPU

    try:
        # 2: SW local blosum62, 1k-pair engine batch (pack->dispatch->fetch)
        blosum = Matrix.from_name("blosum62")
        sw = (Aligner.new().matrix(blosum).gap_open(11).gap_extend(1)
              .local().build())
        qs = seqs(aa, 1024 // scale, 140, 160)
        rs = seqs(aa, 1024 // scale, 140, 160)
        guard("cfg2_warm", lambda: sw.align_batch(qs, rs))
        dt = guard("cfg2", lambda: _timeit(lambda: sw.align_batch(qs, rs)))
        out["cfg2_sw_e2e_aln_per_sec"] = round(len(qs) / dt)
        checkpoint()
        print(f"[bench] cfg2 SW blosum62 {len(qs)}-pair batch: {dt*1e3:.1f} ms "
              f"({len(qs)/dt:.0f} aln/s e2e)", file=sys.stderr)

        # 3: profile reuse - one query vs many references
        nrefs = 16384 // scale
        prof = Profile.new(qs[0], False, blosum)
        pa = (Aligner.new().profile(prof).gap_open(11).gap_extend(1)
              .local().scan().build())
        refs = seqs(aa, nrefs, 140, 160)
        # warm with the SAME batch shape: a different padded batch would
        # recompile inside the timed rep
        guard("cfg3_warm", lambda: pa.align_batch(None, refs), timeout=240)
        dt = guard("cfg3", lambda: _timeit(
            lambda: pa.align_batch(None, refs), reps=1), timeout=240)
        out["cfg3_profile_e2e_aln_per_sec"] = round(nrefs / dt)
        checkpoint()
        print(f"[bench] cfg3 profile vs {nrefs} refs: {dt*1e3:.0f} ms "
              f"({nrefs/dt:.0f} aln/s e2e)", file=sys.stderr)

        # 4: semi-global + trace -> CIGAR emission (device flags + host walk)
        tr = (Aligner.new().matrix(blosum).gap_open(11).gap_extend(1)
              .semi_global().use_trace().build())
        n4 = 512 // scale
        q4, r4 = qs[:n4], rs[:n4]

        def cig():
            res = tr.align_batch(q4, r4)
            return tr.cigars(res, q4, r4)   # one native batch walk

        guard("cfg4_warm", cig)
        dt = guard("cfg4", lambda: _timeit(cig))
        out["cfg4_cigars_per_sec"] = round(n4 / dt)
        checkpoint()
        print(f"[bench] cfg4 sg trace+CIGAR {n4} pairs: {dt*1e3:.1f} ms "
              f"({n4/dt:.0f} CIGARs/s e2e)", file=sys.stderr)

        # 1: NW global score-only, DNA, single 150bp pair (latency)
        nw = Aligner.new().gap_open(5).gap_extend(2).build()
        q150, r150 = seqs(dna, 2, 150, 151)
        guard("cfg1_warm", lambda: nw.align(q150, r150))
        dt = guard("cfg1", lambda: _timeit(lambda: nw.align(q150, r150)))
        out["cfg1_nw_single_pair_ms"] = round(dt * 1e3, 2)
        checkpoint()
        print(f"[bench] cfg1 NW 150bp single-pair latency: {dt*1e3:.2f} ms",
              file=sys.stderr)

        # 5: length-binned mixed batch (100bp - 2kbp)
        mixed_q = seqs(dna, 256 // scale, 100, 2000)
        mixed_r = seqs(dna, 256 // scale, 100, 2000)
        mx = Aligner.new().gap_open(5).gap_extend(2).local().build()
        guard("cfg5_warm", lambda: mx.align_many(mixed_q, mixed_r),
              timeout=240)
        dt = guard("cfg5", lambda: _timeit(
            lambda: mx.align_many(mixed_q, mixed_r), reps=1), timeout=240)
        cells = sum(len(a) * len(b) for a, b in zip(mixed_q, mixed_r))
        out["cfg5_mixed_gcups"] = round(cells / dt / 1e9, 3)
        checkpoint()
        print(f"[bench] cfg5 mixed 100bp-2kbp x{len(mixed_q)}: {dt*1e3:.0f} ms "
              f"({cells/dt/1e9:.2f} GCUPS e2e)", file=sys.stderr)

        # 6: long pairs through the streamed scan route (16kbp x 16kbp,
        # 128-pair batch — the long-read production path)
        if on_tpu:
            L6, B6 = 16384, 128
            q6 = seqs(dna, B6, L6, L6 + 1)
            r6 = seqs(dna, B6, L6, L6 + 1)
            lg = Aligner.new().gap_open(5).gap_extend(1).local().build()
            guard("cfg6_warm", lambda: lg.align_batch(q6, r6), timeout=300)
            dt = guard("cfg6", lambda: _timeit(
                lambda: lg.align_batch(q6, r6), reps=1), timeout=240)
            out["cfg6_stream16k_gcups"] = round(B6 * L6 * L6 / dt / 1e9, 1)
            checkpoint()
            print(f"[bench] cfg6 streamed 16kbp x{B6}: {dt*1e3:.0f} ms "
                  f"({B6*L6*L6/dt/1e9:.1f} GCUPS e2e)", file=sys.stderr)
    except SystemExit:
        pass
    except Exception as e:  # secondary sweeps never break the headline
        print(f"[bench] secondary sweep stopped: {type(e).__name__}: {e}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
