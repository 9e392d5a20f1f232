#!/usr/bin/env python
"""Extended randomized differential fuzzing: engine vs golden oracle.

A deadline-driven companion to tests/test_fuzz.py for long idle
sessions: every iteration draws a random configuration (alphabet,
matrix, mode, semi-global free flags, penalties including open <= ext
and 0/0, solution width, mixed/degenerate lengths, case-mixed bytes)
and checks a randomly chosen public-API path — align_batch scalars and
stats, align_many ordering, align_cigars strings (the chunked device
walk, with the chunk size randomized so tail chunks are exercised),
tables/rowcol slices, or StreamingAligner — bit-exactly against
golden.model / the per-pair reference path.

Usage: JAX_PLATFORMS=cpu python tools/fuzz_session.py [minutes]
Exits 0 with a summary, or 1 with a repro dump at the first mismatch.
"""

import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from parasail_rs_tpu.engine import Aligner, Profile  # noqa: E402
from parasail_rs_tpu.engine.aligner import Aligner as Al  # noqa: E402
from parasail_rs_tpu.engine.stream import StreamingAligner  # noqa: E402
from parasail_rs_tpu.golden import model as golden  # noqa: E402
from parasail_rs_tpu.matrices import Matrix  # noqa: E402

MODES = [("global_", "nw"), ("semi_global", "sg"), ("local", "sw")]
DNA = list(b"ACGT")
AA = list(b"ARNDCQEGHILKMFPSTWYV")
MIXED = list(b"ACGTacgt")


def rand_matrix(rng):
    kind = rng.integers(0, 3)
    if kind == 0:
        return Matrix.create(b"ACGT", int(rng.integers(1, 6)),
                             -int(rng.integers(1, 6))), DNA
    if kind == 1:
        return Matrix.from_name("blosum62"), AA
    return Matrix.create(b"ACGT", int(rng.integers(1, 4)),
                         -int(rng.integers(1, 4))), MIXED


def rand_seqs(rng, alpha, n, lo=1, hi=60):
    return [rng.choice(alpha, size=rng.integers(lo, hi)).astype("uint8")
            .tobytes() for _ in range(n)]


def rand_free(rng):
    """Random (query_gaps, ref_gaps) lists in the builder's vocabulary."""
    opts = ([], ["prefix"], ["suffix"], ["prefix", "suffix"])
    return (list(opts[rng.integers(0, 4)]), list(opts[rng.integers(0, 4)]))


def build(m, mode_setter, open_, ext, free=None, stats=False, trace=False,
          width="sat"):
    b = (Aligner.new().matrix(m).gap_open(open_).gap_extend(ext)
         .solution_width(width))
    getattr(b, mode_setter)()
    if free is not None:
        b.allow_query_gaps(free[0]).allow_ref_gaps(free[1])
    if stats:
        b.use_stats()
    if trace:
        b.use_trace()
    return b.build()


def check_scalars(rng):
    m, alpha = rand_matrix(rng)
    setter, mode = MODES[rng.integers(0, 3)]
    open_, ext = int(rng.integers(0, 14)), int(rng.integers(0, 8))
    free = rand_free(rng) if mode == "sg" else None
    stats = bool(rng.integers(0, 2))
    n = int(rng.integers(1, 20))
    qs, rs = rand_seqs(rng, alpha, n), rand_seqs(rng, alpha, n)
    al = build(m, setter, open_, ext, free, stats=stats)
    gfree = (golden.free_flags(mode, free[0], free[1]) if mode == "sg"
             else golden.free_flags(mode))
    for q, r, res in zip(qs, rs, al.align_batch(qs, rs)):
        g = golden.align_seqs(q, r, m, open_, ext, mode, free=gfree)
        assert res.get_score() == g.score, ("score", mode, open_, ext,
                                            free, q, r)
        assert res.get_end_query() == g.end_query, ("eq", mode, q, r)
        assert res.get_end_ref() == g.end_ref, ("er", mode, q, r)
        if stats:
            assert res.get_matches() == g.matches, ("m", mode, open_,
                                                    ext, free, q, r)
            assert res.get_similar() == g.similar, ("s", mode, q, r)
            assert res.get_length() == g.length, ("l", mode, q, r)
    return f"scalars {mode} o{open_} e{ext} stats={stats} n={n}"


def check_cigars(rng):
    m, alpha = rand_matrix(rng)
    setter, mode = MODES[rng.integers(0, 3)]
    open_, ext = int(rng.integers(0, 14)), int(rng.integers(1, 8))
    free = rand_free(rng) if mode == "sg" else None
    n = int(rng.integers(1, 30))
    qs, rs = rand_seqs(rng, alpha, n), rand_seqs(rng, alpha, n)
    old = Al._CIGAR_CHUNK
    try:
        Al._CIGAR_CHUNK = int(rng.choice([4, 16, 1 << 30]))
        al = build(m, setter, open_, ext, free)
        alns, cigs = al.align_cigars(qs, rs)
    finally:
        Al._CIGAR_CHUNK = old
    tr = build(m, setter, open_, ext, free, trace=True)
    ref = tr.align_batch(qs, rs)
    refc = tr.cigars(ref, qs, rs)
    for i in range(n):
        assert alns[i].get_score() == ref[i].get_score(), (
            "cig-score", mode, open_, ext, free, qs[i], rs[i])
        assert cigs[i] == refc[i], ("cigar", mode, open_, ext, free,
                                    qs[i], rs[i], cigs[i], refc[i])
    return f"cigars {mode} o{open_} e{ext} n={n}"


def check_many(rng):
    m, alpha = rand_matrix(rng)
    setter, mode = MODES[rng.integers(0, 3)]
    open_, ext = int(rng.integers(0, 14)), int(rng.integers(0, 8))
    n = int(rng.integers(2, 30))
    qs = rand_seqs(rng, alpha, n, 1, 300)
    rs = rand_seqs(rng, alpha, n, 1, 300)
    al = build(m, setter, open_, ext)
    many = al.align_many(qs, rs)
    for i in map(int, rng.choice(n, min(n, 6), replace=False)):
        one = al.align(qs[i], rs[i])
        assert many[i].get_score() == one.get_score(), (
            "many", mode, open_, ext, i, qs[i], rs[i])
    return f"many {mode} o{open_} e{ext} n={n}"


def check_stream(rng):
    m, alpha = rand_matrix(rng)
    setter, mode = MODES[rng.integers(0, 3)]
    open_, ext = int(rng.integers(0, 14)), int(rng.integers(1, 8))
    n = int(rng.integers(2, 60))
    qs, rs = rand_seqs(rng, alpha, n), rand_seqs(rng, alpha, n)
    al = build(m, setter, open_, ext)
    ref = [a.get_score() for a in al.align_batch(qs, rs)]
    with StreamingAligner(al, flush_size=int(rng.choice([2, 7, 64]))) as st:
        hs = st.submit_many(qs, rs)
        st.flush()
        got = [h.result().get_score() for h in hs]
    assert got == ref, ("stream", mode, open_, ext, n)
    return f"stream {mode} o{open_} e{ext} n={n}"


def check_tables(rng):
    m, alpha = rand_matrix(rng)
    setter, mode = MODES[rng.integers(0, 3)]
    open_, ext = int(rng.integers(0, 10)), int(rng.integers(0, 6))
    q, = rand_seqs(rng, alpha, 1, 1, 30)
    r, = rand_seqs(rng, alpha, 1, 1, 30)
    b = (Aligner.new().matrix(m).gap_open(open_).gap_extend(ext))
    getattr(b, setter)()
    b.use_table()
    al = b.build()
    res = al.align(q, r)
    g = golden.align_seqs(q, r, m, open_, ext, mode)
    got = np.asarray(res.get_score_table().as_slice()).reshape(
        len(q), len(r))
    assert np.array_equal(got, g.score_table), ("table", mode, open_,
                                                ext, q, r)
    return f"table {mode} o{open_} e{ext}"


def check_widths(rng):
    m, alpha = rand_matrix(rng)
    setter, mode = MODES[rng.integers(0, 3)]
    open_, ext = int(rng.integers(0, 12)), int(rng.integers(0, 6))
    n = int(rng.integers(1, 10))
    qs, rs = rand_seqs(rng, alpha, n), rand_seqs(rng, alpha, n)
    scores = {}
    for width in ("sat", "8", "16", "32", "64"):
        al = build(m, setter, open_, ext, width=width)
        scores[width] = [a.get_score() for a in al.align_batch(qs, rs)]
    # exact widths must agree with 32/64 (sat/8/16 saturate by design
    # only in REPORTING is_saturated; scores stay exact here)
    assert scores["32"] == scores["64"] == scores["sat"], (
        "widths", mode, open_, ext, scores)
    return f"widths {mode} o{open_} e{ext} n={n}"


def check_rowcol(rng):
    m, alpha = rand_matrix(rng)
    setter, mode = MODES[rng.integers(0, 3)]
    open_, ext = int(rng.integers(0, 10)), int(rng.integers(0, 6))
    q, = rand_seqs(rng, alpha, 1, 1, 40)
    r, = rand_seqs(rng, alpha, 1, 1, 40)
    b = Aligner.new().matrix(m).gap_open(open_).gap_extend(ext)
    getattr(b, setter)()
    b.use_last_rowcol()
    res = b.build().align(q, r)
    g = golden.align_seqs(q, r, m, open_, ext, mode)
    assert np.array_equal(np.asarray(res.get_score_row()), g.score_row), (
        "row", mode, open_, ext, q, r)
    assert np.array_equal(np.asarray(res.get_score_col()), g.score_col), (
        "col", mode, open_, ext, q, r)
    return f"rowcol {mode} o{open_} e{ext}"


def check_banded(rng):
    m, alpha = rand_matrix(rng)
    open_, ext = int(rng.integers(0, 10)), int(rng.integers(0, 6))
    n = int(rng.integers(1, 10))
    qs, rs = rand_seqs(rng, alpha, n, 1, 40), rand_seqs(rng, alpha, n, 1, 40)
    bw = max(max(len(x) for x in qs), max(len(x) for x in rs))
    # full-width band == exact NW (the reference's documented property)
    al = (Aligner.new().matrix(m).gap_open(open_).gap_extend(ext)
          .bandwidth(bw).build())
    banded = al.banded_nw_batch(qs, rs)
    for q, r, res in zip(qs, rs, banded):
        g = golden.align_seqs(q, r, m, open_, ext, "nw")
        assert res.get_score() == g.score, ("banded-full", open_, ext,
                                            bw, q, r)
    # narrow band: batch path must equal the per-pair path
    al2 = (Aligner.new().matrix(m).gap_open(open_).gap_extend(ext)
           .bandwidth(int(rng.integers(1, 8))).build())
    got = al2.banded_nw_batch(qs, rs)
    for i in map(int, rng.choice(n, min(n, 3), replace=False)):
        one = al2.banded_nw(qs[i], rs[i])
        assert got[i].get_score() == one.get_score(), ("banded-batch", i)
    return f"banded o{open_} e{ext} n={n}"


def check_profile(rng):
    m, alpha = rand_matrix(rng)
    setter, mode = MODES[rng.integers(0, 3)]
    open_, ext = int(rng.integers(0, 12)), int(rng.integers(1, 6))
    q, = rand_seqs(rng, alpha, 1, 2, 40)
    n = int(rng.integers(1, 15))
    refs = rand_seqs(rng, alpha, n, 1, 60)
    stats = bool(rng.integers(0, 2))
    prof = Profile.new(q, stats, m)
    b = Aligner.new().profile(prof).gap_open(open_).gap_extend(ext)
    getattr(b, setter)()
    al = b.build()
    gfree = golden.free_flags(mode)
    for r, res in zip(refs, al.align_batch(None, refs)):
        g = golden.align_seqs(q, r, m, open_, ext, mode, free=gfree)
        assert res.get_score() == g.score, ("prof", mode, open_, ext,
                                            q, r)
        if stats:
            assert res.get_matches() == g.matches, ("prof-m", mode, q, r)
    return f"profile {mode} o{open_} e{ext} stats={stats} n={n}"


CHECKS = [check_scalars, check_cigars, check_many, check_stream,
          check_tables, check_widths, check_rowcol, check_banded,
          check_profile]


def main():
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    deadline = time.time() + minutes * 60
    rng = np.random.default_rng(int(time.time()))
    counts = {}
    it = 0
    while time.time() < deadline:
        fn = CHECKS[int(rng.integers(0, len(CHECKS)))]
        try:
            tag = fn(rng)
        except AssertionError as e:
            print(f"FUZZ MISMATCH at iteration {it} in {fn.__name__}:",
                  flush=True)
            print(repr(e.args), flush=True)
            traceback.print_exc()
            sys.exit(1)
        except Exception:
            print(f"FUZZ ERROR at iteration {it} in {fn.__name__}:",
                  flush=True)
            traceback.print_exc()
            sys.exit(1)
        counts[fn.__name__] = counts.get(fn.__name__, 0) + 1
        it += 1
        if it % 25 == 0:
            # the jax 0.9.0 CPU backend segfaults inside LLVM past ~1000
            # distinct in-process compiles (see tests/conftest.py);
            # random configs compile fresh programs constantly, so drop
            # executables aggressively — recompiles are the fuzz cost
            jax.clear_caches()
        if it % 50 == 0:
            print(f"[fuzz] {it} iterations, "
                  f"{(deadline - time.time())/60:.0f} min left: {counts}",
                  flush=True)
    print(f"[fuzz] PASSED: {it} iterations clean: {counts}", flush=True)


if __name__ == "__main__":
    main()
