"""Native C++ traceback walker: bit-parity vs the Python golden walker.

The C++ walker (native/ptwalk.cc) must reproduce golden.walk_trace
exactly — same CIGAR runs, same begin coordinates — across modes,
free-end variants, and batch sizes.
"""

import numpy as np
import pytest

from parasail_rs_tpu.golden import model as golden
from parasail_rs_tpu.matrices import Matrix
from parasail_rs_tpu.native import walker


pytestmark = pytest.mark.skipif(
    not walker.available(), reason="no C++ compiler available")


def _cases(seed=11, n=60):
    rng = np.random.default_rng(seed)
    m = Matrix.from_name("blosum62")
    alpha = list(b"ARNDCQEGHILKMFPSTWYV")
    for _ in range(n):
        q = rng.choice(alpha, size=rng.integers(1, 40)).astype("uint8").tobytes()
        r = rng.choice(alpha, size=rng.integers(1, 40)).astype("uint8").tobytes()
        yield q, r


@pytest.mark.parametrize("mode,free", [
    ("sw", (True, True, True, True)),
    ("nw", (False, False, False, False)),
    ("sg", (True, True, True, True)),
    ("sg", (False, True, True, False)),
    ("sg", (True, False, False, True)),
    ("sg", (False, False, False, False)),
])
def test_walker_parity(mode, free):
    m = Matrix.from_name("blosum62")
    for q, r in _cases():
        g = golden.align_seqs(q, r, m, 11, 1, mode, free)
        ref_walk = golden.walk_trace(
            g.trace_table, q, r, g.end_query, g.end_ref, mode, free)
        qb, _, db, _ = free if mode != "sw" else (True,) * 4
        res = walker.walk_one(
            g.trace_table, q, r, g.end_query, g.end_ref,
            local=mode == "sw", qb=qb, db=db)
        assert res is not None
        ops, bq, br = res
        assert ops == ref_walk.ops, (mode, free, q, r)
        assert (bq, br) == (ref_walk.beg_query, ref_walk.beg_ref)


def test_walker_batch_matches_walk_one():
    m = Matrix.from_name("blosum62")
    cases = list(_cases(seed=5, n=40))
    traces, end_qs, end_rs, walks = [], [], [], []
    for q, r in cases:
        g = golden.align_seqs(q, r, m, 11, 1, "sw")
        traces.append(g.trace_table)
        end_qs.append(g.end_query)
        end_rs.append(g.end_ref)
        walks.append(golden.walk_trace(
            g.trace_table, q, r, g.end_query, g.end_ref, "sw"))
    out = walker.walk_batch(
        traces, [q for q, _ in cases], [r for _, r in cases],
        end_qs, end_rs, local=True, qb=True, db=True)
    assert out is not None
    for (packed, bq, br), w in zip(out, walks):
        ops = [(int(v) >> 4, "MIDNSHP=XB"[int(v) & 0xF]) for v in packed]
        assert ops == w.ops
        assert (bq, br) == (w.beg_query, w.beg_ref)


def test_walker_merge_m():
    # SSW-style merged M runs: '='/'X' collapse, 'I'/'D' unchanged
    m = Matrix.default()
    q, r = b"ACGTTTACGT", b"ACGTACGA"
    g = golden.align_seqs(q, r, m, 2, 1, "sw")
    res = walker.walk_one(
        g.trace_table, q, r, g.end_query, g.end_ref,
        local=True, qb=True, db=True, merge_m=True)
    ops, _, _ = res
    assert all(op in ("M", "I", "D") for _, op in ops)


def test_engine_cigar_uses_native():
    # End-to-end: engine CIGARs are identical whether the native walker
    # or the Python fallback produced them (covered implicitly — the
    # engine prefers native when available; compare against golden).
    from parasail_rs_tpu.engine import Aligner

    m = Matrix.from_name("blosum62")
    aligner = (Aligner.new().matrix(m).gap_open(11).gap_extend(1)
               .local().use_trace().build())
    q, r = b"HEAGAWGHEE", b"PAWHEAE"
    res = aligner.align(q, r)
    g = golden.align_seqs(q, r, m, 11, 1, "sw")
    w = golden.walk_trace(g.trace_table, q, r, g.end_query, g.end_ref, "sw")
    assert res.get_cigar(q, r) == w.cigar_string()


def _numpy_rle_reference(ops, merge_m):
    from parasail_rs_tpu.ops.trace_walk import ops_to_runs

    outs = [ops_to_runs(ops[b], merge_m) for b in range(ops.shape[0])]
    flat = (np.concatenate(outs) if outs else np.empty(0, np.uint32))
    return flat, np.array([len(o) for o in outs], np.int64)


@pytest.mark.parametrize("merge_m", [False, True])
def test_native_rle_matches_per_pair_reference(merge_m):
    if not walker.available():
        pytest.skip("native walker unavailable")
    rng = np.random.default_rng(5)
    B, L = 257, 96
    ops = np.zeros((B, L), np.uint8)
    ns = rng.integers(0, L + 1, B)     # include empty rows
    for b in range(B):
        ops[b, :ns[b]] = rng.integers(1, 5, ns[b])
    got = walker.rle_ops(ops, merge_m)
    assert got is not None
    want = _numpy_rle_reference(ops, merge_m)
    assert np.array_equal(got[1], want[1])
    assert np.array_equal(got[0], want[0])


def test_native_rle_edge_cases():
    if not walker.available():
        pytest.skip("native walker unavailable")
    empty = walker.rle_ops(np.zeros((0, 8), np.uint8))
    assert empty[0].size == 0 and empty[1].size == 0
    allzero = walker.rle_ops(np.zeros((3, 8), np.uint8))
    assert allzero[1].tolist() == [0, 0, 0] and allzero[0].size == 0
    # one maximal row: alternating ops -> L runs (cap == L, no overflow)
    row = np.tile(np.array([1, 3], np.uint8), 16)[None, :]
    flat, counts = walker.rle_ops(row)
    assert counts.tolist() == [32]
    assert all(int(v) >> 4 == 1 for v in flat)
