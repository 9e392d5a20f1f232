"""Pallas-native sequence-parallel route (dist/seqpar_scan.py).

The rowseg scan kernel under shard_map must reproduce the golden oracle
bit-exactly across the 8-device mesh — scores, end coordinates, stats
accumulators and trace flag planes — for every mode and free-end
variant, with tiles crossing both device (column) and query-chunk (row)
boundaries and ragged lengths ending mid-chunk and mid-device.
"""

import numpy as np
import pytest

from parasail_rs_tpu.dist import make_device_mesh
from parasail_rs_tpu.dist.seqpar_scan import (seqpar_align_scan,
                                              seqpar_scan_fits)
from parasail_rs_tpu.engine.profile import profile_rows
from parasail_rs_tpu.golden import model as golden
from parasail_rs_tpu.matrices import Matrix


def _problem():
    m = Matrix.create(b"ACGT", 2, -3)
    rng = np.random.default_rng(7)
    Qp = Rp = 256
    B = 2
    pairs = []
    prof = np.zeros((B, Qp, m.size), np.int32)
    qidx = np.full((B, Qp), -1, np.int32)
    ridx = np.zeros((B, Rp), np.int32)
    qlen = np.zeros(B, np.int32)
    rlen = np.zeros(B, np.int32)
    for b, (ql, rl) in enumerate([(230, 199), (256, 256)]):
        q = rng.choice(list(b"ACGT"), size=ql).astype("uint8").tobytes()
        r = rng.choice(list(b"ACGT"), size=rl).astype("uint8").tobytes()
        pairs.append((q, r))
        qi, ri = m.encode(q), m.encode(r)
        prof[b, :ql] = profile_rows(m, qi)
        qidx[b, :ql] = qi
        ridx[b, :rl] = ri
        qlen[b], rlen[b] = ql, rl
    return m, pairs, prof, qidx, ridx, qlen, rlen


MESH = make_device_mesh(8)
PROBLEM = _problem()


@pytest.mark.parametrize("mode,free", [
    ("sw", (True, True, True, True)),
    ("nw", (False, False, False, False)),
    ("sg", (True, True, True, True)),
    ("sg", (True, False, False, True)),
    ("sg", (False, True, True, False)),
    ("sg", (False, False, False, False)),
])
def test_seqpar_scan_vs_golden(mode, free):
    m, pairs, prof, qidx, ridx, qlen, rlen = PROBLEM
    out = seqpar_align_scan(
        prof, ridx, qlen, rlen, open_=5, ext=1, mesh=MESH,
        mode=mode, free=free, q_chunk=64)
    for b, (q, r) in enumerate(pairs):
        g = golden.align_seqs(q, r, m, 5, 1, mode,
                              free if mode == "sg" else None)
        assert int(out["score"][b]) == g.score, (mode, free, b)
        assert int(out["end_query"][b]) == g.end_query, (mode, free, b)
        assert int(out["end_ref"][b]) == g.end_ref, (mode, free, b)


@pytest.mark.parametrize("mode,free", [
    ("sw", (True, True, True, True)),
    ("nw", (False, False, False, False)),
    ("sg", (True, False, False, True)),
])
def test_seqpar_scan_stats_vs_golden(mode, free):
    m, pairs, prof, qidx, ridx, qlen, rlen = PROBLEM
    out = seqpar_align_scan(
        prof, ridx, qlen, rlen, qidx, open_=5, ext=1, mesh=MESH,
        mode=mode, free=free, q_chunk=64, outputs="stats")
    for b, (q, r) in enumerate(pairs):
        g = golden.align_seqs(q, r, m, 5, 1, mode,
                              free if mode == "sg" else None)
        assert int(out["score"][b]) == g.score, (mode, free, b)
        assert int(out["matches"][b]) == g.matches, (mode, free, b)
        assert int(out["similar"][b]) == g.similar, (mode, free, b)
        assert int(out["length"][b]) == g.length, (mode, free, b)


@pytest.mark.parametrize("mode,free", [
    ("sw", (True, True, True, True)),
    ("nw", (False, False, False, False)),
    ("sg", (True, False, False, True)),
])
def test_seqpar_scan_trace_and_cigar_vs_golden(mode, free):
    """Flag planes from the rowseg kernel's tiles, stitched across the
    mesh, must be bit-identical to the golden fill; the host walk must
    produce the same CIGARs as the single-chip path."""
    from parasail_rs_tpu.dist.seqpar import seqpar_cigars

    m, pairs, prof, qidx, ridx, qlen, rlen = PROBLEM
    out = seqpar_align_scan(
        prof, ridx, qlen, rlen, open_=5, ext=1, mesh=MESH,
        mode=mode, free=free, q_chunk=64, outputs="trace")
    trace = np.asarray(out["trace_table"])
    cigars = seqpar_cigars(out, [q for q, _ in pairs],
                           [r for _, r in pairs], mode, free)
    for b, (q, r) in enumerate(pairs):
        g = golden.align_seqs(q, r, m, 5, 1, mode,
                              free if mode == "sg" else None)
        np.testing.assert_array_equal(
            trace[b, :len(q), :len(r)], g.trace_table,
            err_msg=f"{mode} pair {b}")
        gw = golden.walk_trace(g.trace_table, q, r, g.end_query,
                               g.end_ref, mode, free)
        assert cigars[b] == gw.cigar_string(), (mode, b)


def test_seqpar_scan_matches_xla_seqpar():
    """Both sequence-parallel implementations agree on the same batch."""
    from parasail_rs_tpu.dist.seqpar import seqpar_align

    m, pairs, prof, qidx, ridx, qlen, rlen = PROBLEM
    out = seqpar_align_scan(
        prof, ridx, qlen, rlen, open_=5, ext=1, mesh=MESH,
        mode="sw", free=(True,) * 4, q_chunk=64)
    ref = seqpar_align(
        np.transpose(prof, (1, 2, 0)), np.transpose(ridx),
        qlen, rlen, open_=5, ext=1, mesh=MESH, mode="sw",
        free=(True,) * 4, q_chunk=32)
    for k in ("score", "end_query", "end_ref"):
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(ref[k]), err_msg=k)


def test_seqpar_scan_fuzz_vs_golden():
    """Randomized shapes/penalties: tiles ending at every alignment of
    chunk and device boundaries must stay bit-exact."""
    m = Matrix.create(b"ACGT", 3, -2)
    rng = np.random.default_rng(23)
    for trial in range(3):
        Qp = int(rng.choice([64, 128]))
        Rp = int(rng.choice([64, 128]))
        qc = int(rng.choice([8, 16, 32]))
        open_, ext = int(rng.integers(1, 8)), 1
        mode = ["nw", "sg", "sw"][trial % 3]
        B = 3
        prof = np.zeros((B, Qp, m.size), np.int32)
        ridx = np.zeros((B, Rp), np.int32)
        qlen = np.zeros(B, np.int32)
        rlen = np.zeros(B, np.int32)
        pairs = []
        for b in range(B):
            ql = int(rng.integers(1, Qp + 1))
            rl = int(rng.integers(1, Rp + 1))
            q = rng.choice(list(b"ACGT"), size=ql).astype("uint8").tobytes()
            r = rng.choice(list(b"ACGT"), size=rl).astype("uint8").tobytes()
            pairs.append((q, r))
            prof[b, :ql] = profile_rows(m, m.encode(q))
            ridx[b, :rl] = m.encode(r)
            qlen[b], rlen[b] = ql, rl
        out = seqpar_align_scan(
            prof, ridx, qlen, rlen, open_=open_, ext=ext, mesh=MESH,
            mode=mode, free=(False, True, True, False) if mode == "sg"
            else (False,) * 4, q_chunk=qc)
        for b, (q, r) in enumerate(pairs):
            g = golden.align_seqs(
                q, r, m, open_, ext, mode,
                (False, True, True, False) if mode == "sg" else None)
            assert int(out["score"][b]) == g.score, (trial, mode, b)
            assert int(out["end_query"][b]) == g.end_query, (trial, mode, b)
            assert int(out["end_ref"][b]) == g.end_ref, (trial, mode, b)


def test_seqpar_scan_fits_gates():
    assert seqpar_scan_fits(256, 2048, 8, "score", 4)
    assert not seqpar_scan_fits(256, 2044, 8, "score", 4)   # Rp % D
    assert not seqpar_scan_fits(256, 2048, 8, "score", 64)  # no G-select
    assert not seqpar_scan_fits(252, 2048, 8, "score", 4)   # sublane align
    assert not seqpar_scan_fits(256, 2048, 8, "table", 4)   # output class
    # trace HBM gate: per-device flag shard beyond 4GB declines
    assert seqpar_scan_fits(256, 1 << 14, 8, "trace", 4, Qp=1 << 14)
    assert not seqpar_scan_fits(256, 1 << 20, 8, "trace", 4, Qp=1 << 19)
    # gap contract: value outputs fit any penalty pair; stats need
    # strict open > ext (payload tie semantics)
    assert seqpar_scan_fits(256, 2048, 8, "score", 4,
                            gap_open=1, gap_extend=2)
    assert not seqpar_scan_fits(256, 2048, 8, "stats", 4,
                                gap_open=2, gap_extend=2)
    assert not seqpar_scan_fits(256, 2048, 8, "stats", 4,
                                gap_open=1, gap_extend=2)
    assert seqpar_scan_fits(256, 2048, 8, "score", 4,
                            gap_open=2, gap_extend=2)
    assert seqpar_scan_fits(256, 2048, 8, "stats", 4,
                            gap_open=3, gap_extend=2)


def test_seqpar_scan_rejects_bad_configs():
    m, pairs, prof, qidx, ridx, qlen, rlen = PROBLEM
    with pytest.raises(ValueError):   # stats without qidx: silent-wrong bait
        seqpar_align_scan(prof, ridx, qlen, rlen, open_=5, ext=1,
                          mesh=MESH, mode="sw", q_chunk=64,
                          outputs="stats")
    with pytest.raises(ValueError):   # stats outside the tie contract
        seqpar_align_scan(prof, ridx, qlen, rlen, qidx, open_=1, ext=2,
                          mesh=MESH, mode="sw", q_chunk=64,
                          outputs="stats")


def test_seqpar_scan_open_lt_ext_vs_golden():
    # the rowseg PM seed and down-state carries run at slope
    # min(open, ext) — exact for any penalties on value outputs
    m, pairs, prof, qidx, ridx, qlen, rlen = PROBLEM
    out = seqpar_align_scan(
        prof, ridx, qlen, rlen, open_=1, ext=2, mesh=MESH,
        mode="nw", q_chunk=64)
    for b, (q, r) in enumerate(pairs):
        g = golden.align_seqs(q, r, m, 1, 2, "nw")
        assert int(out["score"][b]) == g.score, b
        assert int(out["end_query"][b]) == g.end_query
        assert int(out["end_ref"][b]) == g.end_ref
