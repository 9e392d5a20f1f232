"""Golden-model tests: the oracle must reproduce the reference's
integration-test arithmetic (tests/test_parasail.rs) before any kernel is
held to it.
"""

import numpy as np
import pytest

from parasail_rs_tpu import Matrix
from parasail_rs_tpu.golden import align_seqs, aligned_strings, free_flags, walk_trace
from parasail_rs_tpu.constants import TraceFlags, TRACE_H_BITS


IDENT = Matrix.default()


@pytest.mark.parametrize("mode", ["nw", "sg", "sw"])
def test_perfect_match(mode):
    # tests/test_parasail.rs:64-122
    r = align_seqs(b"ACGT", b"ACGT", IDENT, 0, 0, mode)
    assert r.score == 4
    assert r.end_query == 3 and r.end_ref == 3


@pytest.mark.parametrize("mode", ["nw", "sg", "sw"])
def test_stats_perfect_match(mode):
    # tests/test_parasail.rs:125-173
    r = align_seqs(b"ACGT", b"ACGT", IDENT, 0, 0, mode)
    assert r.matches == 4
    assert r.length == 4


def test_one_mismatch_score():
    # tests/test_parasail.rs:176-253 (identical across widths)
    r = align_seqs(b"ACTGACTGACTG", b"ACTGTCTGACTG", IDENT, 0, 0, "nw")
    assert r.score == 11
    assert r.end_query == 11 and r.end_ref == 11


def test_score_table():
    # tests/test_parasail.rs:256-325
    r = align_seqs(b"ACGT", b"ACGT", IDENT, 0, 0, "nw")
    t = r.score_table
    assert t.shape == (4, 4)
    assert t[-1, -1] == 4
    m3 = Matrix.create(b"ACGT", 3, -2)
    r = align_seqs(b"ACGT", b"ACGT", m3, 0, 0, "nw")
    assert r.score_table[-1, -1] == 12


def test_matches_table():
    # tests/test_parasail.rs:327-345
    r = align_seqs(b"ACGT", b"ACGTT", IDENT, 0, 0, "nw")
    t = r.matches_table
    assert t.shape == (4, 5)
    assert t[-1, -1] == 4


def test_length_table_shape():
    r = align_seqs(b"ACGT", b"ACGTTT", IDENT, 0, 0, "nw")
    assert r.length_table.shape == (4, 6)


def test_rowcol_rows():
    # tests/test_parasail.rs:385-463
    r = align_seqs(b"ACGT", b"ACG", IDENT, 0, 0, "nw")
    assert list(r.score_row) == [1, 2, 3]
    assert list(r.matches_row) == [1, 2, 3]
    assert list(r.similar_row) == [1, 2, 3]
    assert list(r.length_row) == [4, 4, 4]


def test_rowcol_cols():
    # tests/test_parasail.rs:465-543
    r = align_seqs(b"ACG", b"ACGT", IDENT, 0, 0, "nw")
    assert list(r.score_col) == [1, 2, 3]
    assert list(r.matches_col) == [1, 2, 3]
    assert list(r.similar_col) == [1, 2, 3]
    assert list(r.length_col) == [4, 4, 4]


def test_trace_table_flags():
    # tests/test_parasail.rs:545-578: every cell holds valid flags
    r = align_seqs(b"ACGT", b"ACGT", IDENT, 0, 0, "nw")
    t = r.trace_table
    assert t.shape == (4, 4)
    for i in range(4):
        for j in range(4):
            flags = TraceFlags(int(t[i, j]) & TRACE_H_BITS)
            assert flags in (
                TraceFlags.ZERO, TraceFlags.INS, TraceFlags.DEL, TraceFlags.DIAG,
            ) or flags
    # diagonal cells of a perfect match trace DIAG
    for i in range(4):
        assert t[i, i] & TraceFlags.DIAG


def test_traceback_strings_and_cigar():
    # tests/test_parasail.rs:580-616
    r = align_seqs(b"ACGT", b"ACGT", IDENT, 0, 0, "nw")
    w = walk_trace(r.trace_table, b"ACGT", b"ACGT", r.end_query, r.end_ref, "nw")
    assert w.cigar_string() == "4="
    q, comp, ref = aligned_strings(w, b"ACGT", b"ACGT")
    assert (q, comp, ref) == ("ACGT", "||||", "ACGT")


def test_gap_cigar():
    r = align_seqs(b"ACGT", b"ACT", IDENT, 1, 1, "nw")
    w = walk_trace(r.trace_table, b"ACGT", b"ACT", r.end_query, r.end_ref, "nw")
    assert r.score == 2
    assert w.cigar_string() == "2=1I1="
    q, comp, ref = aligned_strings(w, b"ACGT", b"ACT")
    assert q == "ACGT" and ref == "AC-T"


def test_deletion_cigar():
    r = align_seqs(b"ACT", b"ACGT", IDENT, 1, 1, "nw")
    w = walk_trace(r.trace_table, b"ACT", b"ACGT", r.end_query, r.end_ref, "nw")
    assert w.cigar_string() == "2=1D1="


def test_affine_gap_cost_model():
    # gap of length L costs open + (L-1)*ext (src/aligner/mod.rs:140-149)
    r = align_seqs(b"AATTTTAA", b"AAAA", IDENT, 3, 1, "nw")
    # 4 matches, one 4-gap: 4 - (3 + 3*1) = -2
    assert r.score == -2


def test_local_alignment_motif():
    m = Matrix.create(b"ACGT", 2, -3)
    r = align_seqs(b"TTTACGTTT", b"GGGACGGGG", m, 5, 2, "sw")
    assert r.score == 6
    assert (r.end_query, r.end_ref) == (5, 5)
    w = walk_trace(r.trace_table, b"TTTACGTTT", b"GGGACGGGG", r.end_query, r.end_ref, "sw")
    assert w.cigar_string() == "3="
    assert (w.beg_query, w.beg_ref) == (3, 3)


def test_local_tables_clamped():
    m = Matrix.create(b"ACGT", 2, -3)
    r = align_seqs(b"AC", b"GT", m, 5, 2, "sw")
    assert r.score == 0
    assert (r.score_table >= 0).all()


def test_semi_global_contained_query():
    r = align_seqs(b"ACGT", b"TTACGTTT", IDENT, 2, 1, "sg")
    assert r.score == 4
    assert (r.end_query, r.end_ref) == (3, 5)


def test_semi_global_variant_grammar():
    # default sg == all free (sg_qx_dx normalisation, aligner/mod.rs:296-298)
    assert free_flags("sg") == (True, True, True, True)
    assert free_flags("sg", ["prefix"], []) == (True, False, False, False)
    assert free_flags("sg", ["suffix"], []) == (False, True, False, False)
    assert free_flags("sg", ["prefix", "suffix"], []) == (True, True, False, False)
    assert free_flags("sg", [], ["prefix"]) == (False, False, True, False)
    assert free_flags("sg", ["prefix"], ["suffix"]) == (True, False, False, True)


def test_semi_global_variants_differ():
    q, ref = b"ACGTAA", b"ACGT"
    # query suffix overhang: free only when de (ref-gaps suffix) is free
    r_free = align_seqs(q, ref, IDENT, 2, 1, "sg", free=(False, False, False, True))
    r_pen = align_seqs(q, ref, IDENT, 2, 1, "sg", free=(False, False, False, False))
    assert r_free.score == 4
    assert r_pen.score == 4 - 3  # open+ext for the 2-gap
    # the same overhang is NOT helped by qe freedom
    r_qe = align_seqs(q, ref, IDENT, 2, 1, "sg", free=(False, True, False, False))
    assert r_qe.score == r_pen.score


def test_semi_global_prefix_freedom():
    q, ref = b"AACGT", b"CGT"
    # query prefix overhang needs db free (gaps at ref begin)
    r_db = align_seqs(q, ref, IDENT, 2, 1, "sg", free=(False, False, True, False))
    assert r_db.score == 3
    r_none = align_seqs(q, ref, IDENT, 2, 1, "sg", free=(False, False, False, False))
    assert r_none.score == 3 - 3


def test_sg_traceback_excludes_free_overhang():
    r = align_seqs(b"ACGT", b"TTACGTTT", IDENT, 2, 1, "sg")
    w = walk_trace(r.trace_table, b"ACGT", b"TTACGTTT", r.end_query, r.end_ref, "sg")
    assert w.cigar_string() == "4="
    assert (w.beg_query, w.beg_ref) == (0, 2)


def test_similar_counts_positive_substitutions():
    # A vs A scores +1 (match+similar); out-of-alphabet N vs N scores 0
    # (similar requires score > 0)
    r = align_seqs(b"AN", b"AN", IDENT, 0, 0, "nw")
    assert r.matches == 2       # chars equal
    assert r.similar == 1       # only the A:A pair scores > 0
    assert r.score == 1


def test_pssm_alignment():
    m = Matrix.create(b"ACGT", 2, -1).to_pssm(b"ACGT")
    r = align_seqs(b"ACGT", b"ACGT", m, 0, 0, "nw")
    assert r.score == 8
