"""Matrix engine tests.

Mirrors the reference's matrix coverage (tests/test_parasail.rs:4-34) plus
parser/PSSM/mutation edge cases.
"""

import numpy as np
import pytest

from parasail_rs_tpu import Matrix, errors
from parasail_rs_tpu.matrices import BLOSUM_NUMBERS, PAM_NUMBERS


def test_matrix_construction(fixtures_dir):
    # mirrors tests/test_parasail.rs:4-34
    Matrix.default()

    matrix = Matrix.create(b"ACGT", 3, -2)
    str(matrix)
    matrix.set_value(2, 2, 100)
    assert matrix.data[2, 2] == 100

    blosum62 = Matrix.from_name("blosum62")
    blosum62.to_pssm(b"ACGT")

    Matrix.from_file(f"{fixtures_dir}/square.txt")
    Matrix.from_file(f"{fixtures_dir}/pssm.txt")

    # reference passes 8 values for a 2x6 PSSM; parasail doesn't validate
    Matrix.create_pssm("abcdef", [1, 2, 3, 4, 5, 6, 7, 8], 2)


def test_default_matrix_shape_and_semantics():
    m = Matrix.default()
    # reference default is create(b"ACGTA", 1, -1): 6x6 with wildcard row/col
    assert (m.length, m.size) == (6, 6)
    # duplicate 'A': later mapper entry wins (index 4), scores still behave
    a, c = m.encode(b"A")[0], m.encode(b"C")[0]
    assert m.data[a, a] == 1 and m.data[a, c] == -1
    # out-of-alphabet char maps to the wildcard bucket (score 0)
    n = m.encode(b"N")[0]
    assert m.data[a, n] == 0


def test_create_validation():
    with pytest.raises(errors.MatrixError):
        Matrix.create(b"ACGT", -1, -1)
    with pytest.raises(errors.MatrixError):
        Matrix.create(b"ACGT", 1, 1)
    with pytest.raises(errors.MatrixError):
        Matrix.create(b"", 1, -1)
    with pytest.raises(errors.InteriorNulByte):
        Matrix.create(b"AC\x00GT", 1, -1)


def test_builtin_lookup_full_name_space():
    for n in BLOSUM_NUMBERS:
        m = Matrix.from_name(f"blosum{n}")
        assert (m.length, m.size) == (24, 24)
        assert np.array_equal(m.data, m.data.T) or n not in (45, 50, 62, 80, 90)
    for n in (10, 120, 250, 500):
        m = Matrix.from_name(f"pam{n}")
        assert (m.length, m.size) == (24, 24)
    assert len(PAM_NUMBERS) == 50
    with pytest.raises(errors.FailedLookup):
        Matrix.from_name("blosum63")
    with pytest.raises(errors.FailedLookup):
        Matrix.from_name("nosuchmatrix")
    with pytest.raises(errors.MatrixError):
        Matrix.from_name("")


def test_blosum62_spot_values():
    m = Matrix.from_name("blosum62")
    al = m.alphabet.decode()

    def s(a, b):
        return int(m.data[al.index(a), al.index(b)])

    assert s("A", "A") == 4
    assert s("W", "W") == 11
    assert s("E", "E") == 5
    assert s("A", "W") == -3
    assert s("R", "K") == 2
    assert s("N", "B") == 3
    assert s("*", "A") == -4
    assert s("*", "*") == 1
    # symmetry
    assert np.array_equal(m.data, m.data.T)


def test_builtin_immutable():
    m = Matrix.from_name("blosum62")
    with pytest.raises(errors.NotBuiltIn):
        m.set_value(0, 0, 5)
    # clones are mutable and never builtin (src/matrix/mod.rs:279-294)
    c = m.copy()
    assert not c.builtin
    c.set_value(0, 0, 5)
    assert c.data[0, 0] == 5 and m.data[0, 0] == 4


def test_set_value_bounds():
    m = Matrix.create(b"ACGT", 1, -1)
    m.set_value(0, 0, 7)
    m.set_value(3, 3, -9)  # size-2 == 3 is the last legal index
    with pytest.raises(errors.InvalidIndex):
        m.set_value(4, 0, 1)
    with pytest.raises(errors.InvalidIndex):
        m.set_value(0, -1, 1)


def test_from_file_square(fixtures_dir):
    m = Matrix.from_file(f"{fixtures_dir}/square.txt")
    assert m.kind == "square"
    assert (m.length, m.size) == (17, 17)
    al = m.alphabet.decode()
    assert al == "ATGCSWRYKMBVHDNU*"
    assert m.data[0, 0] == 5
    assert m.data[al.index("*"), 0] == -5
    # out-of-alphabet maps to wildcard index
    assert m.encode(b"Z")[0] == 16


def test_from_file_pssm(fixtures_dir):
    m = Matrix.from_file(f"{fixtures_dir}/pssm.txt")
    assert m.kind == "pssm"
    assert (m.length, m.size) == (10, 20)
    assert m.query == b"YSCDGCLKPI"
    assert m.data[0, 0] == -5


def test_from_file_missing():
    with pytest.raises(errors.FileNotFound):
        Matrix.from_file("/nonexistent/matrix.txt")


def test_to_pssm():
    m = Matrix.create(b"ACGT", 2, -1)
    p = m.to_pssm(b"AAGT")
    assert p.kind == "pssm"
    assert p.length == 4
    assert list(p.data[0]) == [2, -1, -1, -1, 0]
    assert list(p.data[2]) == [-1, -1, 2, -1, 0]
    with pytest.raises(errors.NotSquare):
        p.to_pssm(b"AC")


def test_display_matches_reference_format():
    m = Matrix.create(b"AC", 1, -1)
    # reference Display prints `value ` cells, newline per row
    # (src/matrix/mod.rs:253-268)
    assert str(m) == "1 -1 0 \n-1 1 0 \n0 0 0 \n"


def test_scores_for_square_and_pssm():
    m = Matrix.create(b"ACGT", 2, -1)
    q = m.encode(b"AC")
    r = m.encode(b"ACG")
    s = m.scores_for(q, r)
    assert s.shape == (2, 3)
    assert s[0, 0] == 2 and s[0, 1] == -1

    p = m.to_pssm(b"AC")
    sp = p.scores_for(p.mapper[np.frombuffer(b"AC", dtype=np.uint8)], r)
    assert np.array_equal(sp, s)


def test_alignment_with_fixture_matrices(fixtures_dir):
    # the mandated golden inputs (reference tests/square.txt, pssm.txt)
    # driving actual alignments, checked against the golden oracle
    import os

    from parasail_rs_tpu.engine import Aligner
    from parasail_rs_tpu.golden import model as golden

    sq = Matrix.from_file(os.path.join(fixtures_dir, "square.txt"))
    aligner = (Aligner.new().matrix(sq).gap_open(3).gap_extend(1)
               .local().use_stats().build())
    q, r = b"ACGTRYKM", b"ACGTTRYKM"
    res = aligner.align(q, r)
    g = golden.align_seqs(q, r, sq, 3, 1, "sw")
    assert res.get_score() == g.score
    assert res.get_matches() == g.matches

    pssm = Matrix.from_file(os.path.join(fixtures_dir, "pssm.txt"))
    aligner = Aligner.new().matrix(pssm).gap_open(2).gap_extend(1).build()
    q = b"A" * pssm.length
    r = b"ACGTACGTAC"[:pssm.length]
    res = aligner.align(q, r)
    g = golden.align_seqs(q, r, pssm, 2, 1, "nw")
    assert res.get_score() == g.score
