"""Doc-example parity: the reference's rustdoc/README examples, ported.

The reference compiles its documentation examples as tests
(README.md:25-63 via lib.rs:1; rustdoc snippets in aligner/alignment/
matrix modules); each is reproduced here through the equivalent Python
surface so every documented flow works 1:1.
"""

import numpy as np

from parasail_rs_tpu.prelude import Aligner, Matrix, Profile
from parasail_rs_tpu.golden import model as golden


def test_readme_basic_usage():
    # README.md:24-35 — one-off alignment with the default aligner
    query = b"ACGT"
    reference = b"ACGT"
    aligner = Aligner.new().build()
    result = aligner.align(query, reference)
    assert result.get_score() == 4


def test_readme_profile_reuse():
    # README.md:37-63 — profile reuse across references
    query = b"ACGT"
    ref_1 = b"ACGTAACGTACA"
    ref_2 = b"TGGCAAGGTAGA"
    query_profile = Profile.new(query, True, Matrix.default())
    aligner = Aligner.new().profile(query_profile).build()
    result_1 = aligner.align(None, ref_1)
    result_2 = aligner.align(None, ref_2)
    g1 = golden.align_seqs(query, ref_1, Matrix.default(), 0, 0, "nw")
    g2 = golden.align_seqs(query, ref_2, Matrix.default(), 0, 0, "nw")
    assert result_1.get_score() == g1.score
    assert result_2.get_score() == g2.score


def test_aligner_doc_allow_gaps_example():
    # aligner/mod.rs:165-186 rustdoc — allow_query_gaps with "prefix"
    aligner = Aligner.new().allow_query_gaps(["prefix"]).build()
    assert aligner is not None


def test_table_doc_example():
    # alignment/mod.rs:106-122 rustdoc — score-table access pattern
    query = reference = b"ACGT"
    aligner = Aligner.new().use_table().build()
    result = aligner.align(query, reference)
    table = result.get_score_table()
    assert table.get(0, 0) is not None
    assert table.last() == 4


def test_matrix_doc_examples():
    # matrix/mod.rs:52-56, 174-179, 215-221 rustdoc snippets
    matrix = Matrix.create(b"ACGT", 3, -2)
    matrix.set_value(2, 2, 100)
    assert int(matrix.data[2, 2]) == 100

    blosum62 = Matrix.from_name("blosum62")
    pssm = blosum62.to_pssm(b"ACGT")
    assert pssm.length == 4

    values = [1, 2, 3, 4, 5, 6, 7, 8]
    m = Matrix.create_pssm("abcdef", values, 2)
    assert m.length == 2 and m.size == 6
