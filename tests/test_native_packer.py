"""Native batch packer (native/ptpack.cc + packer.py).

The C fast path must be byte-identical to the numpy join+scatter
fallback across input types, honor the InteriorNulByte contract, and
decline (not corrupt) anything it cannot serve.
"""

import numpy as np
import pytest

from parasail_rs_tpu.engine import dispatch
from parasail_rs_tpu.errors import InteriorNulByte
from parasail_rs_tpu.matrices import Matrix
from parasail_rs_tpu.native import packer
from parasail_rs_tpu.utils.shapes import length_bucket


@pytest.fixture
def seqs():
    rng = np.random.default_rng(11)
    alpha = np.frombuffer(b"ACGT", np.uint8)
    return [rng.choice(alpha, size=int(l)).tobytes()
            for l in rng.integers(1, 40, 64)]


def test_available_and_roundtrip(seqs):
    if not packer.available():
        pytest.skip("no compiler in this environment")
    out, lens, P = packer.pack_side(seqs, None, length_bucket)
    assert P == length_bucket(max(len(s) for s in seqs))
    assert out.shape == (len(seqs), P)
    for b, s in enumerate(seqs):
        assert lens[b] == len(s)
        assert out[b, :len(s)].tobytes() == s
        assert not out[b, len(s):].any()


def test_matches_numpy_fallback(seqs, monkeypatch):
    if not packer.available():
        pytest.skip("no compiler in this environment")
    m = Matrix.create(b"ACGT", 2, -3)
    b1, ql1, rl1 = dispatch.pack_pairs(m, seqs, seqs[::-1])
    monkeypatch.setattr(packer, "_lib", None)
    monkeypatch.setattr(packer, "_tried", True)
    b2, ql2, rl2 = dispatch.pack_pairs(m, seqs, seqs[::-1])
    assert ql1 == ql2 and rl1 == rl2
    np.testing.assert_array_equal(b1.qbytes, b2.qbytes)
    np.testing.assert_array_equal(b1.rbytes, b2.rbytes)
    np.testing.assert_array_equal(b1.qlen, b2.qlen)
    np.testing.assert_array_equal(b1.rlen, b2.rlen)


def test_nul_byte_raises(seqs):
    m = Matrix.create(b"ACGT", 2, -3)
    with pytest.raises(InteriorNulByte):
        dispatch.pack_pairs(m, [b"AC\x00GT"], [b"ACGT"])
    with pytest.raises(InteriorNulByte):
        dispatch.pack_pairs(m, [b"ACGT"], [b"AC\x00GT"])


def test_mixed_input_types(seqs):
    # str and bytearray items take the normalize-then-retry path and
    # must produce the same tensors as pure bytes
    m = Matrix.create(b"ACGT", 2, -3)
    mixed = [seqs[0].decode(), bytearray(seqs[1])] + seqs[2:]
    b1, ql1, _ = dispatch.pack_pairs(m, mixed, seqs)
    b2, ql2, _ = dispatch.pack_pairs(m, seqs, seqs)
    assert ql1 == ql2
    np.testing.assert_array_equal(b1.qbytes, b2.qbytes)


def test_declines_overlong_rows(seqs):
    # an explicit P smaller than a row cannot be served by the fast path
    res = packer.pack_side([b"ACGTACGT"], 4, length_bucket)
    assert res is None


def test_explicit_width(seqs):
    if not packer.available():
        pytest.skip("no compiler in this environment")
    out, lens, P = packer.pack_side(seqs, 64, length_bucket)
    assert P == 64 and out.shape[1] == 64


def test_empty_batch():
    out, lens, P = (packer.pack_side([], None, length_bucket)
                    or (np.zeros((0, 1), np.uint8), np.zeros(0, np.int32),
                        length_bucket(1)))
    assert out.shape[0] == 0 and P == length_bucket(1)
