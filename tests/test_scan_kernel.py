"""Pallas prefix-scan score kernel: bit-exactness vs the XLA wavefront path.

The wavefront path is itself verified against the golden scalar oracle
(tests/test_wavefront.py), so equality here closes the chain
golden == XLA == Pallas.  Runs the kernel in interpreter mode on the CPU
backend; the compiled TPU path is exercised by bench.py and the
TPU-backend test run (PT_TEST_BACKEND=tpu).
"""

import os

import jax
import numpy as np
import pytest

from parasail_rs_tpu.engine.dispatch import build_batch
from parasail_rs_tpu.engine.profile import profile_rows
from parasail_rs_tpu.matrices import Matrix
from parasail_rs_tpu.ops.scan_kernel import scan_score_align
from parasail_rs_tpu.ops.wavefront import wavefront_align


def _random_batch(seed=0, n=128, maxlen=28):
    rng = np.random.default_rng(seed)
    m = Matrix.from_name("blosum62")
    alpha = list(b"ARNDCQEGHILKMFPSTWYV")
    prows, qidxs, ridxs = [], [], []
    for _ in range(n):
        q = rng.choice(alpha, size=rng.integers(1, maxlen)).astype("uint8").tobytes()
        r = rng.choice(alpha, size=rng.integers(1, maxlen)).astype("uint8").tobytes()
        qi, ri = m.encode(q), m.encode(r)
        qidxs.append(qi)
        ridxs.append(ri)
        prows.append(profile_rows(m, qi))
    return build_batch(prows, qidxs, ridxs)


BATCH = _random_batch()
# interpret-mode Pallas is only supported on the CPU backend (the axon
# TPU plugin mis-executes interpreted kernels); on TPU run compiled.
INTERPRET = jax.default_backend() != "tpu"

CONFIGS = [
    ("sw", (True, True, True, True)),
    ("nw", (False, False, False, False)),
    ("sg", (True, True, True, True)),
    ("sg", (True, False, False, True)),
    ("sg", (False, True, True, False)),
    ("sg", (False, False, False, False)),
]


@pytest.mark.parametrize("mode,free", CONFIGS)
def test_scan_matches_wavefront(mode, free):
    b = BATCH
    ref = wavefront_align(
        b.profile, b.qidx, b.ridx, b.qlen, b.rlen,
        open_=np.int32(11), ext=np.int32(1), mode=mode, free=free,
        outputs="score", width="sat")
    got = scan_score_align(
        b.profile, b.ridx, b.qlen, b.rlen,
        open_=np.int32(11), ext=np.int32(1), mode=mode, free=free,
        width="sat", interpret=INTERPRET)
    for k in ("score", "end_query", "end_ref", "saturated", "promoted"):
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(ref[k]), err_msg=f"{mode}/{free}/{k}")


def test_scan_saturation_flags():
    # scores > 127 must flip the 8-bit flag but not the 16-bit one
    m = Matrix.create(b"ACGT", 10, -1)
    qi = m.encode(b"ACGT" * 8)       # 32 matches * 10 = 320
    batch = build_batch([profile_rows(m, qi)] * 128, [qi] * 128, [qi] * 128)
    got = scan_score_align(
        batch.profile, batch.ridx, batch.qlen, batch.rlen,
        open_=np.int32(5), ext=np.int32(1), mode="sw", free=(True,) * 4,
        width="sat", interpret=INTERPRET)
    assert np.asarray(got["score"])[0] == 320
    assert np.asarray(got["promoted"]).all()
    assert not np.asarray(got["saturated"]).any()


def test_engine_pallas_route(monkeypatch):
    # The engine routes score-only work through the Pallas kernel when
    # forced (PT_FORCE_PALLAS=1 -> interpreted on CPU); results must be
    # identical to the default XLA route.
    from parasail_rs_tpu.engine import Aligner

    m = Matrix.from_name("blosum62")
    aligner = (Aligner.new().matrix(m).gap_open(11).gap_extend(1).local()
               .build())
    qs = [b"MKVLAT", b"HEAGAWGHEE", b"PAWHEAE"]
    rs = [b"MKVInnnLAT", b"PAWHEAE", b"HEAGAWGHEE"]
    base = [a.get_score() for a in aligner.align_batch(qs, rs)]
    monkeypatch.setenv("PT_FORCE_PALLAS", "1")
    via_pallas = aligner.align_batch(qs, rs)
    assert [a.get_score() for a in via_pallas] == base


@pytest.mark.parametrize("mode,free", [
    ("sw", (True, True, True, True)),
    ("nw", (False, False, False, False)),
    ("sg", (True, False, True, False)),
])
def test_scan_trace_matches_wavefront(mode, free):
    b = BATCH
    ref = wavefront_align(
        b.profile, b.qidx, b.ridx, b.qlen, b.rlen,
        open_=np.int32(11), ext=np.int32(1), mode=mode, free=free,
        outputs="trace", width="32")
    got = scan_score_align(
        b.profile, b.ridx, b.qlen, b.rlen,
        open_=np.int32(11), ext=np.int32(1), mode=mode, free=free,
        width="32", outputs="trace", interpret=INTERPRET)
    gt, rt = np.asarray(got["trace_table"]), np.asarray(ref["trace_table"])
    for i in range(b.size):
        ql, rl = int(b.qlen[i]), int(b.rlen[i])
        np.testing.assert_array_equal(
            gt[i, :ql, :rl], rt[i, :ql, :rl], err_msg=f"{mode}/{free}/{i}")


def test_engine_pallas_trace_route(monkeypatch):
    # Forced Pallas route must produce identical CIGARs to the XLA route.
    from parasail_rs_tpu.engine import Aligner

    m = Matrix.from_name("blosum62")
    aligner = (Aligner.new().matrix(m).gap_open(11).gap_extend(1).local()
               .use_trace().build())
    qs = [b"MKVLAT", b"HEAGAWGHEE", b"PAWHEAE"]
    rs = [b"MKVInnnLAT", b"PAWHEAE", b"HEAGAWGHEE"]
    base = [a.get_cigar(q, r)
            for a, q, r in zip(aligner.align_batch(qs, rs), qs, rs)]
    monkeypatch.setenv("PT_FORCE_PALLAS", "1")
    via = [a.get_cigar(q, r)
           for a, q, r in zip(aligner.align_batch(qs, rs), qs, rs)]
    assert via == base


@pytest.mark.parametrize("mode,free", [
    ("sw", (True, True, True, True)),
    ("nw", (False, False, False, False)),
    ("sg", (True, False, True, False)),
    ("sg", (False, True, False, True)),
])
def test_scan_stats_matches_wavefront(mode, free):
    b = BATCH
    ref = wavefront_align(
        b.profile, b.qidx, b.ridx, b.qlen, b.rlen,
        open_=np.int32(11), ext=np.int32(1), mode=mode, free=free,
        outputs="stats", width="sat")
    got = scan_score_align(
        b.profile, b.ridx, b.qlen, b.rlen, b.qidx,
        open_=np.int32(11), ext=np.int32(1), mode=mode, free=free,
        width="sat", outputs="stats", interpret=INTERPRET)
    for k in ("score", "end_query", "end_ref", "matches", "similar",
              "length", "saturated"):
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(ref[k]), err_msg=f"{mode}/{free}/{k}")


def test_engine_pallas_stats_route(monkeypatch):
    from parasail_rs_tpu.engine import Aligner

    m = Matrix.from_name("blosum62")
    aligner = (Aligner.new().matrix(m).gap_open(11).gap_extend(1).local()
               .use_stats().build())
    qs = [b"MKVLAT", b"HEAGAWGHEE", b"PAWHEAE"]
    rs = [b"MKVInnnLAT", b"PAWHEAE", b"HEAGAWGHEE"]
    base = [(a.get_score(), a.get_matches(), a.get_similar(), a.get_length())
            for a in aligner.align_batch(qs, rs)]
    monkeypatch.setenv("PT_FORCE_PALLAS", "1")
    via = [(a.get_score(), a.get_matches(), a.get_similar(), a.get_length())
           for a in aligner.align_batch(qs, rs)]
    assert via == base


@pytest.mark.parametrize("outputs", ["table", "stats_table", "rowcol",
                                     "stats_rowcol"])
@pytest.mark.parametrize("mode,free", [
    ("sw", (True, True, True, True)),
    ("nw", (False, False, False, False)),
    ("sg", (True, False, False, True)),
])
def test_scan_table_rowcol_matches_wavefront(outputs, mode, free):
    b = BATCH
    ref = wavefront_align(
        b.profile, b.qidx, b.ridx, b.qlen, b.rlen,
        open_=np.int32(11), ext=np.int32(1), mode=mode, free=free,
        outputs=outputs, width="sat")
    got = scan_score_align(
        b.profile, b.ridx, b.qlen, b.rlen, b.qidx,
        open_=np.int32(11), ext=np.int32(1), mode=mode, free=free,
        width="sat", outputs=outputs, interpret=INTERPRET)
    for k in ref:
        gv, rv = np.asarray(got[k]), np.asarray(ref[k])
        for i in range(b.size):
            ql, rl = int(b.qlen[i]), int(b.rlen[i])
            if k.endswith("_table"):
                np.testing.assert_array_equal(
                    gv[i, :ql, :rl], rv[i, :ql, :rl],
                    err_msg=f"{outputs}/{mode}/{k}/{i}")
            elif k.endswith("_row"):
                np.testing.assert_array_equal(
                    gv[i, :rl], rv[i, :rl], err_msg=f"{outputs}/{mode}/{k}/{i}")
            elif k.endswith("_col"):
                np.testing.assert_array_equal(
                    gv[i, :ql], rv[i, :ql], err_msg=f"{outputs}/{mode}/{k}/{i}")
            else:
                np.testing.assert_array_equal(
                    gv[i], rv[i], err_msg=f"{outputs}/{mode}/{k}/{i}")


def test_scan_chunked_query_vs_golden():
    # Qp=3072 > chunk threshold -> 3 query chunks with cross-chunk
    # down-state (dH/dPM/dE); score and trace must stay golden-exact.
    from parasail_rs_tpu.golden import model as golden
    from parasail_rs_tpu.ops.scan_kernel import scan_fits

    for outputs in ("score", "trace", "stats", "rowcol", "stats_rowcol"):
        assert scan_fits(3072, 96, outputs), outputs
    m = Matrix.create(b"ACGT", 2, -3)
    rng = np.random.default_rng(17)
    pairs, prows, qidxs, ridxs = [], [], [], []
    for ql, rl in [(3000, 90), (2500, 60), (3072, 96), (1, 1)] + [(64, 64)] * 124:
        q = rng.choice(list(b"ACGT"), size=ql).astype("uint8").tobytes()
        r = rng.choice(list(b"ACGT"), size=rl).astype("uint8").tobytes()
        pairs.append((q, r))
        qi, ri = m.encode(q), m.encode(r)
        qidxs.append(qi)
        ridxs.append(ri)
        prows.append(profile_rows(m, qi))
    b = build_batch(prows, qidxs, ridxs, Qp=3072, Rp=96)
    out = scan_score_align(
        b.profile, b.ridx, b.qlen, b.rlen,
        open_=np.int32(5), ext=np.int32(1), mode="sw", free=(True,) * 4,
        width="sat", outputs="trace", interpret=INTERPRET)
    for i in (0, 1, 2, 3):
        q, r = pairs[i]
        g = golden.align_seqs(q, r, m, 5, 1, "sw")
        assert int(out["score"][i]) == g.score
        assert int(out["end_query"][i]) == g.end_query
        tt = np.asarray(out["trace_table"])[i, :len(q), :len(r)]
        np.testing.assert_array_equal(tt, g.trace_table, err_msg=str(i))


def test_scan_banded_matches_wavefront():
    b = BATCH
    for bw in (2, 7, 50):
        ref = wavefront_align(
            b.profile, b.qidx, b.ridx, b.qlen, b.rlen,
            open_=np.int32(5), ext=np.int32(1), mode="nw",
            free=(False,) * 4, outputs="score", width="32",
            banded=True, bandwidth=np.int32(bw))
        got = scan_score_align(
            b.profile, b.ridx, b.qlen, b.rlen,
            open_=np.int32(5), ext=np.int32(1), mode="nw",
            free=(False,) * 4, width="32",
            banded=True, bandwidth=np.int32(bw), interpret=INTERPRET)
        np.testing.assert_array_equal(
            np.asarray(got["score"]), np.asarray(ref["score"]),
            err_msg=f"bw={bw}")


def test_engine_banded_pallas_route(monkeypatch):
    rng = np.random.default_rng(23)
    from parasail_rs_tpu.engine import Aligner

    m = Matrix.create(b"ACGT", 2, -3)
    qs = [rng.choice(list(b"ACGT"), size=20).astype("uint8").tobytes()
          for _ in range(4)]
    rs = [rng.choice(list(b"ACGT"), size=22).astype("uint8").tobytes()
          for _ in range(4)]
    aligner = (Aligner.new().matrix(m).gap_open(4).gap_extend(1)
               .bandwidth(6).build())
    base = [a.get_score() for a in aligner.banded_nw_batch(qs, rs)]
    monkeypatch.setenv("PT_FORCE_PALLAS", "1")
    via = [a.get_score() for a in aligner.banded_nw_batch(qs, rs)]
    assert via == base


def test_scan_chunked_stats_vs_golden():
    # stats across query-chunk boundaries: dHm/dHs/dHl diag carries and
    # dPM payload planes must reproduce golden accumulators exactly
    from parasail_rs_tpu.golden import model as golden

    m = Matrix.create(b"ACGT", 2, -3)
    rng = np.random.default_rng(19)
    pairs, prows, qidxs, ridxs = [], [], [], []
    for ql, rl in [(3000, 90), (2600, 40), (3072, 96), (5, 5)] + [(40, 40)] * 124:
        q = rng.choice(list(b"ACGT"), size=ql).astype("uint8").tobytes()
        r = rng.choice(list(b"ACGT"), size=rl).astype("uint8").tobytes()
        pairs.append((q, r))
        qi, ri = m.encode(q), m.encode(r)
        qidxs.append(qi)
        ridxs.append(ri)
        prows.append(profile_rows(m, qi))
    b = build_batch(prows, qidxs, ridxs, Qp=3072, Rp=96)
    for mode, free in [("sw", (True,) * 4), ("nw", (False,) * 4),
                       ("sg", (True, False, False, True))]:
        out = scan_score_align(
            b.profile, b.ridx, b.qlen, b.rlen, b.qidx,
            open_=np.int32(5), ext=np.int32(1), mode=mode, free=free,
            width="sat", outputs="stats", interpret=INTERPRET)
        for i in (0, 1, 2, 3):
            q, r = pairs[i]
            g = golden.align_seqs(q, r, m, 5, 1, mode,
                                  free if mode == "sg" else None)
            got = (int(out["score"][i]), int(out["matches"][i]),
                   int(out["similar"][i]), int(out["length"][i]))
            want = (g.score, g.matches, g.similar, g.length)
            assert got == want, (mode, i, got, want)


@pytest.mark.parametrize("outputs", ["rowcol", "stats_rowcol"])
def test_scan_chunked_rowcol_vs_wavefront(outputs):
    # last-row/col outputs across query chunks: per-chunk col slices and
    # chunk-axis-summed row planes must match the wavefront path exactly
    m = Matrix.create(b"ACGT", 2, -3)
    rng = np.random.default_rng(29)
    prows, qidxs, ridxs = [], [], []
    for ql, rl in [(3000, 90), (2600, 40), (3072, 96), (5, 5)] + [(40, 40)] * 124:
        q = rng.choice(list(b"ACGT"), size=ql).astype("uint8").tobytes()
        r = rng.choice(list(b"ACGT"), size=rl).astype("uint8").tobytes()
        qi, ri = m.encode(q), m.encode(r)
        qidxs.append(qi)
        ridxs.append(ri)
        prows.append(profile_rows(m, qi))
    b = build_batch(prows, qidxs, ridxs, Qp=3072, Rp=96)
    ref = wavefront_align(
        b.profile, b.qidx, b.ridx, b.qlen, b.rlen,
        open_=np.int32(5), ext=np.int32(1), mode="sw", free=(True,) * 4,
        outputs=outputs, width="sat")
    got = scan_score_align(
        b.profile, b.ridx, b.qlen, b.rlen, b.qidx,
        open_=np.int32(5), ext=np.int32(1), mode="sw", free=(True,) * 4,
        width="sat", outputs=outputs, interpret=INTERPRET)
    for k in ref:
        gv, rv = np.asarray(got[k]), np.asarray(ref[k])
        for i in (0, 1, 2, 3):
            ql, rl = int(b.qlen[i]), int(b.rlen[i])
            if k.endswith("_row"):
                np.testing.assert_array_equal(gv[i, :rl], rv[i, :rl],
                                              err_msg=f"{k}/{i}")
            elif k.endswith("_col"):
                np.testing.assert_array_equal(gv[i, :ql], rv[i, :ql],
                                              err_msg=f"{k}/{i}")
            else:
                np.testing.assert_array_equal(gv[i], rv[i], err_msg=f"{k}/{i}")


def test_segment_streaming_matches_monolithic():
    # resumable segments (unbounded-reference path) vs one-shot kernel
    from parasail_rs_tpu.ops.scan_kernel import scan_score_segment

    m = Matrix.from_name("blosum62")
    rng = np.random.default_rng(51)
    alpha = list(b"ARNDCQEGHILKMFPSTWYV")
    prows, qidxs, ridxs = [], [], []
    for _ in range(128):
        q = rng.choice(alpha, size=rng.integers(3, 60)).astype("uint8").tobytes()
        r = rng.choice(alpha, size=rng.integers(3, 250)).astype("uint8").tobytes()
        qi, ri = m.encode(q), m.encode(r)
        qidxs.append(qi)
        ridxs.append(ri)
        prows.append(profile_rows(m, qi))
    b = build_batch(prows, qidxs, ridxs, Rp=256)
    SEG = 64
    for mode, free in [("sw", (True,) * 4), ("nw", (False,) * 4),
                       ("sg", (True, False, False, True))]:
        ref = scan_score_align(
            b.profile, b.ridx, b.qlen, b.rlen,
            open_=np.int32(11), ext=np.int32(1), mode=mode, free=free,
            width="sat", interpret=INTERPRET)
        state, out = None, None
        for s0 in range(0, 256, SEG):
            out, state = scan_score_segment(
                b.profile, b.ridx[:, s0:s0 + SEG], b.qlen, b.rlen, state,
                open_=np.int32(11), ext=np.int32(1), mode=mode, free=free,
                width="sat", col_offset=np.int32(s0), resume=s0 > 0,
                interpret=INTERPRET)
        for k in ("score", "end_query", "end_ref", "saturated", "promoted"):
            np.testing.assert_array_equal(
                np.asarray(out[k]), np.asarray(ref[k]), err_msg=f"{mode}/{k}")


def test_engine_streamed_long_reference(monkeypatch):
    # engine routes huge-scol score batches through segment streaming
    from parasail_rs_tpu.engine import Aligner, dispatch as disp
    from parasail_rs_tpu.golden import model as golden

    rng = np.random.default_rng(61)
    m = Matrix.create(b"ACGT", 2, -3)
    qs = [rng.choice(list(b"ACGT"), size=40).astype("uint8").tobytes()
          for _ in range(3)]
    rs = [rng.choice(list(b"ACGT"),
                     size=rng.integers(300, 500)).astype("uint8").tobytes()
          for _ in range(3)]
    aligner = Aligner.new().matrix(m).gap_open(4).gap_extend(1).local().build()
    batch, qlens, rlens = aligner._pack(qs, rs)
    monkeypatch.setenv("PT_STREAM_SEG", "128")
    monkeypatch.setenv("PT_FORCE_PALLAS", "1")
    out = disp._execute_pallas_streamed(
        batch, gap_open=4, gap_extend=1, mode="sw", free=(True,) * 4,
        width="sat")
    for i, (q, r) in enumerate(zip(qs, rs)):
        g = golden.align_seqs(q, r, m, 4, 1, "sw")
        assert int(out["score"][i]) == g.score
        assert int(out["end_query"][i]) == g.end_query
        assert int(out["end_ref"][i]) == g.end_ref


def test_segment_streaming_stats():
    from parasail_rs_tpu.ops.scan_kernel import scan_score_segment

    m = Matrix.from_name("blosum62")
    rng = np.random.default_rng(53)
    alpha = list(b"ARNDCQEGHILKMFPSTWYV")
    prows, qidxs, ridxs = [], [], []
    for _ in range(128):
        q = rng.choice(alpha, size=rng.integers(3, 50)).astype("uint8").tobytes()
        r = rng.choice(alpha, size=rng.integers(3, 200)).astype("uint8").tobytes()
        qi, ri = m.encode(q), m.encode(r)
        qidxs.append(qi)
        ridxs.append(ri)
        prows.append(profile_rows(m, qi))
    b = build_batch(prows, qidxs, ridxs, Rp=256)
    ref = scan_score_align(
        b.profile, b.ridx, b.qlen, b.rlen, b.qidx,
        open_=np.int32(11), ext=np.int32(1), mode="sw", free=(True,) * 4,
        width="sat", outputs="stats", interpret=INTERPRET)
    state, out = None, None
    for s0 in range(0, 256, 64):
        out, state = scan_score_segment(
            b.profile, b.ridx[:, s0:s0 + 64], b.qlen, b.rlen, state, b.qidx,
            open_=np.int32(11), ext=np.int32(1), mode="sw", free=(True,) * 4,
            width="sat", outputs="stats", col_offset=np.int32(s0),
            resume=s0 > 0, interpret=INTERPRET)
    for k in ("score", "end_query", "end_ref", "matches", "similar",
              "length"):
        np.testing.assert_array_equal(
            np.asarray(out[k]), np.asarray(ref[k]), err_msg=k)


def test_segment_streaming_trace_and_engine():
    # streamed trace planes, engine-assembled, feed the normal CIGAR walk
    from parasail_rs_tpu.engine import Aligner, dispatch as disp
    from parasail_rs_tpu.golden import model as golden

    rng = np.random.default_rng(71)
    m = Matrix.create(b"ACGT", 2, -3)
    qs = [rng.choice(list(b"ACGT"), size=30).astype("uint8").tobytes()
          for _ in range(3)]
    rs = [rng.choice(list(b"ACGT"),
                     size=rng.integers(300, 500)).astype("uint8").tobytes()
          for _ in range(3)]
    aligner = (Aligner.new().matrix(m).gap_open(4).gap_extend(1).local()
               .use_trace().build())
    batch, qlens, rlens = aligner._pack(qs, rs)
    import unittest.mock as mock
    with mock.patch.dict(os.environ, {"PT_STREAM_SEG": "128"}):
        out = disp._execute_pallas_streamed(
            batch, gap_open=4, gap_extend=1, mode="sw", free=(True,) * 4,
            width="sat", outputs="trace")
    for i, (q, r) in enumerate(zip(qs, rs)):
        g = golden.align_seqs(q, r, m, 4, 1, "sw")
        assert int(out["score"][i]) == g.score
        np.testing.assert_array_equal(
            out["trace_table"][i, :len(q), :len(r)], g.trace_table,
            err_msg=str(i))


def test_engine_streamed_stats():
    from parasail_rs_tpu.engine import Aligner, dispatch as disp
    from parasail_rs_tpu.golden import model as golden
    import unittest.mock as mock

    rng = np.random.default_rng(73)
    m = Matrix.create(b"ACGT", 2, -3)
    qs = [rng.choice(list(b"ACGT"), size=35).astype("uint8").tobytes()
          for _ in range(3)]
    rs = [rng.choice(list(b"ACGT"),
                     size=rng.integers(300, 500)).astype("uint8").tobytes()
          for _ in range(3)]
    aligner = (Aligner.new().matrix(m).gap_open(4).gap_extend(1).local()
               .use_stats().build())
    batch, qlens, rlens = aligner._pack(qs, rs)
    with mock.patch.dict(os.environ, {"PT_STREAM_SEG": "128"}):
        out = disp._execute_pallas_streamed(
            batch, gap_open=4, gap_extend=1, mode="sw", free=(True,) * 4,
            width="sat", outputs="stats")
    for i, (q, r) in enumerate(zip(qs, rs)):
        g = golden.align_seqs(q, r, m, 4, 1, "sw")
        got = (int(out["score"][i]), int(out["matches"][i]),
               int(out["similar"][i]), int(out["length"][i]))
        assert got == (g.score, g.matches, g.similar, g.length), (i, got)


@pytest.mark.parametrize("mode,free,outputs", [
    ("sw", (True, True, True, True), "score"),
    ("nw", (False, False, False, False), "score"),
    ("sg", (True, False, False, True), "score"),
    ("sg", (False, True, True, False), "score"),
    ("sw", (True, True, True, True), "stats"),
    ("sg", (True, True, True, True), "stats"),
    ("sw", (True, True, True, True), "trace"),
])
def test_packed_candidate_tracker_matches_unpacked(mode, free, outputs):
    # hmax_bound unlocks the [H | P-1-j] packed end-cell tracker (and
    # drops the saturation planes in local mode); every output must be
    # bit-identical to the two-plane tracker, including tie handling.
    b = BATCH
    kw = dict(open_=np.int32(11), ext=np.int32(1), mode=mode, free=free,
              width="sat", outputs=outputs, interpret=INTERPRET)
    qidx = b.qidx if outputs == "stats" else None
    ref = scan_score_align(b.profile, b.ridx, b.qlen, b.rlen, qidx, **kw)
    got = scan_score_align(b.profile, b.ridx, b.qlen, b.rlen, qidx,
                           hmax_bound=1 << 14, **kw)
    for k in ref:
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(ref[k]),
            err_msg=f"{mode}/{free}/{outputs}/{k}")


def test_packed_candidate_tracker_tie_semantics():
    # A repetitive DNA pair produces many equal-score end candidates;
    # the packed tracker must keep the reference tie preference
    # (H desc, end_query asc, end_ref asc) bit-for-bit.
    m = Matrix.create(b"ACGT", 2, -1)
    rng = np.random.default_rng(11)
    qidxs, ridxs, prows = [], [], []
    for _ in range(128):
        q = (b"ACAC" * 8)[: rng.integers(8, 30)]
        r = (b"CACA" * 12)[: rng.integers(8, 44)]
        qi, ri = m.encode(q), m.encode(r)
        qidxs.append(qi)
        ridxs.append(ri)
        prows.append(profile_rows(m, qi))
    b = build_batch(prows, qidxs, ridxs)
    for mode, free in CONFIGS:
        kw = dict(open_=np.int32(2), ext=np.int32(1), mode=mode, free=free,
                  width="sat", outputs="score", interpret=INTERPRET)
        ref = scan_score_align(b.profile, b.ridx, b.qlen, b.rlen, **kw)
        got = scan_score_align(b.profile, b.ridx, b.qlen, b.rlen,
                               hmax_bound=256, **kw)
        for k in ref:
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(ref[k]),
                err_msg=f"{mode}/{free}/{k}")


def test_packed_candidate_gate_rejects_small_bounds():
    from parasail_rs_tpu.ops.scan_kernel import cand_pack_params

    ok, shj, p = cand_pack_params(160, 8192)
    assert ok and p == 256 and shj == 8
    assert cand_pack_params(160, None)[0] is False
    assert cand_pack_params(160, 8192, banded=True)[0] is False
    assert cand_pack_params(160, 8192, stream=True)[0] is False
    # bound too large for the column field: 2^30 / P exceeded
    assert cand_pack_params(1 << 20, 1 << 12)[0] is False


def test_build_gpack_from_table_matches_profile_pack():
    """The table->gpack shortcut must agree with packing explicit
    profile rows, for both per-pair and shared (1, Qp) query forms."""
    import jax.numpy as jnp

    from parasail_rs_tpu.ops.scan_kernel import (LANES, build_gpack,
                                                 build_gpack_from_table)

    rng = np.random.default_rng(11)
    A, Qp, B = 25, 24, LANES
    table = rng.integers(-8, 12, size=(A, A)).astype(np.int32)
    qidx = rng.integers(0, A, size=(B, Qp)).astype(np.int32)
    qidx[:, -3:] = -1                      # padded rows pack to zeros
    rows = np.where(qidx[..., None] >= 0,
                    table[np.clip(qidx, 0, A - 1)], 0).astype(np.int32)
    want = np.asarray(build_gpack(jnp.asarray(rows)))
    got = np.asarray(build_gpack_from_table(jnp.asarray(table),
                                            jnp.asarray(qidx)))
    np.testing.assert_array_equal(got, want)

    # shared query: (1, Qp) broadcasts across lanes
    got1 = np.asarray(build_gpack_from_table(jnp.asarray(table),
                                             jnp.asarray(qidx[:1])))
    want1 = np.asarray(build_gpack(jnp.asarray(rows[:1])))
    np.testing.assert_array_equal(got1, want1)


def test_stream_seg_per_output_class(monkeypatch):
    from parasail_rs_tpu.engine import dispatch as disp

    monkeypatch.delenv("PT_STREAM_SEG", raising=False)
    assert disp.stream_seg("score") == 8192
    assert disp.stream_seg("stats") == disp.STREAM_SEG
    assert disp.stream_seg("trace") == disp.STREAM_SEG
    # pack2 [m|s] down-state admits the 2560-column stats segment for
    # every query size whose plan fits (hardware A/B 2026-08-19:
    # 14.8 -> 16.7 GCUPS on 128 x 16kbp)
    assert disp.stream_seg("stats", qp=16384, A=25) == \
        disp.STREAM_SEG_STATS == 2560
    assert disp.stream_seg("stats", qp=256, A=25) == 2560
    monkeypatch.setenv("PT_STREAM_SEG", "512")
    assert disp.stream_seg("score") == 512
    assert disp.stream_seg("stats") == 512
    assert disp.stream_seg("stats", qp=16384, A=25) == 512


def test_streamed_stats_bit_exact_at_pack2_segment():
    """Streamed stats with the pack2-sized (2560-column) segments match
    golden exactly — the end-to-end pin for the segment-size bump.

    Uses a small Qp but the REAL default segment choice (no env
    override), reference long enough for several segments, interpret
    mode on CPU.
    """
    import os

    from parasail_rs_tpu.engine import dispatch as disp
    from parasail_rs_tpu.golden import model as golden

    assert "PT_STREAM_SEG" not in os.environ
    rng = np.random.default_rng(11)
    B, QL, RL = 4, 48, 2560 * 2 + 300   # 3 segments at 2560
    table = rng.integers(-3, 4, size=(5, 5)).astype(np.int32)
    np.fill_diagonal(table, 5)
    qidx = rng.integers(0, 4, size=(B, QL)).astype(np.int32)
    ridx = rng.integers(0, 4, size=(B, RL)).astype(np.int32)
    qlen = np.full(B, QL, np.int32)
    rlen = np.full(B, RL, np.int32)
    prof = table[qidx]                      # (B, QL, A)

    batch = disp.PairBatch(profile=prof, qidx=qidx, ridx=ridx,
                           qlen=qlen, rlen=rlen)
    assert disp.stream_seg("stats", qp=QL, A=5) == 2560
    import unittest.mock as mock
    with mock.patch.dict(os.environ, {"PT_FORCE_PALLAS": "1"}):
        out = disp._execute_pallas_streamed(
            batch, gap_open=4, gap_extend=1, mode="sw",
            free=(True,) * 4, width="32", outputs="stats")
    for b in range(B):
        sub = prof[b][np.arange(QL)[:, None], ridx[b][None, :]]
        g = golden.align(sub, qidx[b][:, None] == ridx[b][None, :],
                         4, 1, "sw", (True,) * 4)
        assert int(out["score"][b]) == g.score
        assert int(out["matches"][b]) == g.matches
        assert int(out["similar"][b]) == g.similar
        assert int(out["length"][b]) == g.length
        assert int(out["end_query"][b]) == g.end_query
        assert int(out["end_ref"][b]) == g.end_ref


OPEN_LT_EXT = [(1, 3), (2, 5), (0, 1), (0, 0)]


@pytest.mark.parametrize("open_,ext", OPEN_LT_EXT)
def test_scan_open_lt_ext_matches_wavefront(open_, ext):
    """gap_open < gap_extend (and 0/0): the vertical prefix scan runs at
    slope min(open, ext) — the exact closed form of golden's E
    recurrence — so score AND trace flags stay bit-exact on the scan
    route (the wavefront implements the literal recurrence)."""
    b = BATCH
    for mode, free in CONFIGS:
        ref = wavefront_align(
            b.profile, b.qidx, b.ridx, b.qlen, b.rlen,
            open_=np.int32(open_), ext=np.int32(ext), mode=mode, free=free,
            outputs="score", width="32")
        got = scan_score_align(
            b.profile, b.ridx, b.qlen, b.rlen,
            open_=np.int32(open_), ext=np.int32(ext), mode=mode, free=free,
            width="32", interpret=INTERPRET)
        for k in ("score", "end_query", "end_ref"):
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(ref[k]),
                err_msg=f"{open_}/{ext}/{mode}/{free}/{k}")
        rt = wavefront_align(
            b.profile, b.qidx, b.ridx, b.qlen, b.rlen,
            open_=np.int32(open_), ext=np.int32(ext), mode=mode, free=free,
            outputs="trace", width="32")
        gt = scan_score_align(
            b.profile, b.ridx, b.qlen, b.rlen,
            open_=np.int32(open_), ext=np.int32(ext), mode=mode, free=free,
            width="32", outputs="trace", interpret=INTERPRET)
        ga, ra = np.asarray(gt["trace_table"]), np.asarray(rt["trace_table"])
        for i in range(0, b.size, 17):
            ql, rl = int(b.qlen[i]), int(b.rlen[i])
            np.testing.assert_array_equal(
                ga[i, :ql, :rl], ra[i, :ql, :rl],
                err_msg=f"trace {open_}/{ext}/{mode}/{free}/{i}")


def test_scan_open_lt_ext_chunked_and_streamed():
    """Cross-chunk (dPM) and cross-segment carries live in the A-domain,
    whose slope is min(open, ext) — chunked queries and streamed
    reference segments must stay exact at open < ext too."""
    from parasail_rs_tpu.golden import model as golden
    from parasail_rs_tpu.ops.scan_kernel import scan_score_segment

    m = Matrix.create(b"ACGT", 2, -3)
    rng = np.random.default_rng(23)
    pairs, prows, qidxs, ridxs = [], [], [], []
    for ql, rl in [(3000, 90), (2600, 64), (1, 1)] + [(48, 80)] * 125:
        q = rng.choice(list(b"ACGT"), size=ql).astype("uint8").tobytes()
        r = rng.choice(list(b"ACGT"), size=rl).astype("uint8").tobytes()
        pairs.append((q, r))
        qi, ri = m.encode(q), m.encode(r)
        qidxs.append(qi)
        ridxs.append(ri)
        prows.append(profile_rows(m, qi))
    b = build_batch(prows, qidxs, ridxs, Qp=3072, Rp=96)
    out = scan_score_align(
        b.profile, b.ridx, b.qlen, b.rlen,
        open_=np.int32(2), ext=np.int32(4), mode="nw", free=(False,) * 4,
        width="32", outputs="trace", interpret=INTERPRET)
    for i in (0, 1, 2, 3):
        q, r = pairs[i]
        g = golden.align_seqs(q, r, m, 2, 4, "nw")
        assert int(out["score"][i]) == g.score, i
        tt = np.asarray(out["trace_table"])[i, :len(q), :len(r)]
        np.testing.assert_array_equal(tt, g.trace_table, err_msg=str(i))

    # streamed segments, same A-domain carry across col_offset resumes
    prows2, qidxs2, ridxs2 = [], [], []
    for _ in range(128):
        q = rng.choice(list(b"ACGT"),
                       size=rng.integers(3, 48)).astype("uint8").tobytes()
        r = rng.choice(list(b"ACGT"),
                       size=rng.integers(3, 120)).astype("uint8").tobytes()
        qi, ri = m.encode(q), m.encode(r)
        qidxs2.append(qi)
        ridxs2.append(ri)
        prows2.append(profile_rows(m, qi))
    b2 = build_batch(prows2, qidxs2, ridxs2, Rp=128)
    ref = scan_score_align(
        b2.profile, b2.ridx, b2.qlen, b2.rlen,
        open_=np.int32(1), ext=np.int32(3), mode="sw", free=(True,) * 4,
        width="32", interpret=INTERPRET)
    state, out2 = None, None
    for s0 in range(0, 128, 32):
        out2, state = scan_score_segment(
            b2.profile, b2.ridx[:, s0:s0 + 32], b2.qlen, b2.rlen, state,
            open_=np.int32(1), ext=np.int32(3), mode="sw", free=(True,) * 4,
            width="32", col_offset=np.int32(s0), resume=s0 > 0,
            interpret=INTERPRET)
    for k in ("score", "end_query", "end_ref"):
        np.testing.assert_array_equal(
            np.asarray(out2[k]), np.asarray(ref[k]), err_msg=k)


def test_engine_open_lt_ext_pallas_route(monkeypatch):
    """The engine serves open < ext on the scan route (forced Pallas =
    interpret on CPU) with results identical to the wavefront route;
    stats plan to the trace+device-walk route (payload tie semantics
    keep them off the one-pass stats kernel)."""
    from parasail_rs_tpu.engine import Aligner
    from parasail_rs_tpu.engine.dispatch import pack_pairs, plan_route

    m = Matrix.from_name("blosum62")
    aligner = (Aligner.new().matrix(m).gap_open(1).gap_extend(3).local()
               .use_trace().build())
    qs = [b"MKVLAT", b"HEAGAWGHEE", b"PAWHEAE"]
    rs = [b"MKVInnnLAT", b"PAWHEAE", b"HEAGAWGHEE"]
    base = [(a.get_score(), a.get_cigar(q, r))
            for a, q, r in zip(aligner.align_batch(qs, rs), qs, rs)]
    monkeypatch.setenv("PT_FORCE_PALLAS", "1")
    via = [(a.get_score(), a.get_cigar(q, r))
           for a, q, r in zip(aligner.align_batch(qs, rs), qs, rs)]
    assert via == base
    batch, _, _ = pack_pairs(m, qs, rs)
    assert plan_route(batch, "score", 1, 3)[0] == "pallas"
    assert plan_route(batch, "trace", 1, 3)[0] == "pallas"
    route, reason = plan_route(batch, "stats", 1, 3)
    assert route == "trace_walk" and "device walk" in reason
