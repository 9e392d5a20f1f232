"""The scan kernel's tile planner must cover the mid-range shapes.

Round-1 left holes: 1536/2048-row queries (and 1024+ with stats) failed
the VMEM plan and silently dropped onto the ~1000x slower wavefront.
The adaptive chunk planner closes them; these tests pin the envelope
and bit-exactness of a mid-range chunked fill.
"""

import numpy as np
import pytest

from parasail_rs_tpu.engine.dispatch import pack_pairs, plan_route
from parasail_rs_tpu.golden import model as golden
from parasail_rs_tpu.matrices import Matrix
from parasail_rs_tpu.ops.scan_kernel import LANES, _plan, scan_score_align


def test_plan_envelope():
    for qp in (160, 512, 1024, 1536, 2048, 3072, 4096, 8192):
        assert _plan(qp, qp, "score") is not None, qp
    for qp in (160, 512, 1024, 1536, 2048):
        assert _plan(qp, qp, "stats") is not None, qp
    for qp in (160, 512, 1024, 2048, 4096):
        assert _plan(qp, qp, "trace") is not None, qp
    # chunk sizes divide the bucket and the unchunked form is preferred
    Qc, nq, _, _ = _plan(1536, 1536, "score")
    assert Qc * nq == 1536 and nq > 1
    assert _plan(512, 512, "score")[1] == 1


def test_midrange_routes_to_pallas(monkeypatch):
    monkeypatch.setenv("PT_FORCE_PALLAS", "1")
    m = Matrix.create(b"ACGT", 2, -3)
    rng = np.random.default_rng(5)
    seqs = [rng.choice(list(b"ACGT"), size=n).astype("uint8").tobytes()
            for n in (1400, 1536, 900)]
    batch, _, _ = pack_pairs(m, seqs, seqs[::-1])
    route, reason = plan_route(batch, "score", 10, 1)
    assert route == "pallas", reason


def test_long_pairs_route_to_stream(monkeypatch):
    """16k/64k-bp pair batches must stream, not drop to the wavefront.

    Regression: the streaming gate still sized the per-segment scol
    substitution tensor (Bpad*Qp*STREAM_SEG) after G-select removed it,
    so a 128-pair 16kbp batch (4.3 GB by the stale formula, ~16 MB of
    real packed-profile input) was declined and fell onto the wavefront
    — which crashed the TPU worker at that size."""
    monkeypatch.setenv("PT_FORCE_PALLAS", "1")
    m = Matrix.create(b"ACGT", 2, -3)
    rng = np.random.default_rng(6)
    for L in (16384, 65536):
        seqs = [rng.choice(list(b"ACGT"), size=L).astype("uint8").tobytes()
                for _ in range(2)]
        batch, _, _ = pack_pairs(m, seqs * 64, seqs * 64)
        route, reason = plan_route(batch, "score", 5, 1)
        assert route == "stream", (L, route, reason)


@pytest.mark.parametrize("impl", ["flat", "two", "cummax"])
def test_prefix_impls_bit_identical(impl, monkeypatch):
    """The PT_PREFIX_IMPL perf knob must never change results."""
    monkeypatch.setenv("PT_PREFIX_IMPL", impl)
    m = Matrix.create(b"ACGT", 2, -3)
    rng = np.random.default_rng(7)
    B = LANES
    prof = np.zeros((B, 64, m.size), np.int32)
    ridx = np.zeros((B, 64), np.int32)
    qlen = np.zeros(B, np.int32)
    rlen = np.zeros(B, np.int32)
    from parasail_rs_tpu.engine.profile import profile_rows

    pairs = []
    for b in range(4):
        q = rng.choice(list(b"ACGT"), size=rng.integers(30, 64)).astype(
            "uint8").tobytes()
        r = rng.choice(list(b"ACGT"), size=rng.integers(30, 64)).astype(
            "uint8").tobytes()
        pairs.append((q, r))
        qi, ri = m.encode(q), m.encode(r)
        prof[b, :len(qi)] = profile_rows(m, qi)
        ridx[b, :len(ri)] = ri
        qlen[b], rlen[b] = len(qi), len(ri)
    qlen[4:] = 8
    rlen[4:] = 8
    import jax

    out = scan_score_align(
        prof, ridx, qlen, rlen, open_=10, ext=1, mode="sw",
        free=(True,) * 4, width="32", outputs="score",
        interpret=jax.default_backend() != "tpu")
    for b, (q, r) in enumerate(pairs):
        g = golden.align_seqs(q, r, m, 10, 1, "sw")
        assert int(np.asarray(out["score"])[b]) == g.score, (impl, b)


def test_midrange_chunked_scan_matches_golden():
    """A 1536-bucket pair batch through the (newly) chunked scan plan."""
    m = Matrix.create(b"ACGT", 2, -3)
    rng = np.random.default_rng(6)
    B = LANES
    lens = [1400, 1536, 260, 1024]
    pairs = []
    prof = np.zeros((B, 1536, m.size), np.int32)
    ridx = np.zeros((B, 256), np.int32)
    qlen = np.full(B, 8, np.int32)
    rlen = np.full(B, 8, np.int32)
    from parasail_rs_tpu.engine.profile import profile_rows

    for b, ql in enumerate(lens):
        q = rng.choice(list(b"ACGT"), size=ql).astype("uint8").tobytes()
        r = rng.choice(list(b"ACGT"), size=230).astype("uint8").tobytes()
        pairs.append((q, r))
        qi, ri = m.encode(q), m.encode(r)
        prof[b, :ql] = profile_rows(m, qi)
        ridx[b, :len(ri)] = ri
        qlen[b], rlen[b] = ql, len(ri)
    plan = _plan(1536, 256, "score")
    assert plan is not None and plan[1] > 1     # really exercises chunking
    import jax

    out = scan_score_align(
        prof, ridx, qlen, rlen, open_=10, ext=1, mode="sw",
        free=(True,) * 4, width="32", outputs="score",
        interpret=jax.default_backend() != "tpu")
    for b, (q, r) in enumerate(pairs):
        g = golden.align_seqs(q, r, m, 10, 1, "sw")
        assert int(np.asarray(out["score"])[b]) == g.score, b
        assert int(np.asarray(out["end_query"])[b]) == g.end_query, b
        assert int(np.asarray(out["end_ref"])[b]) == g.end_ref, b
