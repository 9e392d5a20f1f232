"""Sequence-parallel wavefront: 8-device mesh vs the golden oracle.

One long pair's reference axis is sharded across the mesh with halo
exchange between neighbors (dist/seqpar.py); scores and end coordinates
must be bit-exact vs the scalar golden model for every mode and free-end
variant — including ragged lengths that end mid-chunk and mid-device.
"""

import numpy as np
import pytest

from parasail_rs_tpu.dist import make_device_mesh
from parasail_rs_tpu.dist.seqpar import seqpar_align
from parasail_rs_tpu.engine.profile import profile_rows
from parasail_rs_tpu.golden import model as golden
from parasail_rs_tpu.matrices import Matrix


def _problem():
    m = Matrix.create(b"ACGT", 2, -3)
    rng = np.random.default_rng(3)
    Qp = Rp = 256
    B = 2
    pairs = []
    prof = np.zeros((Qp, m.size, B), np.int32)
    ridx = np.zeros((Rp, B), np.int32)
    qlen = np.zeros(B, np.int32)
    rlen = np.zeros(B, np.int32)
    for b, (ql, rl) in enumerate([(230, 199), (256, 256)]):
        q = rng.choice(list(b"ACGT"), size=ql).astype("uint8").tobytes()
        r = rng.choice(list(b"ACGT"), size=rl).astype("uint8").tobytes()
        pairs.append((q, r))
        qi, ri = m.encode(q), m.encode(r)
        prof[:ql, :, b] = profile_rows(m, qi)
        ridx[:rl, b] = ri
        qlen[b], rlen[b] = ql, rl
    return m, pairs, prof, ridx, qlen, rlen


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
def test_seqpar_vs_golden(mode, free):
    m, pairs, prof, ridx, qlen, rlen = PROBLEM
    out = seqpar_align(
        prof, ridx, qlen, rlen, open_=5, ext=1, mesh=MESH,
        mode=mode, free=free, q_chunk=32)
    for b, (q, r) in enumerate(pairs):
        g = golden.align_seqs(q, r, m, 5, 1, mode,
                              free if mode == "sg" else None)
        assert int(out["score"][b]) == g.score, (mode, free, b)
        assert int(out["end_query"][b]) == g.end_query
        assert int(out["end_ref"][b]) == g.end_ref


def test_seqpar_matches_single_device_kernel():
    # Cross-check against the single-chip XLA wavefront on the same batch.
    from parasail_rs_tpu.engine.dispatch import build_batch
    from parasail_rs_tpu.ops.wavefront import wavefront_align

    m, pairs, prof, ridx, qlen, rlen = PROBLEM
    out = seqpar_align(
        prof, ridx, qlen, rlen, open_=5, ext=1, mesh=MESH,
        mode="sw", free=(True,) * 4, q_chunk=32)
    prows = [prof[:ql, :, b] for b, ql in enumerate(qlen)]
    qidxs = [np.zeros(ql, np.int32) for ql in qlen]
    ridxs = [ridx[:rl, b] for b, rl in enumerate(rlen)]
    batch = build_batch(prows, qidxs, ridxs)
    ref = wavefront_align(
        batch.profile, batch.qidx, batch.ridx, batch.qlen, batch.rlen,
        open_=np.int32(5), ext=np.int32(1), mode="sw", free=(True,) * 4,
        outputs="score", width="32")
    np.testing.assert_array_equal(np.asarray(out["score"]),
                                  np.asarray(ref["score"]))


@pytest.mark.parametrize("mode,free", [
    ("sw", (True, True, True, True)),
    ("nw", (False, False, False, False)),
    ("sg", (True, False, False, True)),
])
def test_seqpar_trace_and_cigar_vs_golden(mode, free):
    """Multi-chip trace: each device emits its column shard of the flag
    plane during the pipelined fill; the host walk over the gathered
    plane must produce the single-chip CIGAR, bit-identical flags and
    all (VERDICT r1 item 8 — pairs spanning 8 virtual devices)."""
    from parasail_rs_tpu.dist.seqpar import seqpar_cigars

    m, pairs, prof, ridx, qlen, rlen = PROBLEM
    out = seqpar_align(
        prof, ridx, qlen, rlen, open_=5, ext=1, mesh=MESH,
        mode=mode, free=free, q_chunk=32, outputs="trace")
    trace = np.asarray(out["trace_table"])
    cigars = seqpar_cigars(out, [q for q, _ in pairs],
                           [r for _, r in pairs], mode, free)
    for b, (q, r) in enumerate(pairs):
        g = golden.align_seqs(q, r, m, 5, 1, mode,
                              free if mode == "sg" else None)
        assert int(out["score"][b]) == g.score, (mode, b)
        np.testing.assert_array_equal(
            trace[b, :len(q), :len(r)], g.trace_table,
            err_msg=f"{mode} pair {b}")
        gw = golden.walk_trace(g.trace_table, q, r, g.end_query,
                               g.end_ref, mode, free)
        assert cigars[b] == gw.cigar_string(), (mode, b)


@pytest.mark.parametrize("mode,free", [
    ("sw", (True, True, True, True)),
    ("nw", (False, False, False, False)),
    ("sg", (True, False, False, True)),
])
def test_seqpar_stats_vs_golden(mode, free):
    # stats accumulators across device and chunk boundaries (halo stats
    # columns + payload-carrying prefix seeds)
    m, pairs, prof, ridx, qlen, rlen = PROBLEM
    qidx = np.full((prof.shape[0], prof.shape[2]), -1, np.int32)
    for b, (q, _) in enumerate(pairs):
        qidx[:len(q), b] = m.encode(q)
    out = seqpar_align(
        prof, ridx, qlen, rlen, qidx, open_=5, ext=1, mesh=MESH,
        mode=mode, free=free, q_chunk=32, outputs="stats")
    for b, (q, r) in enumerate(pairs):
        g = golden.align_seqs(q, r, m, 5, 1, mode,
                              free if mode == "sg" else None)
        assert int(out["score"][b]) == g.score, (mode, free, b)
        assert int(out["matches"][b]) == g.matches, (mode, free, b)
        assert int(out["similar"][b]) == g.similar, (mode, free, b)
        assert int(out["length"][b]) == g.length, (mode, free, b)


def test_seqpar_open_lt_ext_vs_golden():
    # value outputs are exact for any penalty pair (min(open, ext) slope
    # in the cross-chunk PM carry); stats keep the strict > contract
    import pytest

    m, pairs, prof, ridx, qlen, rlen = PROBLEM
    out = seqpar_align(prof, ridx, qlen, rlen, open_=1, ext=2, mesh=MESH,
                       mode="sw", q_chunk=32)
    for b, (q, r) in enumerate(pairs):
        g = golden.align_seqs(q, r, m, 1, 2, "sw")
        assert int(out["score"][b]) == g.score, b
        assert int(out["end_query"][b]) == g.end_query
        assert int(out["end_ref"][b]) == g.end_ref
    qidx = np.zeros((prof.shape[0], prof.shape[2]), np.int32)
    for open_, ext in [(2, 2), (1, 2)]:
        with pytest.raises(ValueError):
            seqpar_align(prof, ridx, qlen, rlen, qidx, open_=open_,
                         ext=ext, mesh=MESH, mode="sw", q_chunk=32,
                         outputs="stats")
