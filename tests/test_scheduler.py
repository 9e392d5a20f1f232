"""Length-binned scheduler: coverage, caps, and end-to-end equivalence."""

import numpy as np

from parasail_rs_tpu.batch import plan_bins
from parasail_rs_tpu.engine import Aligner
from parasail_rs_tpu.matrices import Matrix
from parasail_rs_tpu.utils.shapes import length_bucket


def test_plan_bins_covers_every_index_once():
    rng = np.random.default_rng(2)
    qlens = rng.integers(1, 500, size=200)
    rlens = rng.integers(1, 500, size=200)
    bins = plan_bins(qlens, rlens)
    seen = sorted(i for b in bins for i in b.indices)
    assert seen == list(range(200))
    for b in bins:
        for i in b.indices:
            assert length_bucket(int(qlens[i])) == b.qp
            assert length_bucket(int(rlens[i])) == b.rp


def test_plan_bins_respects_max_cells():
    qlens = [100] * 1000
    rlens = [100] * 1000
    bins = plan_bins(qlens, rlens, max_cells=128 * 112 * 112)
    for b in bins:
        assert len(b.indices) * b.qp * b.rp <= 128 * 112 * 112 + b.qp * b.rp


def test_plan_bins_lane_quantum_overrides_cells_cap():
    # 128 vector lanes cost one launch whether 1 or 128 pairs ride them:
    # scalar-output binning must not split long-pair groups below the
    # lane quantum, even when qp*rp alone exceeds max_cells
    qlens = [16000] * 200
    rlens = [16000] * 200
    bins = plan_bins(qlens, rlens, max_cells=1 << 28, lane_quantum=128)
    assert sorted(len(b.indices) for b in bins) == [72, 128]
    # trace/table callers keep the cells cap as the true bound
    bins = plan_bins(qlens, rlens, max_cells=1 << 28, lane_quantum=1)
    assert all(len(b.indices) == 1 for b in bins)


def test_align_many_matches_align():
    rng = np.random.default_rng(9)
    m = Matrix.create(b"ACGT", 2, -3)
    qs, rs = [], []
    for _ in range(17):
        qs.append(rng.choice(list(b"ACGT"),
                             size=rng.integers(3, 120)).astype("uint8").tobytes())
        rs.append(rng.choice(list(b"ACGT"),
                             size=rng.integers(3, 120)).astype("uint8").tobytes())
    aligner = (Aligner.new().matrix(m).gap_open(4).gap_extend(1).local()
               .use_stats().build())
    many = aligner.align_many(qs, rs)
    for q, r, res in zip(qs, rs, many):
        one = aligner.align(q, r)
        assert res.get_score() == one.get_score()
        assert res.get_end_query() == one.get_end_query()
        assert res.get_end_ref() == one.get_end_ref()
        assert res.get_matches() == one.get_matches()


def test_merge_bins_caps_launches():
    from parasail_rs_tpu.batch import merge_bins, plan_bins

    rng = np.random.default_rng(3)
    qlens = rng.integers(100, 2000, size=256)
    rlens = rng.integers(100, 2000, size=256)
    bins = plan_bins(qlens, rlens, max_cells=1 << 33, lane_quantum=128)
    assert len(bins) > 8  # the mixed workload really does fragment
    merged = merge_bins(bins, max_launches=8, max_cells=1 << 33)
    assert len(merged) <= 8
    # every index exactly once
    seen = sorted(i for b in merged for i in b.indices)
    assert seen == list(range(256))
    # every pair still fits its merged tile
    for b in merged:
        for i in b.indices:
            assert qlens[i] <= b.qp and rlens[i] <= b.rp


def test_merge_bins_respects_max_cells():
    from parasail_rs_tpu.batch import Bin, merge_bins

    bins = [Bin(qp=1024, rp=1024, indices=list(range(10))),
            Bin(qp=16, rp=16, indices=[10])]
    # merging would cost 11 * 1024 * 1024 cells > the cap -> no merge
    out = merge_bins(bins, max_launches=1, max_cells=10_500_000)
    assert len(out) == 2


def test_merge_bins_noop_when_under_cap():
    from parasail_rs_tpu.batch import Bin, merge_bins

    bins = [Bin(qp=64, rp=64, indices=[0]), Bin(qp=128, rp=128, indices=[1])]
    assert merge_bins(bins, max_launches=2) is bins


def test_align_many_profile_reuse_grouped_upload():
    """align_many with a profile (rbytes-only batches) through the
    r5 grouped-upload path (dispatch.commit_batches) matches per-pair
    align()."""
    import numpy as np

    from parasail_rs_tpu.engine import Aligner, Profile
    from parasail_rs_tpu.matrices import Matrix

    rng = np.random.default_rng(23)
    aa = list(b"ARNDCQEGHILKMFPSTWYV")
    q = rng.choice(aa, size=48).astype("uint8").tobytes()
    refs = [rng.choice(aa, size=rng.integers(20, 400)).astype("uint8")
            .tobytes() for _ in range(40)]
    blosum = Matrix.from_name("blosum62")
    prof = Profile.new(q, False, blosum)
    pa = (Aligner.new().profile(prof).gap_open(11).gap_extend(1)
          .local().scan().build())
    many = pa.align_many(None, refs)
    for i in (0, 7, 19, 39):
        one = pa.align(None, refs[i])
        assert many[i].get_score() == one.get_score()
        assert many[i].get_end_ref() == one.get_end_ref()


def test_streaming_interleaved_lifecycle():
    """submit -> flush -> submit -> close keeps resolving correctly
    through the grouped-launch/fused-drain fetch loop (r5)."""
    import numpy as np

    from parasail_rs_tpu.engine import Aligner
    from parasail_rs_tpu.engine.stream import StreamingAligner
    from parasail_rs_tpu.matrices import Matrix

    rng = np.random.default_rng(29)
    aa = list(b"ARNDCQEGHILKMFPSTWYV")
    qs = [rng.choice(aa, size=rng.integers(20, 60)).astype("uint8")
          .tobytes() for _ in range(90)]
    rs = [rng.choice(aa, size=rng.integers(20, 60)).astype("uint8")
          .tobytes() for _ in range(90)]
    sw = (Aligner.new().matrix(Matrix.from_name("blosum62"))
          .gap_open(11).gap_extend(1).local().build())
    ref = [a.get_score() for a in sw.align_batch(qs, rs)]
    st = StreamingAligner(sw, flush_size=16)
    try:
        h1 = st.submit_many(qs[:40], rs[:40])
        st.flush()
        assert [h.result().get_score() for h in h1] == ref[:40]
        h2 = st.submit_many(qs[40:], rs[40:])
        st.flush()
        assert [h.result().get_score() for h in h2] == ref[40:]
    finally:
        st.close()
    # close() after full drain: handles stay resolved
    assert h2[-1].done()
