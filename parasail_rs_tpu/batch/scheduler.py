"""Length-binning batch scheduler.

The reference processes one pair per call and leaves batching to user
threads (SURVEY.md §2.3).  On TPU the cost model inverts: every kernel
launch processes a dense (B, Qp, Rp) tile, so mixed-length workloads
(BASELINE.json config 5: 100bp-10kbp) must be binned by padded shape —
padding a 100bp pair into a 10kbp tile wastes 99.99% of the lanes.

``plan_bins`` groups pair indices by their (query, reference) length
buckets (utils.shapes.length_bucket ladder: <= ~33% padding waste) and
splits oversized groups so one launch never exceeds ``max_cells`` DP
cells — bounding both device memory and launch latency.  Bins are
emitted largest-bucket-first so the big compilations happen before the
many small launches.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..utils.shapes import length_bucket


@dataclass
class Bin:
    """One kernel launch: pairs sharing a padded (Qp, Rp) tile."""

    qp: int
    rp: int
    indices: list[int]


def plan_bins(
    qlens,
    rlens,
    *,
    max_cells: int = 1 << 28,
    lane_quantum: int = 1,
) -> list[Bin]:
    """Group pair indices into shape bins.

    Args:
      qlens, rlens: per-pair sequence lengths.
      max_cells: cap on B*Qp*Rp per launch (device memory / latency bound).
      lane_quantum: round bin sizes up to this multiple where possible by
        merging (the Pallas kernel wants multiples of 128 lanes; smaller
        remainders still dispatch, padded by the engine).

    Returns bins covering every index exactly once.
    """
    groups: dict[tuple[int, int], list[int]] = {}
    for i, (ql, rl) in enumerate(zip(qlens, rlens)):
        key = (length_bucket(int(ql)), length_bucket(int(rl)))
        groups.setdefault(key, []).append(i)

    bins: list[Bin] = []
    for (qp, rp), idxs in groups.items():
        per_launch = max(lane_quantum, max(1, max_cells // (qp * rp)))
        for off in range(0, len(idxs), per_launch):
            bins.append(Bin(qp=qp, rp=rp, indices=idxs[off:off + per_launch]))
    bins.sort(key=lambda b: (-b.qp * b.rp, -len(b.indices)))
    return bins
