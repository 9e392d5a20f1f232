"""Streaming executor: production serving over an unbounded pair stream.

The reference's serving story is one blocking FFI call per pair plus
user-managed threads (SURVEY.md §2.3); the TPU-native story is a
pipeline: submissions accumulate into length-binned buckets, each full
bucket dispatches ONE kernel launch asynchronously (jax dispatch
returns device futures immediately), and host packing of the next
bucket overlaps device compute of the previous — the executor never
blocks until a result is actually read.

    stream = StreamingAligner(aligner, flush_size=2048)
    handles = [stream.submit(q, r) for q, r in pairs]
    stream.flush()
    for h in handles:
        h.result().get_score()
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..utils.shapes import length_bucket
from . import dispatch


@dataclass
class Handle:
    """Future-like handle for one submitted pair."""

    _stream: "StreamingAligner"
    _seq: int
    _value: object = None
    _done: bool = False

    def done(self) -> bool:
        return self._done

    def result(self):
        """The pair's Alignment (flushes the stream if still pending)."""
        if not self._done:
            self._stream.flush()
        assert self._done, "flush did not resolve this handle"
        return self._value


@dataclass
class _Bucket:
    qp: int
    rp: int
    queries: list = field(default_factory=list)
    references: list = field(default_factory=list)
    handles: list = field(default_factory=list)

    @property
    def size(self) -> int:
        return len(self.references)


class StreamingAligner:
    """Length-binned asynchronous batcher around an :class:`Aligner`.

    ``flush_size`` bounds pairs per kernel launch; ``max_cells`` bounds
    DP cells per launch (memory/latency).  Thread-compatible with one
    producer; results resolve in submission order per bucket.
    """

    def __init__(self, aligner, flush_size: int = 2048,
                 max_cells: int = 1 << 28):
        self._aligner = aligner
        self._flush_size = flush_size
        self._max_cells = max_cells
        self._buckets: dict[tuple[int, int], _Bucket] = {}
        self._pending: list[tuple[object, list, list, list]] = []
        self._seq = 0

    def submit(self, query, reference) -> Handle:
        """Queue one pair; dispatches a kernel when its bucket fills."""
        a = self._aligner
        if not a.profile.is_null:
            query = None
        qlen = a.profile.query_len if query is None else len(query)
        key = (length_bucket(qlen), length_bucket(len(reference)))
        bucket = self._buckets.get(key)
        if bucket is None:
            bucket = self._buckets[key] = _Bucket(qp=key[0], rp=key[1])
        h = Handle(self, self._seq)
        self._seq += 1
        bucket.queries.append(query)
        bucket.references.append(reference)
        bucket.handles.append(h)
        cells = bucket.size * bucket.qp * bucket.rp
        if bucket.size >= self._flush_size or cells >= self._max_cells:
            self._dispatch(key)
        return h

    def _dispatch(self, key) -> None:
        """Launch one bucket asynchronously; results stay on device."""
        bucket = self._buckets.pop(key)
        a = self._aligner
        queries = (None if bucket.queries[0] is None else bucket.queries)
        batch, qlens, rlens = a._pack(queries, bucket.references,
                                      Qp=bucket.qp, Rp=bucket.rp)
        out = dispatch.execute(
            batch,
            gap_open=a.gap_open, gap_extend=a.gap_extend,
            mode=a.key.mode, free=a.key.free,
            outputs=a.key.outputs, width=a.key.width,
            fetch=False,
        )
        self._pending.append((out, qlens, rlens, bucket.handles))

    def flush(self) -> None:
        """Dispatch every partial bucket and resolve all pending handles."""
        import numpy as np

        for key in list(self._buckets):
            if self._buckets[key].size:
                self._dispatch(key)
        self._buckets.clear()
        for out, qlens, rlens, handles in self._pending:
            host = {k: np.asarray(v) for k, v in out.items()}
            for b, h in enumerate(handles):
                h._value = self._aligner._make_alignment(
                    host, b, qlens[b], rlens[b])
                h._done = True
        self._pending.clear()
