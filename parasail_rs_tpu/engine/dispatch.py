"""Host-side batch assembly and kernel dispatch.

The reference's hot path is one FFI call per pair
(src/aligner/mod.rs:397-452); the TPU-native shape of that call is: pack a
batch of pairs into padded device tensors, run ONE jitted wavefront kernel
over the whole batch, and fetch the per-pair results.  Length bucketing
(utils.shapes.length_bucket) keeps the number of compiled shapes small.

Width dispatch replaces parasail's 8->16 saturation retry ladder
(src/aligner/mod.rs:125-126): scores are computed exactly in int32 in a
single pass while the kernel *detects* which pairs would have overflowed
8/16-bit lanes, so no retry run is ever needed — only the flag is reported
(``Alignment.is_saturated``, src/alignment/mod.rs:436-440).
"""

from __future__ import annotations

import logging
import os
from collections import Counter

import numpy as np

from ..ops.wavefront import wavefront_align
from ..utils import stages
from ..utils.gcpause import gc_pause
from ..utils.shapes import length_bucket

log = logging.getLogger("parasail_rs_tpu")

# Global tally of dispatch routing decisions, keyed (route, reason).
# Per-aligner tallies live on Aligner.route_counter; this one catches
# direct execute() callers too.  A batch landing off the Pallas route is
# a ~1000x perf cliff on TPU — it should never be silent.
ROUTE_COUNTS: Counter = Counter()


class PairBatch:
    """Padded device-ready tensors for a batch of alignment pairs.

    For square matrices ``profile`` is None and ``table`` carries the
    (A, A) substitution table instead: the per-pair profile rows are pure
    redundancy (every pair gathers from the same table), so they are
    built on the DEVICE by a one-hot matmul at dispatch — the host never
    materializes or ships the (B, Qp, A) tensor.

    Batches built by :func:`pack_pairs` additionally carry the raw
    ``qbytes``/``rbytes`` (uint8) and the matrix ``mapper``: the Pallas
    route ships THOSE (4x smaller than int32 indices) and encodes inside
    its fused jit, so a batch costs one device dispatch.  ``qidx`` /
    ``ridx`` encode lazily (cached) for the routes that want indices.
    """

    def __init__(self, profile, qidx, ridx, qlen, rlen, table=None,
                 qbytes=None, rbytes=None, mapper=None):
        self.profile = profile       # (B or 1, Qp, A) int32, or None
        self._qidx = qidx            # (B or 1, Qp) int32 (lazy if None)
        self._ridx = ridx            # (B, Rp) int32 (lazy if None)
        self.qlen = np.asarray(qlen)             # (B,) int32
        self.rlen = np.asarray(rlen)             # (B,) int32
        self.table = table           # (A, A) int32 when profile is None
        self.qbytes = qbytes         # (B, Qp) uint8 raw sequence bytes
        self.rbytes = rbytes         # (B, Rp) uint8
        self.mapper = mapper         # (256,) int32 byte -> index

    @property
    def qidx(self):
        if self._qidx is None:
            self._qidx = _device_encode(
                self.mapper, self.qbytes, self.qlen, -1)
        return self._qidx

    @property
    def ridx(self):
        if self._ridx is None:
            self._ridx = _device_encode(
                self.mapper, self.rbytes, self.rlen, 0)
        return self._ridx

    @property
    def size(self) -> int:
        return int(self.qlen.shape[0])

    @property
    def qp(self) -> int:
        src = self._qidx if self._qidx is not None else self.qbytes
        return int(src.shape[1])

    @property
    def rp(self) -> int:
        src = self._ridx if self._ridx is not None else self.rbytes
        return int(src.shape[1])

    @property
    def shared_query(self) -> bool:
        """True for profile-reuse batches (one query, broadcast)."""
        return self._qidx is not None and self._qidx.shape[0] == 1

    def to_device(self) -> "PairBatch":
        """Commit the symbol planes to the device ONCE, in place.

        Paths that feed the planes to MULTIPLE jits (trace kernel +
        device walk, or kernel + lazy ``qidx`` encode) would otherwise
        re-upload the same numpy arrays per call — each h2d of a
        (4096, 160) uint8 plane costs ~40 ms through the degraded dev
        channel (probe 2026-08-20), dominating align_cigars e2e.  A
        committed jax array is reused by every consumer for free.
        """
        import jax

        qb, rb = self.qbytes, self.rbytes
        if (isinstance(qb, np.ndarray) and isinstance(rb, np.ndarray)
                and qb.shape[0] == rb.shape[0]):
            # one upload, sliced on device: each degraded-channel h2d
            # pays a fixed ~12-25 ms on top of bandwidth
            cat = jax.device_put(np.concatenate([qb, rb], axis=1))
            self.qbytes = cat[:, :qb.shape[1]]
            self.rbytes = cat[:, qb.shape[1]:]
            return self
        if isinstance(qb, np.ndarray):
            self.qbytes = jax.device_put(qb)
        if isinstance(rb, np.ndarray):
            self.rbytes = jax.device_put(rb)
        return self

    @property
    def score_values(self) -> np.ndarray:
        return self.table if self.table is not None else self.profile


def commit_batches(batches: list["PairBatch"]) -> None:
    """Commit many batches' symbol planes with ONE h2d upload.

    ``align_many`` launches one kernel per shape bin; a per-bin
    ``to_device()`` pays the dev channel's fixed per-upload cost (and
    its serialization against every other transfer) once per bin — the
    dominant term of the mixed-length config's fetch wait (cfg5 stages
    2026-08-20: 77 ms of a 105 ms call).  Concatenating every bin's
    planes into one flat uint8 buffer costs one upload; the per-bin
    views are device-side slices (lazy, overlap-friendly).
    """
    import jax

    host = []
    for b in batches:
        for attr in ("qbytes", "rbytes"):
            v = getattr(b, attr)
            if isinstance(v, np.ndarray):
                host.append((b, attr, v))
    if not host:
        return
    if len({id(b) for b, _, _ in host}) == 1:
        # a single batch: to_device() already concatenates its planes
        host[0][0].to_device()
        return
    flat = np.concatenate([v.reshape(-1) for _, _, v in host])
    dev = jax.device_put(flat)
    off = 0
    for b, attr, v in host:
        n = v.size
        setattr(b, attr, dev[off:off + n].reshape(v.shape))
        off += n


def build_batch(
    prows_list: list[np.ndarray],
    qidx_list: list[np.ndarray],
    ridx_list: list[np.ndarray],
    Qp: int | None = None,
    Rp: int | None = None,
    shared_query: bool = False,
) -> PairBatch:
    """Pack per-pair (rows, qidx, ridx) into one padded batch.

    ``prows_list[b]`` is the (qlen_b, A) profile-row block of pair ``b``
    (see engine.profile.profile_rows); alphabet width A must agree across
    the batch (one matrix per batch, as in the reference Aligner).

    ``shared_query=True`` (profile reuse: one query vs many references)
    stores the profile/qidx once as (1, Qp, ...) — the kernels broadcast
    — so a 100k-reference batch ships kilobytes of query data, not
    gigabytes.
    """
    B = len(ridx_list)
    A = prows_list[0].shape[1]
    Qp = Qp or length_bucket(max(p.shape[0] for p in prows_list))
    Rp = Rp or length_bucket(max(len(r) for r in ridx_list))
    Bq = 1 if shared_query else B
    profile = np.zeros((Bq, Qp, A), dtype=np.int32)
    qidx = np.full((Bq, Qp), -1, dtype=np.int32)
    ridx = np.zeros((B, Rp), dtype=np.int32)
    qlen = np.zeros(B, dtype=np.int32)
    rlen = np.zeros(B, dtype=np.int32)
    for b, (prow, qi, ri) in enumerate(zip(prows_list, qidx_list, ridx_list)):
        ql, rl = prow.shape[0], len(ri)
        if b < Bq:
            profile[b, :ql] = prow
            # padded query lanes must never count as matches: point them
            # at an index (-1) that no reference index can take
            qidx[b, :ql] = qi
        ridx[b, :rl] = ri
        qlen[b], rlen[b] = ql, rl
    return PairBatch(profile=profile, qidx=qidx, ridx=ridx, qlen=qlen, rlen=rlen)


def _pack_side(seqs, P):
    """Sequences -> (padded (B, P') uint8, (B,) int32 lens, P').

    The native single-pass packer (native/packer.py: PyBytes header
    reads + memcpy) serves list[bytes] directly; anything else is
    normalized to bytes and retried, and the numpy join + masked-scatter
    formulation remains as the no-compiler fallback.
    """
    from ..errors import InteriorNulByte
    from ..native import packer

    packed = packer.pack_side(seqs, P, length_bucket)
    if packed is None:
        # normalize once (str/bytearray/etc -> bytes) and retry the fast
        # path; the normalized list also feeds the numpy fallback below
        seqs = [s.encode() if isinstance(s, str)
                else (s if type(s) is bytes else bytes(s)) for s in seqs]
        packed = packer.pack_side(seqs, P, length_bucket)
    if packed is not None:
        return packed
    B = len(seqs)
    joined = b"".join(seqs)
    if 0 in joined:
        raise InteriorNulByte("sequence contains an interior NUL byte")
    lens = np.fromiter((len(s) for s in seqs), np.int32, B)
    P = P or length_bucket(int(lens.max()) if B else 1)
    mask = np.arange(P)[None, :] < lens[:, None]
    padded = np.zeros((B, P), np.uint8)
    padded[mask] = np.frombuffer(joined, np.uint8)
    return padded, lens, P


def pack_pairs(
    matrix,
    queries,
    references,
    profile=None,
    Qp: int | None = None,
    Rp: int | None = None,
):
    """Vectorized byte-sequences -> PairBatch (the production host path).

    One native packing pass per side (or the numpy join + masked-scatter
    fallback) replaces the per-pair encode/pad loops.  ``profile`` set
    means profile reuse: query tensors stored once.

    Returns (batch, qlens list, rlens list).
    """
    B = len(references)
    with stages.stage("pack"), gc_pause(B):
        return _pack_pairs_inner(matrix, queries, references, profile,
                                 Qp, Rp, B)


def _pack_pairs_inner(matrix, queries, references, profile, Qp, Rp, B):
    rbytes, rlens, Rp = _pack_side(references, Rp)
    # mapper lookup runs ON DEVICE: the batch ships packed uint8 bytes
    # (4x less transfer) and the host never pays the gather.  The Pallas
    # route encodes INSIDE its fused jit; PairBatch.ridx encodes lazily
    # for everyone else.
    qbytes = None

    if profile is not None:
        ql = profile.query_len
        Qp = Qp or length_bucket(ql)
        A = profile.rows.shape[1]
        prof = np.zeros((1, Qp, A), np.int32)
        prof[0, :ql] = profile.rows
        qidx = np.full((1, Qp), -1, np.int32)
        qidx[0, :ql] = profile.qidx
        qlens = np.full(B, ql, np.int32)
    else:
        if len(queries) != B:
            raise ValueError("queries and references must have equal length")
        qbytes, qlens, Qp = _pack_side(queries, Qp)
        # padded query lanes must never count as matches (fill -1);
        # encoding is lazy (PairBatch.qidx)
        qidx = None
        A = matrix.size
        if matrix.is_square:
            # Device-side profile: ship only qidx + the (A, A) table.
            prof = None
        else:
            # PSSM rows are position-indexed — identical for every pair,
            # so store them once; the kernels broadcast.
            rows = np.take(matrix.data, np.arange(Qp) % matrix.length,
                           axis=0).astype(np.int32, copy=False)
            prof = np.ascontiguousarray(rows)[None]
    batch = PairBatch(
        profile=prof, qidx=qidx, ridx=None,
        qlen=np.asarray(qlens), rlen=np.asarray(rlens),
        table=np.ascontiguousarray(matrix.data, dtype=np.int32)
        if prof is None else None,
        qbytes=qbytes, rbytes=rbytes,
        mapper=np.asarray(matrix.mapper, np.int32))
    return batch, qlens.tolist(), rlens.tolist()


_ENCODE_JIT = None


def _device_encode(mapper, bytes2d, lens, fill):
    """uint8 sequence bytes -> masked int32 indices, on device."""
    global _ENCODE_JIT
    import jax
    import jax.numpy as jnp

    if _ENCODE_JIT is None:
        @jax.jit
        def enc(mapper, b2d, lens, fill):
            mask = (jnp.arange(b2d.shape[1], dtype=jnp.int32)[None, :]
                    < lens[:, None])
            idx = jnp.take(mapper, b2d.astype(jnp.int32))
            return jnp.where(mask, idx, fill)

        _ENCODE_JIT = enc
    return _ENCODE_JIT(
        jnp.asarray(mapper, jnp.int32), bytes2d,
        jnp.asarray(lens, jnp.int32), jnp.asarray(fill, jnp.int32))


INT32_SAFE = (1 << 31) - 1


def width64_risk(batch: PairBatch, gap_open: int,
                 gap_extend: int) -> np.ndarray:
    """Indices of pairs whose worst-case |H| could exceed int32.

    Per-pair bound: |H| <= (max|s| + open + ext) * (qlen + rlen) — every
    DP step changes H by at most one substitution plus one gap term.
    Conservative (a pair under the bound can NEVER overflow int32), so
    the int32 kernels serve everything not flagged here and only flagged
    pairs pay the exact int64 host fill.
    """
    smax = int(np.abs(np.asarray(batch.score_values)).max())
    per = smax + abs(int(gap_open)) + abs(int(gap_extend))
    bound = per * (batch.qlen.astype(np.int64) +
                   batch.rlen.astype(np.int64))
    return np.nonzero(bound > INT32_SAFE)[0]


def _golden64_merge(out: dict, batch: PairBatch, idx: np.ndarray, *,
                    gap_open, gap_extend, mode, free, outputs) -> dict:
    """Overwrite the int32 kernel results of ``idx`` pairs with an exact
    int64 scalar golden fill (golden/model.py computes in int64).

    Scalar/table/rowcol planes are upcast to int64 so merged scores
    survive; trace flags stay int8 (flag encoding is width-free).
    """
    from ..golden import model as golden

    qidx_all = np.asarray(batch.qidx)
    ridx_all = np.asarray(batch.ridx)
    prof = None if batch.profile is None else np.asarray(batch.profile)
    table = None if batch.table is None else np.asarray(batch.table)
    # writable copies: kernel outputs can be read-only views of device
    # buffers; int planes upcast to int64 so merged scores survive
    out = {k: (np.array(v) if v.dtype == np.int8
               or k in ("saturated", "promoted")
               else v.astype(np.int64))
           for k, v in out.items()}
    stats_keys = ("matches", "similar", "length")
    for b in idx.tolist():
        ql, rl = int(batch.qlen[b]), int(batch.rlen[b])
        qi = qidx_all[0 if qidx_all.shape[0] == 1 else b, :ql]
        ri = ridx_all[b, :rl]
        if table is not None:
            sub = table[qi[:, None], ri[None, :]].astype(np.int64)
        else:
            p = prof[0 if prof.shape[0] == 1 else b, :ql]
            sub = p[np.arange(ql)[:, None], ri[None, :]].astype(np.int64)
        g = golden.align(sub, qi[:, None] == ri[None, :],
                         int(gap_open), int(gap_extend), mode, free)
        out["score"][b] = g.score
        out["end_query"][b] = g.end_query
        out["end_ref"][b] = g.end_ref
        if "saturated" in out:
            out["saturated"][b] = False     # int64 fill cannot saturate
        for k in stats_keys:
            if k in out:
                out[k][b] = getattr(g, k)
        for k in list(out):
            if k.endswith("_table") and k != "trace_table":
                out[k][b] = 0
                out[k][b, :ql, :rl] = getattr(g, k)
            elif k.endswith("_row"):
                out[k][b] = 0
                out[k][b, :rl] = getattr(g, k)
            elif k.endswith("_col"):
                out[k][b] = 0
                out[k][b, :ql] = getattr(g, k)
        if "trace_table" in out:
            out["trace_table"][b] = 0
            out["trace_table"][b, :ql, :rl] = g.trace_table
    return out


def execute(
    batch: PairBatch,
    *,
    gap_open: int,
    gap_extend: int,
    mode: str,
    free: tuple[bool, bool, bool, bool],
    outputs: str,
    width: str,
    fetch: bool = True,
    on_fallback=None,
) -> dict[str, np.ndarray]:
    """Run the wavefront kernel over a batch; fetch host numpy results.

    ``width`` follows the reference grammar {sat,8,16,32,64} (parasail's
    ``_64`` kernels: src/aligner/mod.rs:331).  64 runs the int32 kernels
    for every pair whose worst-case |H| bound fits int32 — on TPU there
    is no native 64-bit integer datapath — and pairs whose bound does
    not fit are re-filled exactly in int64 by the scalar golden model
    and merged back (:func:`width64_risk`).  Sane inputs never trip the
    bound, so the honest knob costs nothing in practice.

    ``on_fallback(route, reason)`` is invoked whenever the batch does not
    take the one-shot Pallas route (it lands on "stream" or "wavefront");
    the same event is logged and tallied in :data:`ROUTE_COUNTS`.
    """
    from ..utils import profiling

    if width == "64":
        wide = width64_risk(batch, gap_open, gap_extend)
        if wide.size:
            log.warning(
                "width='64': %d pair(s) exceed the int32 score bound; "
                "re-filling them exactly in int64 on the host (scalar "
                "golden model)", wide.size)
            out = execute(batch, gap_open=gap_open, gap_extend=gap_extend,
                          mode=mode, free=free, outputs=outputs,
                          width="32", fetch=True, on_fallback=on_fallback)
            out = _golden64_merge(out, batch, wide, gap_open=gap_open,
                                  gap_extend=gap_extend, mode=mode,
                                  free=free, outputs=outputs)
            return out if fetch else PendingResult(device_out=out)
    kernel_width = {"64": "32"}.get(width, width)
    with profiling.trace_region(f"pt.execute.{mode}.{outputs}"):
        route, reason = plan_route(batch, outputs, gap_open, gap_extend)
        ROUTE_COUNTS[(route, reason)] += 1
        if route not in ("pallas", "trace_walk"):
            log.info(
                "batch (B=%d, Qp=%d, Rp=%d, %s/%s) routed to %s: %s",
                batch.size, batch.qp, batch.rp, mode, outputs,
                route, reason)
            if on_fallback is not None:
                on_fallback(route, reason)
        if route == "trace_walk":
            res = _execute_stats_via_walk(
                batch, gap_open=gap_open, gap_extend=gap_extend,
                mode=mode, free=free, width=kernel_width)
            if not fetch:
                return res
            out = res.fetch()
        elif route == "stream_walk":
            out = _execute_stats_via_stream_walk(
                batch, gap_open=gap_open, gap_extend=gap_extend,
                mode=mode, free=free, width=kernel_width)
            if not fetch:
                return PendingResult(device_out=dict(out))
        elif route == "stream":
            out = _execute_streamed_or_fallback(
                batch, gap_open=gap_open, gap_extend=gap_extend,
                mode=mode, free=free, width=kernel_width, outputs=outputs)
            if not fetch:
                return PendingResult(device_out=out)
        elif route == "pallas":
            res = _execute_pallas_or_fallback(
                batch, gap_open=gap_open, gap_extend=gap_extend,
                mode=mode, free=free, width=kernel_width, outputs=outputs,
                fetch=fetch,
            )
            if not fetch:
                # async mode: dispatch is enqueued; the caller fetches
                # via PendingResult.fetch() when it needs values
                return res
            out = res
        else:
            out = _wavefront_exec(
                batch, gap_open=gap_open, gap_extend=gap_extend,
                mode=mode, free=free, outputs=outputs, width=kernel_width)
            if not fetch:
                return PendingResult(device_out=dict(out))
        return {k: np.asarray(v) for k, v in out.items()}


_PROFILE_JIT = None


def _device_profile(profile, table, qidx):
    """Materialize the per-pair profile rows ON DEVICE when the batch
    carries only the square substitution table: one one-hot MXU matmul
    replaces a (B, Qp, A) host tensor (hundreds of MB for big batches).

    The jitted builder is a module-level singleton — a per-call closure
    would retrace on every batch (~800 ms through the dev tunnel),
    dwarfing the kernel itself.
    """
    if table is None:
        return profile
    global _PROFILE_JIT
    import jax
    import jax.numpy as jnp

    if _PROFILE_JIT is None:
        @jax.jit
        def build(table, qidx):
            oh = jax.nn.one_hot(jnp.clip(qidx, 0, table.shape[0] - 1),
                                table.shape[0], dtype=jnp.float32)
            return jnp.einsum(
                "bqa,ac->bqc", oh, table.astype(jnp.float32),
                preferred_element_type=jnp.float32).astype(jnp.int32)

        _PROFILE_JIT = build
    return _PROFILE_JIT(jnp.asarray(table, jnp.int32), jnp.asarray(qidx))


def _pallas_gate(batch: PairBatch, outputs: str, gap_open: int,
                 gap_extend: int) -> tuple[bool, str]:
    """(eligible?, reason-if-not) for the one-shot Pallas scan route.

    Requirements (see ops/scan_kernel.py): int8-safe substitution
    scores, and a TPU backend (or PT_FORCE_PALLAS=1: runs interpreted —
    test use).  Value outputs are exact for ANY penalty pair (the
    vertical prefix scan runs at slope min(open, ext), which is the
    golden recurrence's closed form); stats payloads need strict
    open > ext — gap-restart value ties otherwise route accumulators
    through comparisons the one-pass argmax scan cannot observe.
    """
    if outputs in ("stats", "stats_table", "stats_rowcol") and \
            gap_open <= gap_extend:
        return False, "gap_open <= gap_extend with stats (tie semantics)"
    if batch.score_values.min() < -128 or batch.score_values.max() > 127:
        return False, "substitution scores exceed int8 range"
    # Memory gates.  VMEM feasibility (tile plan incl. chunked-query
    # down-state) is computed by the kernel module; HBM is bounded by the
    # kernel input — the packed letter-indexed profile (G-select,
    # Bpad*Qp*ceil(A/4)*4 bytes) or the (B, Rp, Qp) substitution tensor
    # (scol fallback) — plus cell-sized output planes for trace/table.
    # Beyond these the streamed scan kernel takes over.
    from ..ops.scan_kernel import _gsel, _npk, scan_fits

    Qp, Rp = batch.qp, batch.rp
    A = int(batch.score_values.shape[-1])
    if not scan_fits(Qp, Rp, outputs, A=A):
        return False, f"shape ({Qp}x{Rp}, {outputs}) exceeds the VMEM plan"
    Bpad = (batch.size + 127) // 128 * 128
    cell_bytes = Bpad * Qp * Rp
    in_bytes = Bpad * Qp * _npk(A) * 4 if _gsel(A) else cell_bytes
    out_bytes = {"trace": 2, "table": 4, "stats_table": 16}.get(
        outputs, 0) * cell_bytes
    if in_bytes + out_bytes > 2 << 30:
        return False, "substitution/output tensors exceed the HBM budget"
    if os.environ.get("PT_FORCE_PALLAS") == "1":
        return True, ""
    import jax

    if jax.default_backend() != "tpu":
        return False, f"backend is {jax.default_backend()}, not tpu"
    return True, ""


def _use_pallas(batch: PairBatch, outputs: str, gap_open: int,
                gap_extend: int) -> bool:
    return _pallas_gate(batch, outputs, gap_open, gap_extend)[0]


def plan_route(batch: PairBatch, outputs: str, gap_open: int,
               gap_extend: int) -> tuple[str, str]:
    """Pick the execution route for a batch.

    Returns ("pallas" | "trace_walk" | "stream" | "wavefront", reason).
    The reason is empty for "pallas" and explains what disqualified the
    faster route(s) otherwise.  "trace_walk" is the device route for
    stats at gap_open <= gap_extend: the one-pass stats kernel cannot
    reproduce golden's restart-wins payload ties there, but the trace
    kernel's flag planes are exact for every penalty pair, so the stats
    are counted along the device traceback walk instead
    (ops/trace_walk.device_walk_stats) — still entirely on device.

    Side effect: the "stream_walk" gate probes ``native.walker._load()``,
    which on FIRST use may compile the C++ walker (a one-time
    subprocess; cached thereafter).  ``AlignerBuilder.build()`` warms it
    in the background for stats aligners so the first ``align`` call
    does not pay it inline.
    """
    ok, reason = _pallas_gate(batch, outputs, gap_open, gap_extend)
    if ok:
        return "pallas", ""
    if outputs == "stats" and gap_open <= gap_extend and \
            _pallas_gate(batch, "trace", gap_open, gap_extend)[0] and \
            batch.qp + batch.rp <= WAVEFRONT_TPU_MAX_SPAN:
        return "trace_walk", "stats via trace flags + device walk " \
            "(gap_open <= gap_extend payload ties)"
    if outputs == "stats" and gap_open <= gap_extend and \
            _use_streaming(batch, "trace", gap_open, gap_extend):
        from ..native import walker

        if walker._load() is not None:
            return "stream_walk", (
                "stats via streamed trace plane + native host walk "
                "(gap_open <= gap_extend beyond the one-shot envelope)")
    if outputs in ("score", "stats", "trace") and \
            _use_streaming(batch, outputs, gap_open, gap_extend):
        return "stream", reason
    return "wavefront", reason


def scan_scalar_names(width: str, stats: bool) -> tuple[str, ...]:
    """The per-pair scalar output names of ``scan_score_align``, sorted —
    computed statically from the dispatch key so no trace-time
    side-channel is needed (the packed-scalar layout is part of the
    jitted function's contract)."""
    names = {"saturated", "score", "end_query", "end_ref"}
    if width == "sat":
        names.add("promoted")
    if stats:
        names.update({"matches", "similar", "length"})
    return tuple(sorted(names))


_SCAN_JIT_CACHE: dict = {}


def _scan_exec_fn(table_path, qbytes_path, rbytes_path, stats, mode, free,
                  width, outputs, banded, interpret, hmax_bound=None):
    """One jitted function covering the whole device path of a Pallas
    dispatch: byte->index encode (bytes paths ship raw uint8, 4x less
    transfer), device-side profile construction (table path), the scan
    kernel, and packing of the per-pair scalar outputs into a single
    array so the host pays ONE fetch round-trip instead of one per
    output.  Eagerly dispatching these ops one by one costs a tunnel
    round-trip each (~100+ ms per batch on the dev TPU)."""
    key = (table_path, qbytes_path, rbytes_path, stats, mode, free, width,
           outputs, banded, interpret, hmax_bound)
    if key in _SCAN_JIT_CACHE:
        return _SCAN_JIT_CACHE[key]
    import jax
    import jax.numpy as jnp

    from ..ops.scan_kernel import (_gsel, build_gpack_from_table,
                                   scan_score_align)

    names = scan_scalar_names(width, stats)

    def fn(prof_or_table, qarg, rarg, mapper, qlen, rlen, open_, ext,
           bandwidth):
        if qbytes_path:
            qm = (jnp.arange(qarg.shape[1], dtype=jnp.int32)[None, :]
                  < qlen[:, None])
            qidx = jnp.where(qm, jnp.take(mapper, qarg.astype(jnp.int32)),
                             -1)
        else:
            qidx = qarg
        if rbytes_path:
            rm = (jnp.arange(rarg.shape[1], dtype=jnp.int32)[None, :]
                  < rlen[:, None])
            ridx = jnp.where(rm, jnp.take(mapper, rarg.astype(jnp.int32)),
                             0)
        else:
            ridx = rarg
        gp = None
        alphabet = None
        if table_path:
            table = prof_or_table
            A = table.shape[0]
            if _gsel(A):
                # letter-indexed packed profile straight from the table —
                # the per-pair (B, Qp, A) profile never materializes
                gp = build_gpack_from_table(table, qidx)
                prof = None
                alphabet = A
            else:
                oh = jax.nn.one_hot(jnp.clip(qidx, 0, A - 1),
                                    A, dtype=jnp.float32)
                prof = jnp.einsum(
                    "bqa,ac->bqc", oh, table.astype(jnp.float32),
                    preferred_element_type=jnp.float32).astype(jnp.int32)
        else:
            prof = prof_or_table
        out = scan_score_align(
            prof, ridx, qlen, rlen, qidx if stats else None,
            open_=open_, ext=ext, mode=mode, free=free, width=width,
            outputs=outputs, banded=banded, bandwidth=bandwidth,
            interpret=interpret, hmax_bound=hmax_bound,
            gpack=gp, alphabet=alphabet)
        scalars = {k: v for k, v in out.items() if v.ndim == 1}
        big = {k: v for k, v in out.items() if v.ndim > 1}
        assert tuple(sorted(scalars)) == names, (
            "scan kernel scalar outputs drifted from scan_scalar_names(): "
            f"{tuple(sorted(scalars))} != {names}")
        packed = jnp.stack([scalars[k].astype(jnp.int32) for k in names])
        return packed, big

    jitted = jax.jit(fn)
    _SCAN_JIT_CACHE[key] = (jitted, names)
    return jitted, names


class PendingResult:
    """Device-side result of an asynchronous dispatch.

    Holds jax arrays (dispatch already enqueued); :meth:`fetch` blocks on
    the device and returns host numpy arrays.  The Pallas route keeps its
    per-pair scalars packed in one array so fetch() pays a single
    transfer round-trip.
    """

    def __init__(self, device_out=None, packed_form=None):
        self._device_out = device_out          # dict of jax arrays
        self._packed = packed_form             # (names, packed, big, B)

    def start_transfer(self) -> "PendingResult":
        """Begin the device->host copy without blocking.

        The runtime streams each array to the host as soon as its
        producing kernel finishes, so a later :meth:`fetch` finds the
        bytes already local.  With several results in flight (align_many
        bins, StreamingAligner buckets) the transfer round-trips overlap
        each other and the remaining device compute instead of
        serializing one blocking RTT per result — on the dev tunnel that
        RTT is ~100ms, ~20x the kernel time of an 8192-pair batch.
        """
        arrays = ([self._packed[1], *self._packed[2].values()]
                  if self._packed is not None
                  else list(self._device_out.values()))
        for a in arrays:
            copy = getattr(a, "copy_to_host_async", None)
            if copy is not None:
                copy()
        return self

    def fetch(self) -> dict[str, np.ndarray]:
        with stages.stage("fetch"):
            if self._packed is not None:
                names, packed, big, B = self._packed
                return _unpack_scalars(names, np.asarray(packed), big, B)
            return {k: np.asarray(v) for k, v in self._device_out.items()}


def fetch_all(pendings: list["PendingResult"]) -> list[dict]:
    """Fetch many pending results with ONE device->host transfer.

    When every pending holds a packed scalar form with the same output
    names and no cell-sized planes (score/stats classes), their packed
    arrays concatenate device-side into one array and the host pays a
    single transfer round-trip instead of one per launch — on the dev
    tunnel each round-trip costs ~60-115ms regardless of size, so an
    8-bin align_many collapses ~0.5s of serialized RTTs into one.
    Falls back to per-pending fetch for mixed or cell-sized results.
    """
    if len(pendings) > 1:
        forms = [p._packed for p in pendings]
        if all(f is not None and not f[2] and f[0] == forms[0][0]
               for f in forms):
            import jax.numpy as jnp

            names = forms[0][0]
            with stages.stage("fetch"):
                host = np.asarray(jnp.concatenate([f[1] for f in forms],
                                                  axis=1))
            outs = []
            off = 0
            for f in forms:
                bp = f[1].shape[1]
                outs.append(_unpack_scalars(
                    names, host[:, off:off + bp], {}, f[3]))
                off += bp
            return outs
    for p in pendings:          # mixed forms: at least overlap the RTTs
        p.start_transfer()
    return [p.fetch() for p in pendings]


def _unpack_scalars(names, packed, big, B):
    bools = ("saturated", "promoted")
    out = {k: (packed[i, :B] != 0 if k in bools else packed[i, :B])
           for i, k in enumerate(names)}
    for k, v in big.items():
        out[k] = np.asarray(v)[:B]
    return out


def _execute_pallas(batch, *, gap_open, gap_extend, mode, free, width,
                    outputs="score", banded=False, bandwidth=0,
                    fetch=True):
    from ..ops.scan_kernel import LANES
    import jax

    B = batch.size
    Bp = ((B + LANES - 1) // LANES) * LANES
    pad = Bp - B

    def padb(x):
        if pad == 0:
            return x
        # pad on DEVICE: uploading host-padded rows ships up to 5x the
        # actual bytes (a 25-pair bin pads to 128 lanes), and the dev
        # channel charges ~45 MB/s + fixed per-upload cost; jnp.pad on
        # the unpadded upload is device-side and free by comparison
        # (np.pad's python machinery also cost ~0.7 ms/call, cfg5
        # profile 2026-08-20)
        import jax.numpy as jnp

        return jnp.pad(jnp.asarray(x), [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    shared = batch.shared_query
    stats = outputs in ("stats", "stats_table", "stats_rowcol")
    table_path = batch.table is not None
    qbytes_path = table_path and batch.qbytes is not None
    rbytes_path = batch.rbytes is not None
    if qbytes_path:
        qarg = padb(batch.qbytes)
    else:
        qarg = batch.qidx if shared else padb(batch.qidx)
    rarg = padb(batch.rbytes if rbytes_path else batch.ridx)
    mapper = (batch.mapper if (qbytes_path or rbytes_path)
              else np.zeros(256, np.int32))
    fn, names = _scan_exec_fn(table_path, qbytes_path, rbytes_path, stats,
                              mode, free, width, outputs, banded,
                              jax.default_backend() != "tpu",
                              hmax_bound=_hmax_bound(batch, gap_open,
                                                     gap_extend))
    with stages.stage("dispatch"):
        packed, big = fn(
            batch.table if table_path else
            (batch.profile if shared else padb(batch.profile)),
            qarg, rarg, mapper, padb(batch.qlen), padb(batch.rlen),
            np.int32(gap_open), np.int32(gap_extend),
            np.int32(bandwidth or 0))
    if not fetch:
        return PendingResult(packed_form=(names, packed, big, B))
    with stages.stage("fetch"):
        return _unpack_scalars(names, np.asarray(packed), big, B)


def _hmax_bound(batch, gap_open, gap_extend):
    """Static upper bound on |H| over every DP cell of the batch,
    quantized up to a power of two (so distinct matrices/gap regimes
    mostly share one compiled kernel).  Every cell satisfies
    |H| <= (max|s| + open + ext) * (Qp + Rp): positive values gain at
    most max|s| per diagonal step, negative values lose at most
    open + ext + max|s| per step over <= Qp + Rp steps.  Feeds the
    packed candidate tracker gate (ops/scan_kernel.py:cand_pack_params).
    """
    smax = int(max(abs(int(batch.score_values.min())),
                   abs(int(batch.score_values.max()))))
    raw = (smax + int(gap_open) + int(gap_extend)) * (batch.qp + batch.rp)
    return 1 << max(1, raw - 1).bit_length()


# Reference columns per streamed segment.  Larger segments amortize the
# per-segment state round-trip — on hardware a 16kbp score batch runs
# 37.2 GCUPS at 8192-column segments vs 30.4 at 2048 — but every
# chunk-boundary down-state plane in VMEM is (segment, LANES) int32, so
# stats and trace only fit smaller segments.  The pack2 [m|s] layout
# cut the stats down-state 8 -> 6 planes, which admits 2560-3072-column
# stats segments; measured on hardware (tools/bench_stream.py,
# 128 x 16kbp, 2026-08-19): 2048 -> 14.8 GCUPS, 2560 -> 16.7,
# 3072 -> 16.4 (plateau) — 2560 is the knee.  Beyond that the streamed
# stats kernel is bound by its per-column live set (34 slabs with pack2
# vs 20 with the one-shot [m|s|l] pack, which cannot apply across
# segments: the l field accumulates over the full reference and its
# bit-field no longer fits int32), not by segment overhead.
STREAM_SEG = 2048
STREAM_SEG_STATS = 2560


def stream_seg(outputs: str, qp: int | None = None, A: int = 32) -> int:
    """Reference columns per streamed segment for this output class.

    For stats the larger pack2-enabled segment is used whenever the
    VMEM plan admits it for this query size (it always does for
    qp <= 16k with pack2; very long chunked queries can fall back).
    """
    env = os.environ.get("PT_STREAM_SEG")
    if env:
        return int(env)
    if outputs == "score":
        return 8192
    if outputs == "stats" and qp is not None:
        from ..ops.scan_kernel import scan_fits_stream

        if scan_fits_stream(qp, STREAM_SEG_STATS, "stats", A=A):
            return STREAM_SEG_STATS
    return STREAM_SEG


def _use_streaming(batch: PairBatch, outputs: str, gap_open: int,
                   gap_extend: int) -> bool:
    """Score/stats batches too large for one substitution tensor stream
    reference segments through the resumable scan kernel instead of
    falling to the (orders-of-magnitude slower on TPU) wavefront."""
    from ..ops.scan_kernel import scan_fits_stream

    if outputs == "stats" and gap_open <= gap_extend:
        return False
    if batch.score_values.min() < -128 or batch.score_values.max() > 127:
        return False
    from ..ops.scan_kernel import _gsel, _npk

    A = int(batch.score_values.shape[-1])
    seg = stream_seg(outputs, qp=batch.qp, A=A)
    if not scan_fits_stream(batch.qp, seg, outputs, A=A):
        return False
    # The streamed input must fit the same HBM budget as the one-shot
    # route's gate.  G-select (the default) ships only the packed
    # letter-indexed profile (Bpad, npk, Qp, LANES) — segment-invariant
    # and 4*npk bytes per query cell; the legacy scol path materializes
    # a per-segment (Bpad, Qp, seg) int8 substitution tensor.
    Bpad = (batch.size + 127) // 128 * 128
    in_bytes = (Bpad * batch.qp * _npk(A) * 4 if _gsel(A)
                else Bpad * batch.qp * seg)
    if in_bytes > 2 << 30:
        return False
    if outputs == "trace":
        # the assembled host flag plane must stay within reason
        if Bpad * batch.qp * batch.rp > 4 << 30:
            return False
    if os.environ.get("PT_FORCE_PALLAS") == "1":
        return True
    import jax

    return jax.default_backend() == "tpu"


def _execute_pallas_streamed(batch, *, gap_open, gap_extend, mode, free,
                             width, outputs="score"):
    from ..ops.scan_kernel import (LANES, _gsel, build_gpack,
                                   build_gpack_from_table,
                                   scan_score_segment)
    import jax
    import jax.numpy as jnp

    B = batch.size
    Bp = ((B + LANES - 1) // LANES) * LANES
    pad = Bp - B

    def padb(x):
        if pad == 0:
            return x
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        if isinstance(x, np.ndarray):
            return np.pad(x, widths)
        return jnp.pad(x, widths)

    shared = batch.shared_query
    qidx = batch.qidx if shared else padb(batch.qidx)
    A = int(batch.score_values.shape[-1])
    gp = None
    prof = None
    if _gsel(A):
        # the packed profile is letter-indexed — identical for every
        # reference segment, so build it ONCE (and for square matrices
        # the per-pair profile tensor never materializes at all)
        if batch.table is not None:
            gp = build_gpack_from_table(
                jnp.asarray(batch.table, jnp.int32), qidx)
        else:
            gp = build_gpack(jnp.asarray(
                batch.profile if shared else padb(batch.profile),
                jnp.int32))
    else:
        prof = _device_profile(
            None if batch.profile is None else
            (batch.profile if shared else padb(batch.profile)),
            batch.table, qidx)
    ridx = padb(batch.ridx)
    qlen = padb(batch.qlen)
    rlen = padb(batch.rlen)
    Rp = ridx.shape[1]

    seg = stream_seg(outputs, qp=int(qidx.shape[1]), A=A)
    nseg = (Rp + seg - 1) // seg
    if Rp % seg:
        ridx = jnp.pad(jnp.asarray(ridx),
                       ((0, 0), (0, nseg * seg - Rp)))
    state = None
    out = None
    trace_segs = []
    for si in range(nseg):
        out, state = scan_score_segment(
            prof, ridx[:, si * seg:(si + 1) * seg],
            qlen, rlen, state,
            qidx if outputs == "stats" else None,
            open_=np.int32(gap_open), ext=np.int32(gap_extend),
            mode=mode, free=free, width=width, outputs=outputs,
            col_offset=np.int32(si * seg), resume=si > 0,
            interpret=jax.default_backend() != "tpu",
            gpack=gp, alphabet=A if gp is not None else None,
        )
        if outputs == "trace":
            trace_segs.append(np.asarray(out.pop("trace_table_seg"))[:B])
    # keep scalar outputs as device arrays: every segment is already
    # enqueued, so an execute(fetch=False) caller (align_many bin
    # pipelining, StreamingAligner) can defer the blocking fetch
    res = {k: v[:B] for k, v in out.items()}
    if outputs == "trace":
        Rp_true = batch.rp
        res["trace_table"] = np.concatenate(
            trace_segs, axis=2)[:, :, :Rp_true]
    return res


_STATS_FUSE_JIT = {}


def _execute_stats_via_stream_walk(batch, *, gap_open, gap_extend, mode,
                                   free, width):
    """Stats for gap_open <= gap_extend BEYOND the one-shot trace
    envelope: streamed trace segments fill the host flag plane (exact
    for every penalty pair), the native OpenMP walker traces every pair
    back, and golden's matches/similar/length replay forward over the
    CIGAR runs with vectorized numpy per diagonal span.

    This upgrades the former fallback — the XLA wavefront, which beyond
    the TPU sequential-scan valve runs on the host CPU backend at
    ~100x the streamed kernel's cost — to streamed-kernel speed for
    every batch whose flag plane fits the streamed-trace host bound.
    Gated in plan_route on the native walker being available (a pure-
    Python plane walk at 16kbp would erase the win).
    """
    from ..native import walker

    out = _execute_streamed_or_fallback(
        batch, gap_open=gap_open, gap_extend=gap_extend, mode=mode,
        free=free, width=width, outputs="trace")
    out = {k: np.asarray(v) for k, v in out.items()}
    trace = out.pop("trace_table")
    B = batch.size
    qlens = [int(v) for v in batch.qlen]
    rlens = [int(v) for v in batch.rlen]
    # mapped symbol indices on HOST (no device fetch): the stats
    # semantics compare mapped indices (case/wildcard folding), and the
    # walker only needs byte buffers whose equality matches them
    mapper = np.asarray(batch.mapper, np.int32)
    if batch.qbytes is not None and isinstance(batch.qbytes, np.ndarray):
        qidx_h = np.take(mapper, batch.qbytes.astype(np.int32))
    else:
        qidx_h = np.asarray(batch.qidx)
    if batch.rbytes is not None and isinstance(batch.rbytes, np.ndarray):
        ridx_h = np.take(mapper, batch.rbytes.astype(np.int32))
    else:
        ridx_h = np.asarray(batch.ridx)
    shared_q = qidx_h.shape[0] == 1
    qrow = lambda b: qidx_h[0 if shared_q else b]
    qb_, _qe, db_, _de = (True,) * 4 if mode == "sw" else free
    qsyms = [np.clip(qrow(b)[:qlens[b]], 0, 255).astype(np.uint8)
             for b in range(B)]
    rsyms = [np.clip(ridx_h[b, :rlens[b]], 0, 255).astype(np.uint8)
             for b in range(B)]
    walked = walker.walk_batch(
        [trace[b, :qlens[b], :rlens[b]] for b in range(B)],
        qsyms, rsyms, out["end_query"].tolist(), out["end_ref"].tolist(),
        local=mode == "sw", qb=qb_, db=db_)
    if walked is None:  # library vanished between gate and call
        wf = _wavefront_exec(
            batch, gap_open=gap_open, gap_extend=gap_extend, mode=mode,
            free=free, outputs="stats", width=width)
        return {k: np.asarray(v) for k, v in wf.items()}
    table = (None if batch.table is None
             else np.asarray(batch.table, np.int64))
    prof = (None if batch.profile is None
            else np.asarray(batch.profile, np.int64))
    matches = np.zeros(B, np.int32)
    similar = np.zeros(B, np.int32)
    length = np.zeros(B, np.int32)
    for b in range(B):
        runs, bq, br = walked[b]
        i, j, m, s, ln = int(bq), int(br), 0, 0, 0
        qi = qrow(b)
        ri = ridx_h[b]
        for v in np.asarray(runs, np.uint32).tolist():
            n, op = v >> 4, v & 0xF
            ln += n
            if op in (7, 8):            # '=' / 'X': diagonal span
                qs_ = qi[i:i + n]
                rs_ = ri[j:j + n]
                m += int((qs_ == rs_).sum())
                if table is not None:
                    sv = table[np.clip(qs_, 0, table.shape[0] - 1), rs_]
                else:
                    p = prof[0 if prof.shape[0] == 1 else b]
                    sv = p[np.arange(i, i + n), rs_]
                s += int((sv > 0).sum())
                i += n
                j += n
            elif op == 1:               # I consumes query
                i += n
            elif op == 2:               # D consumes reference
                j += n
        matches[b], similar[b], length[b] = m, s, ln
    out.update(matches=matches, similar=similar, length=length)
    return out


def _execute_stats_via_walk(batch, *, gap_open, gap_extend, mode, free,
                            width):
    """Stats for gap_open <= gap_extend, entirely on device.

    Runs the TRACE kernel (value planes and flags are exact for every
    penalty pair), then counts golden's matches/similar/length along
    the device traceback walk (ops/trace_walk.device_walk_stats) — the
    flags encode exactly the payload tie decisions the one-pass stats
    kernel cannot observe.  The flag plane never leaves the device; the
    host fetches one packed scalar array with the standard stats-class
    names.  Returns a PendingResult (packed scalar form).
    """
    import jax.numpy as jnp

    from ..ops.trace_walk import device_walk_stats

    batch.to_device()   # kernel + lazy qidx/ridx encode share uploads
    pend = _execute_pallas_or_fallback(
        batch, gap_open=gap_open, gap_extend=gap_extend, mode=mode,
        free=free, width=width, outputs="trace", fetch=False)
    if pend._packed is not None:
        names, packed, big, B = pend._packed
        trace_dev = big["trace_table"]
        eq = packed[names.index("end_query")]
        er = packed[names.index("end_ref")]
        rows = {n: packed[i] for i, n in enumerate(names)}
    else:  # wavefront fallback: dict of device arrays
        dev = pend._device_out
        trace_dev = dev["trace_table"]
        eq, er = dev["end_query"], dev["end_ref"]
        B = batch.size
        rows = {k: v for k, v in dev.items() if k != "trace_table"}
    Bp = int(trace_dev.shape[0])
    qi, ri = batch.qidx, batch.ridx
    if qi.shape[0] not in (1, Bp):
        qi = jnp.pad(jnp.asarray(qi), ((0, Bp - qi.shape[0]), (0, 0)))
    if ri.shape[0] != Bp:
        ri = jnp.pad(jnp.asarray(ri), ((0, Bp - ri.shape[0]), (0, 0)))
    sub = jnp.asarray(
        batch.table if batch.table is not None else batch.profile,
        jnp.int32)
    if sub.ndim == 3 and sub.shape[0] not in (1, Bp):
        # per-pair profile rows: pad to the Pallas 128-lane batch dim
        sub = jnp.pad(sub, ((0, Bp - sub.shape[0]), (0, 0), (0, 0)))
    m, s, ln = device_walk_stats(
        trace_dev, qi, ri, sub, eq, er, mode, free)
    rows.update(matches=m, similar=s, length=ln)
    out_names = scan_scalar_names(width, stats=True)
    key = (out_names, Bp)
    fuse = _STATS_FUSE_JIT.get(key)
    if fuse is None:
        import jax

        fuse = _STATS_FUSE_JIT[key] = jax.jit(
            lambda kw: jnp.stack(
                [kw[n].astype(jnp.int32) for n in out_names]))
    packed2 = fuse({n: rows[n] for n in out_names})
    return PendingResult(packed_form=(out_names, packed2, {}, B))


WAVEFRONT_TPU_MAX_SPAN = int(
    os.environ.get("PT_WAVEFRONT_TPU_MAX_SPAN", 8192))


def _wavefront_exec(batch, *, gap_open, gap_extend, mode, free, outputs,
                    width, banded=False, bandwidth=0):
    """XLA wavefront execution with a big-shape safety valve.

    The wavefront's anti-diagonal ``lax.scan`` runs Qp+Rp sequential
    steps; beyond several thousand steps the TPU runtime has been
    observed to CRASH the worker process outright (observed at 16kbp
    pairs on the dev v5e), killing every subsequent dispatch in the
    process.  Batches that big only reach the wavefront for configs
    outside every scan-kernel contract (stats with gap_open <=
    gap_extend, or scores beyond int8), so correctness beats speed: run
    the same jitted kernel on the host CPU backend instead of risking
    the accelerator.
    PT_WAVEFRONT_TPU_MAX_SPAN overrides the threshold.
    """
    import jax

    args = [
        _device_profile(batch.profile, batch.table, batch.qidx),
        batch.qidx, batch.ridx, batch.qlen, batch.rlen]
    if (jax.default_backend() == "tpu"
            and batch.qp + batch.rp > WAVEFRONT_TPU_MAX_SPAN):
        log.warning(
            "wavefront fallback for a %dx%d batch exceeds the TPU "
            "sequential-scan safety bound (%d steps); running on the "
            "host CPU backend instead", batch.qp, batch.rp,
            WAVEFRONT_TPU_MAX_SPAN)
        cpu = jax.local_devices(backend="cpu")[0]
        args = [jax.device_put(np.asarray(a), cpu) for a in args]
    return wavefront_align(
        *args, open_=np.int32(gap_open), ext=np.int32(gap_extend),
        mode=mode, free=free, outputs=outputs, width=width,
        banded=banded, bandwidth=np.int32(bandwidth or 0))


def _execute_streamed_or_fallback(batch, **kw):
    """Run the streamed-segment scan route; on a device failure fall back
    to the XLA wavefront (same safety net as the one-shot route)."""
    try:
        return _execute_pallas_streamed(batch, **kw)
    except Exception as e:  # pragma: no cover - depends on backend
        log.warning(
            "streamed pallas route failed (%s: %s); falling back to XLA "
            "wavefront", type(e).__name__, e)
        out = _wavefront_exec(
            batch, gap_open=kw["gap_open"], gap_extend=kw["gap_extend"],
            mode=kw["mode"], free=kw["free"], outputs=kw["outputs"],
            width=kw["width"])
        return {k: np.asarray(v) for k, v in out.items()}


def _execute_pallas_or_fallback(batch, **kw):
    """Run the Pallas route; on a device-compile failure (e.g. a VMEM
    plan miscalibration on an unusual shape) fall back to the wavefront
    path rather than surfacing an internal error."""
    try:
        return _execute_pallas(batch, **kw)
    except Exception as e:  # pragma: no cover - depends on backend
        log.warning(
            "pallas route failed (%s: %s); falling back to XLA wavefront",
            type(e).__name__, e)
        out = _wavefront_exec(
            batch, gap_open=kw["gap_open"], gap_extend=kw["gap_extend"],
            mode=kw["mode"], free=kw["free"], outputs=kw["outputs"],
            width=kw["width"], banded=kw.get("banded", False),
            bandwidth=kw.get("bandwidth") or 0)
        if not kw.get("fetch", True):
            return PendingResult(device_out=dict(out))
        return {k: np.asarray(v) for k, v in out.items()}


def slice_pair(out: dict, b: int, qlen: int, rlen: int) -> dict:
    """Extract pair ``b``'s results, cropped from padded to true lengths."""
    fields = {}
    for k, v in out.items():
        if k.endswith("_table"):
            fields[k] = v[b, :qlen, :rlen]
        elif k.endswith("_row"):
            fields[k] = v[b, :rlen]
        elif k.endswith("_col"):
            fields[k] = v[b, :qlen]
        else:
            fields[k] = v[b]
    return fields
