"""Pallas TPU kernel: batched prefix-scan DP fill.

This is the speed-of-light device path for the kernel family the
reference reaches through parasail's `*_scan` C kernels (SURVEY.md §2.2;
name grammar src/aligner/mod.rs:289-331).  parasail's scan strategy
(Daily 2016) resolves the affine-gap vertical dependency with a prefix
scan over ONE pair's SIMD stripes; the TPU formulation flips the mapping
— 128 pairs ride the vector lanes, query positions ride the sublanes,
and the kernel sweeps reference columns:

  per column j (all arrays (Qc, LANES), elementwise on the VPU):
    F[i]     = max(Hprev[i] - open, Fprev[i] - ext)        horizontal gap
    Htemp[i] = max(Hprev[i-1] + S[i,j], F[i])              pre-vertical H
    E[i]     = max_{k<=i-1} (Htemp[k] - open - (i-1-k)*ext) vertical gap
    H[i]     = max(Htemp[i], E[i])        (local: clamp 0 before the scan)

  E is a (max,+) prefix over the sublane axis, computed in log2(Qc)
  shift+max steps on A[k] = Htemp[k] - open + ext*k.

Long queries are CHUNKED: the grid is (batch-block, query-chunk,
column-block), and two per-column "downward" state planes — the chunk's
last-row H and the running prefix max PM[j] = max_{k<r0} A[k,j] — carry
the DP across chunk boundaries (the single-chip form of the
sequence-parallel scheme in dist/seqpar.py).

Exactness holds for ANY penalty pair on the value planes (score / table
/ rowcol / trace): golden's E[i] = max(H[i-1]-open, E[i-1]-ext) with
H = max(Htemp, E) unrolls exactly to the prefix closed form with slope
e_ext = min(open, ext) — when open < ext a re-opened length-1 gap
through H beats extending at every step, and the substituted slope IS
that optimum (see the kernel-body comment).  STATS remain restricted to
strict gap_open > gap_extend: at open == ext gap-restart value ties are
systematic, and at open < ext golden's restart-wins tie rule routes the
payload through max(Htemp, E) whose own diag-vs-F tie the one-pass
argmax scan cannot observe — the engine falls back to the XLA wavefront
path for those (reference penalties doc: src/aligner/mod.rs:140-154).

Substitution scores resolve IN-KERNEL from a packed letter-indexed
profile ("G-select", the default): profile rows pack 4 int8 scores per
int32 into a (npk=ceil(A/4), Qc, LANES) block and each column pays a
per-lane plane-select tree + byte extract (~log2(npk)+3 slab ops).
This replaces the precomputed (B, Rp, Qp) substitution tensor (still
available via PT_GSEL=0): the batched K=A one-hot matmul that built it
runs at ~2% MXU utilization and dominated the sweep, and its cell-sized
HBM tensor capped one-shot batch sizes.  The packed profile is 28x
smaller (protein), reference-segment invariant, and built with cheap
elementwise ops (build_gpack / build_gpack_from_table).

Output-class coverage: score / stats / table / stats_table / rowcol /
stats_rowcol / trace — the full parasail output matrix, chunked or not
(stats carries six extra down planes: last-row accumulators and prefix
payloads; rowcol row planes gain a chunk axis summed at readout and col
slices are written per chunk).  ``scan_fits`` reports routability for a
shape/output combination.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import (
    NEG_INF32,
    TRACE_DEL,
    TRACE_DEL_F,
    TRACE_DIAG,
    TRACE_DIAG_E,
    TRACE_DIAG_F,
    TRACE_INS,
    TRACE_INS_E,
    WIDTH_MAX,
    WIDTH_MIN,
)

I32 = jnp.int32
LANES = 128          # pairs per block (vector lane dim)
COL_TILE = 256       # max reference columns per grid step
Q_CHUNK = 1024       # query rows per chunk when chunking kicks in
BIG = 2**30
VMEM_BUDGET = 13 << 20   # usable VMEM after compiler slack


def _roll1(x, s):
    """Sublane rotate-down by ``s`` (axis 0).  PT_ROLL=pltpu switches to
    the pltpu.roll primitive (perf experiment; bit-identical — every
    caller masks the wrapped rows)."""
    import os

    if os.environ.get("PT_ROLL") == "pltpu":
        return pltpu.roll(x, s, 0)
    return jnp.roll(x, s, axis=0)


def _classes(outputs):
    want_trace = outputs == "trace"
    want_stats = outputs in ("stats", "stats_table", "stats_rowcol")
    want_table = outputs in ("table", "stats_table")
    want_rowcol = outputs in ("rowcol", "stats_rowcol")
    return want_trace, want_stats, want_table, want_rowcol


def _plan(Qp, Rp, outputs, npk=None, stream=False, rowseg=False):
    """(Qc, nq, Jt, nj) tile plan, or None if nothing fits VMEM.

    The chunk size adapts: the whole query in one chunk when its state
    planes fit, else progressively smaller power-of-two chunks (stats
    prefers <= 512 — its state/payload planes are 4x a score sweep's).
    This keeps mid-range shapes (1-8kbp queries) on the Pallas route
    instead of dropping them onto the ~1000x slower wavefront.

    ``npk`` (G-select mode) is the packed-profile plane count
    ceil(A/4): the per-column scol stream is replaced by a fixed
    (npk, Qc, LANES) int32 block; None = legacy scol accounting.
    ``stream`` marks the resumable-segment kernels, which never pack
    their stats planes.
    """
    want_trace, want_stats, want_table, want_rowcol = _classes(outputs)
    nplanes = 4 if want_stats else 1
    # The scalar-stats class packs [m|s|l] into one plane when the bit
    # fields fit (stats_pack_params) and its E-prefix carries ONE
    # payload; the pair-packed mode ([m|s] fused, l separate —
    # stats_pack2_params) serves streamed/large-span scalar stats with
    # two payloads; fully unpacked stats (table/rowcol classes, rowseg,
    # queries beyond the pack2 fields) carry three payload planes
    # through the log2(Qc) prefix steps — a much larger live set at the
    # loop's peak (measured: Mosaic scoped-stack OOM at Qc=256 on a
    # 16k-query streamed stats plan that the live=20 model accepted by
    # 124 KB).
    packed_stats, pack2_stats, nms = stats_layout(
        Qp, Rp, outputs, stream=stream, rowseg=rowseg)
    packed_stats = packed_stats and not stream

    def try_qc(Qc):
        nq = Qp // Qc
        Rpad = (Rp + 7) // 8 * 8
        ndown = 0 if nq == 1 else (
            3 if want_trace else
            ((2 * nms + 4) if want_stats else 2))
        # +4 candidate/saturation tracker planes (+stats-at-best; the
        # packed-stats mode uses fewer — counted unpacked, conservative)
        nstate = 2 + ((2 * nms + 2) if want_stats else 0) \
            + (nplanes if want_rowcol else 0) \
            + 4 + ((nms + 1) if want_stats else 0)
        # ~live column-loop temporaries (H/E/F/htemp/prefix slabs),
        # measured against Mosaic's scoped-stack accounting
        live = ((20 if packed_stats else (34 if pack2_stats else 43))
                if want_stats else 12)
        fixed = ((nstate + live) * Qc * LANES * 4 + ndown * Rpad * LANES * 4
                 + (2 * nplanes * Qc * LANES * 4 if want_rowcol else 0)
                 + (9 + nplanes) * LANES * 4)
        out_cell = (1 if want_trace else 0) + \
            (4 * nplanes if want_table else 0)
        if npk is not None:
            # G-select: the packed profile block is per-chunk, not
            # per-column (double-buffered across chunk steps); columns
            # stream only ridx (and the output planes)
            fixed += 2 * npk * Qc * LANES * 4
            per_col = Qc * LANES * out_cell * 2 + LANES * 4 * 2
        else:
            per_col = Qc * LANES * (1 + out_cell) * 2  # double-buffered
        budget = VMEM_BUDGET - fixed
        if budget < per_col:
            return None
        Jt = min(COL_TILE, Rp, budget // per_col)
        if Jt != Rp:
            # ridx/row blocks use Jt as their sublane dim: must divide
            # by 8 (Mosaic tiling) unless it spans the whole array.
            # Round DOWN — rounding an unaffordable 1-7 up to 8 put the
            # column double-buffers past Mosaic's scoped limit (observed:
            # stats_table 1024x1024 compile OOM); a chunk size that
            # cannot afford an 8-column tile is rejected so the planner
            # falls through to a smaller Qc.
            Jt = Jt // 8 * 8
            if Jt < 8:
                return None
        return Qc, nq, Jt, pl.cdiv(Rp, Jt)

    cands = []
    if Qp <= 2 * Q_CHUNK:
        cands.append(Qp)                      # unchunked when possible
    qc = min(512 if want_stats else Q_CHUNK, Qp)
    while qc >= 128:
        if Qp % qc == 0 and qc != Qp:
            cands.append(qc)
        qc //= 2
    for Qc in cands:
        plan = try_qc(Qc)
        if plan is not None:
            return plan
    return None


def scan_fits(Qp, Rp, outputs, A=32) -> bool:
    """Can the scan kernel serve this padded shape + output class?

    ``A`` is the alphabet width (npk = ceil(A/4) packed planes in
    G-select mode); the default is the conservative 32-letter bound.
    """
    return _plan(Qp, Rp, outputs, npk=_npk(A) if _gsel(A) else None) \
        is not None


def scan_fits_stream(Qp, Rseg, outputs, A=32) -> bool:
    """Routability of the streamed-segment kernel for one segment."""
    return _plan(Qp, Rseg, outputs, npk=_npk(A) if _gsel(A) else None,
                 stream=True) is not None


def _npk(A: int) -> int:
    return (A + 3) // 4


def _gsel(A: int) -> bool:
    """G-select (in-kernel packed-profile substitution resolution) is the
    default device path; PT_GSEL=0 restores the precomputed substitution
    tensor (scol) path.  Alphabets beyond 32 letters would need a 9+ deep
    select tree — they take the scol path."""
    import os

    return A <= 32 and os.environ.get("PT_GSEL", "1") != "0"


def _prefix_masks(ii, n):
    """Loop-invariant masks for the Hillis-Steele prefix steps.

    Computed ONCE outside the column loop so the per-column scans pay
    only the roll+select+max, not the iota comparisons.  Also carries
    the block-decomposition masks for the two-level scan (8-row blocks:
    the sublane tile size).
    """
    masks = {0: ii == 0}
    s = 1
    while s < n:
        masks[s] = ii >= s
        s *= 2
    if n % 8 == 0 and n >= 32:
        im = ii % 8
        for s in (1, 2, 4):
            masks[("b", s)] = im >= s
        masks["bstart"] = im == 0
        nbk = n // 8
        ib = jax.lax.broadcasted_iota(I32, (nbk, LANES), 0)
        s = 1
        while s < nbk:
            masks[("k", s)] = ib >= s
            s *= 2
        masks["k0"] = ib == 0
    return masks


def _prefix_max_exclusive2(a, masks, seed):
    """Two-level exclusive (max) prefix: 8-row block-local scan + a
    cross-block scan on the (n/8)-row block-max slab.

    Same result as :func:`_prefix_max_exclusive` with ~1/3 fewer
    full-slab ops — the cross-block Hillis-Steele runs on a slab 8x
    smaller.  Requires n % 8 == 0 (every bucket is).
    """
    n = a.shape[0]
    nbk = n // 8
    # 1) block-local INCLUSIVE scan (3 masked shift+max steps)
    x = a
    for s in (1, 2, 4):
        x = jnp.maximum(
            x, jnp.where(masks[("b", s)], _roll1(x, s),
                         NEG_INF32))
    # 2) per-block maxes -> (nbk, LANES)
    xb = x.reshape(nbk, 8, LANES)[:, 7, :]
    # 3) seeded EXCLUSIVE scan over blocks (slab 8x smaller)
    y = jnp.where(masks["k0"], seed, _roll1(xb, 1))
    s = 1
    while s < nbk:
        y = jnp.maximum(
            y, jnp.where(masks[("k", s)], _roll1(y, s),
                         NEG_INF32))
        s *= 2
    # 4) broadcast block carries back to rows
    yb = jnp.broadcast_to(y[:, None, :], (nbk, 8, LANES)).reshape(n, LANES)
    # 5) exclusive within block + combine
    xs = jnp.where(masks["bstart"], NEG_INF32, _roll1(x, 1))
    return jnp.maximum(yb, xs)


def _prefix_max_exclusive(a, masks, seed):
    """Exclusive (max) prefix along the sublane axis 0.

    out[i] = max(seed, a[0..i-1]) — ``seed`` is the virtual row above the
    chunk (boundary cell or cross-chunk prefix max).  Hillis-Steele with
    static shifts: log2(Qc) shift+max slab ops.
    """
    x = jnp.where(masks[0], seed, _roll1(a, 1))
    s = 1
    n = a.shape[0]
    while s < n:
        shifted = jnp.where(masks[s], _roll1(x, s), NEG_INF32)
        x = jnp.maximum(x, shifted)
        s *= 2
    return x


def _prefix_argmax_exclusive(a, payloads, masks, seed, seed_payloads):
    """Exclusive prefix max over sublanes, carrying payload planes.

    Ties prefer the element already at the position (the LARGER origin
    row k) — the same preference as the golden oracle's
    ``e_open >= e_ext`` chain.  Returns (max values, payloads of the
    winning element).
    """
    neg = NEG_INF32
    x = jnp.where(masks[0], seed, _roll1(a, 1))
    ps = [jnp.where(masks[0], sp, _roll1(p, 1))
          for p, sp in zip(payloads, seed_payloads)]
    s = 1
    n = a.shape[0]
    while s < n:
        xs = jnp.where(masks[s], _roll1(x, s), neg)
        take = xs > x
        x = jnp.where(take, xs, x)
        # take is only true where the shift was in-range, so the payload
        # shift needs no range mask of its own
        ps = [jnp.where(take, _roll1(p, s), p) for p in ps]
        s *= 2
    return x, ps


def _prefix_cummax_exclusive(a, masks, seed):
    """Exclusive seeded prefix max via the native lax.cummax lowering."""
    cm = jax.lax.cummax(a, axis=0)
    return jnp.maximum(seed, jnp.where(masks[0], NEG_INF32,
                                       _roll1(cm, 1)))


_PREFIX_IMPLS = {
    "flat": _prefix_max_exclusive,
    "two": _prefix_max_exclusive2,
    "cummax": _prefix_cummax_exclusive,
}


def _prefix_impl(a, masks, seed):
    """Pluggable scalar-prefix implementation (PT_PREFIX_IMPL env knob,
    perf experiments only — all three are bit-identical).  Default:
    flat Hillis-Steele, the fastest measured on v5e; the two-level
    variant's relayouts cost more than its saved ops.  cummax HANGS the
    Mosaic compiler on the TPU backend (measured: no compile in 240 s at
    a trivial shape), so it is honored only off-TPU (interpret/CPU)."""
    import os

    import jax

    name = os.environ.get("PT_PREFIX_IMPL", "flat")
    impl = _PREFIX_IMPLS.get(name, _prefix_max_exclusive)
    if impl is _prefix_max_exclusive2 and ("b", 1) not in masks:
        impl = _prefix_max_exclusive
    if impl is _prefix_cummax_exclusive and jax.default_backend() == "tpu":
        impl = _prefix_max_exclusive
    return impl(a, masks, seed)


def stats_pack_params(qp_total, rlen_total, resume=False, stream=False):
    """Bit-field layout for packing the three stats planes (matches,
    similar, length) into ONE int32 plane: [m | s | l+OFFL].

    Valid only when every field fits 31 bits total — m, s <= l <=
    qlen+rlen, and the l field carries l+OFFL (payload domain l-k+OFFL)
    with OFFL = qp_total so it never goes negative.  Streamed/resumed
    kernels see unbounded l (it accumulates across reference segments),
    so they never pack.  Returns (packed, SH_M, SH_S, OFFL).
    """
    if resume or stream:
        return False, 0, 0, 0
    span = qp_total + rlen_total
    bm = max(1, (span + 1).bit_length())          # m, s fields
    bl = max(1, (span + qp_total + 1).bit_length())   # l + OFFL field
    if 2 * bm + bl > 31:
        return False, 0, 0, 0
    return True, bm + bl, bl, qp_total


def stats_pack2_params(qp_total, rowseg=False):
    """Bit-field layout for the PAIR-packed stats mode: [m | s] in ONE
    int32 plane, the length accumulator separate.

    m and s only grow on diagonal steps, so both are bounded by qlen <=
    qp_total — independent of the reference length.  Unlike the full
    [m|s|l] pack (:func:`stats_pack_params`, whose l field grows with
    qlen+rlen), this serves STREAMED segments and chunked long queries:
    stats carries drop 6 -> 4 planes, E-prefix payloads 3 -> 2, and the
    chunk down-state 8 -> 6 planes.  rowseg keeps the unpacked layout
    (its down/resume refs cross the shard_map boundary with a fixed
    6-plane contract).  Returns (pack2, SH2) — fused = (m << SH2) | s.
    """
    if rowseg:
        return False, 0
    b = max(1, int(qp_total).bit_length())
    if 2 * b > 31:
        return False, 0
    return True, b


def stats_layout(qp_total, rlen_total, outputs, resume=False, stream=False,
                 rowseg=False):
    """Static stats-plane layout shared by the kernel body and the
    wrappers that allocate its refs: (packed, pack2, nms) where ``nms``
    is the number of m/s carry planes (1 fused, 2 separate).  Scalar
    counts derive from it: stats carries = 2*nms+2 (or 2 packed), htop
    rows = nms+2 (or 2 packed), chunk down-state = 2*nms+2 (or 2)."""
    want_trace, want_stats, want_table, want_rowcol = _classes(outputs)
    scalar = want_stats and not (want_table or want_rowcol)
    packed = scalar and stats_pack_params(
        qp_total, rlen_total, resume, stream)[0]
    pack2 = (scalar and not packed
             and stats_pack2_params(qp_total, rowseg)[0])
    return packed, pack2, (1 if pack2 else 2)


def cand_pack_params(rlen_total, hmax_bound, banded=False, resume=False,
                     stream=False):
    """Bit-field layout for packing the end-cell candidate trackers
    (best H, best j) into ONE carried plane: [H | (P-1-j)].

    The fori-loop carry is the scan kernel's scarcest resource — each
    carried (Qc, LANES) plane costs ~1 ms per 8192x150bp batch in loop
    state traffic on v5e (measured, tools/perf_lab.py), an order of
    magnitude more than the handful of slab ops it replaces.  Packing is
    exact when every achievable |H| stays below 2^30 / P (P = columns
    rounded up to a power of two): the packed values order
    lexicographically by (H desc, j asc) — max-reduction reproduces the
    reference's tie preference (H desc, then earliest column) — and the
    -2^30 "no candidate" sentinel stays strictly below any real packed
    value.  Streamed/resumed segments see global columns beyond
    rlen_total and banded kernels clamp H to -2^30 outside the band, so
    neither packs.  Returns (pack?, SHJ, P).
    """
    if hmax_bound is None or banded or resume or stream:
        return False, 0, 1
    P = 1
    while P < max(1, rlen_total):
        P *= 2
    if (int(hmax_bound) + 2) * P >= 2 ** 30:
        return False, 0, 1
    return True, P.bit_length() - 1, P


def _make_kernel(Qc, nq, Jt, nj, mode, free, width, rlen_total, qp_total,
                 want_trace=False, want_stats=False,
                 want_table=False, want_rowcol=False, banded=False,
                 resume=False, stream=False, hmax_bound=None,
                 gsel_npk=None, rowseg=False):
    """Build the column-sweep kernel body (all config static).

    ``gsel_npk`` set means G-select mode: the substitution input is the
    packed profile block (npk, Qc, LANES) + per-column reference letters,
    resolved in-kernel (see :func:`_gsel_substitution`); None streams the
    precomputed (Jt, Qc, LANES) substitution tensor instead.

    ``rowseg`` (sequence-parallel tile mode, requires stream+resume and
    nq == 1): the call covers ONE externally-chosen row chunk — the
    global row offset arrives traced in gaps[4] and the down-state
    planes (chunk-boundary H / prefix max / stats / E) thread through
    input/output refs instead of living in per-call scratch.  Because
    under shard_map every device runs the same traced program, the
    boundary-vs-neighbor selection for the left edge (device 0) and the
    top edge (row chunk 0) happens in the XLA caller (dist/seqpar_scan),
    which pre-fills the resume/down inputs with bordered boundary values
    where no producer tile exists."""
    local = mode == "sw"
    qb, qe, db, de = (True,) * 4 if local else free
    neg = NEG_INF32  # plain int: jnp constants made here would be captured
    detect8 = width in ("8", "sat")
    detect16 = width in ("16", "sat")
    nplanes = 4 if want_stats else 1
    chunked = nq > 1
    packed, SH_M, SH_S, OFFL = stats_pack_params(
        qp_total, rlen_total, resume, stream)
    # table/rowcol classes write the separate stats planes per column, so
    # only the scalar-stats class benefits from packing
    packed = packed and want_stats and not (want_table or want_rowcol)
    # pair-packed fallback: [m|s] fused + separate l (stats carries and
    # payloads shrink; streamed/chunked-eligible).  nms = m/s plane count.
    pack2 = (want_stats and not packed and not (want_table or want_rowcol)
             and stats_pack2_params(qp_total, rowseg)[0])
    nms = 1 if pack2 else 2
    SH2 = stats_pack2_params(qp_total, rowseg)[1]
    MS_MASK = (1 << SH2) - 1 if SH2 else 0
    pack_cand, SHJ, PJ = cand_pack_params(
        rlen_total, hmax_bound, banded, resume, stream)
    # Local-mode H is clamped at 0, so the running candidate max IS the
    # matrix-wide H extreme: the saturation flags derive from it after
    # the loop and the two min/max tracker planes drop out of the carry.
    track_sat = (detect8 or detect16) and not (local and pack_cand)
    # candidate-tuple layout: [packed | best, bj] [smax, smin] [stats...]
    si = 1 if pack_cand else 2
    ci = si + (2 if track_sat else 0)

    def kernel(*refs):
        refs = list(refs)
        gaps_ref = refs.pop(0)
        qlen_ref = refs.pop(0)
        rlen_ref = refs.pop(0)
        if gsel_npk:
            gpack_ref = refs.pop(0)
            scol_ref = None
        else:
            scol_ref = refs.pop(0)
        qidx_ref = refs.pop(0) if want_stats else None
        ridx_ref = refs.pop(0) if (want_stats or gsel_npk) else None
        if resume:
            hin_ref = refs.pop(0)
            fin_ref = refs.pop(0)
            tin_ref = refs.pop(0)
            ain_ref = refs.pop(0)
            sin_refs = ([refs.pop(0) for _ in range(2 * nms + 2)]
                        if want_stats else [])
        if rowseg:
            # down-state of the row chunk above, one value per column:
            # toph (last-row H), prefix-max seed, [E for trace],
            # [Hm Hs Hl / PMm PMs PMl for stats]
            dinh_ref = refs.pop(0)
            dinp_ref = refs.pop(0)
            dine_ref = refs.pop(0) if want_trace else None
            dins_refs = ([refs.pop(0) for _ in range(2 * nms + 2)]
                         if want_stats else [])
        out_ref = refs.pop(0)
        if stream:
            hout_ref = refs.pop(0)
            fout_ref = refs.pop(0)
            tout_ref = refs.pop(0)
            sout_refs = ([refs.pop(0) for _ in range(2 * nms + 2)]
                         if want_stats else [])
        if rowseg:
            douth_ref = refs.pop(0)
            doutp_ref = refs.pop(0)
            doute_ref = refs.pop(0) if want_trace else None
            douts_refs = ([refs.pop(0) for _ in range(2 * nms + 2)]
                          if want_stats else [])
        trace_ref = refs.pop(0) if want_trace else None
        tab_refs = [refs.pop(0) for _ in range(nplanes)] if want_table else []
        row_refs = [refs.pop(0) for _ in range(nplanes)] if want_rowcol else []
        col_refs = [refs.pop(0) for _ in range(nplanes)] if want_rowcol else []
        hprev, fprev = refs.pop(0), refs.pop(0)
        if want_stats and packed:
            # one packed [m|s|l+OFFL] plane each for H-stats and F-stats
            hm, fm = refs.pop(0), refs.pop(0)
            h_ms = f_ms = hl = fl = None
        elif want_stats:
            # nms m/s planes ([m|s] fused when pack2) + the l plane
            h_ms = [refs.pop(0) for _ in range(nms)]
            hl = refs.pop(0)
            f_ms = [refs.pop(0) for _ in range(nms)]
            fl = refs.pop(0)
            hm = fm = None
        col_scratch = [refs.pop(0) for _ in range(nplanes)] if want_rowcol else []
        htop_scr = refs.pop(0)
        if chunked:
            dH, dPM = refs.pop(0), refs.pop(0)
            dE = refs.pop(0) if want_trace else None
            if want_stats and packed:
                dHm, dPMm = refs.pop(0), refs.pop(0)
                dH_ms = dHl = dPM_ms = dPMl = None
            elif want_stats:
                dH_ms = [refs.pop(0) for _ in range(nms)]
                dHl = refs.pop(0)
                dPM_ms = [refs.pop(0) for _ in range(nms)]
                dPMl = refs.pop(0)
                dHm = dPMm = None
        acc = refs.pop(0)

        open_ = gaps_ref[0]
        ext = gaps_ref[1]
        # Effective vertical-gap extension.  Golden's recurrence
        # E[i] = max(H[i-1]-open, E[i-1]-ext) with H = max(Htemp, E)
        # unrolls EXACTLY to max_k (Htemp[k] - open - (i-1-k)*min(open,
        # ext)): when open < ext, re-opening a length-1 gap through H
        # beats extending at every step, and the prefix scan captures
        # that closed-form with the substituted slope.  Value planes
        # (H/E/F) therefore stay golden-exact for ANY penalty pair; only
        # the A-domain terms below use e_ext — golden's branch
        # comparisons (from_open_f, eflag) keep the true ext.
        e_ext = jnp.minimum(ext, open_)
        bw = gaps_ref[2]
        j0 = gaps_ref[3]   # global column offset (reference streaming)
        tq = pl.program_id(1)
        jblk = pl.program_id(2)
        # rowseg: the row chunk is chosen by the caller per superstep
        # (traced), not by the grid
        r0 = gaps_ref[4] if rowseg else tq * Qc
        ii = jax.lax.broadcasted_iota(I32, (Qc, LANES), 0)
        ig = r0 + ii                               # global query row
        # loop-invariant slabs hoisted out of the column sweep
        pmasks = _prefix_masks(ii, Qc)
        a_base = e_ext * ig - open_
        e_base = e_ext * (ig - 1)
        qlen = qlen_ref[0, :, :]                   # (1, LANES)
        rlen = rlen_ref[0, :, :]
        imask = ig < qlen

        def top_b(c):
            # bordered H[0][c]; under banding, boundary cells beyond the
            # band (|0 - c| > bw on the bordered grid) are unreachable
            base = (jnp.zeros_like(jnp.asarray(c), I32) if (qb or local) else
                    jnp.where(c > 0, -(open_ + (c - 1) * ext), 0).astype(I32))
            if banded:
                base = jnp.where(jnp.asarray(c) <= bw, base, neg)
            return base

        def left_b(c):
            # bordered H[c][0]
            base = (jnp.zeros_like(jnp.asarray(c), I32) if (db or local) else
                    jnp.where(c > 0, -(open_ + (c - 1) * ext), 0).astype(I32))
            if banded:
                base = jnp.where(jnp.asarray(c) <= bw, base, neg)
            return base

        @pl.when((tq == 0) & (jblk == 0))
        def _init_acc():
            if resume:
                acc[:] = ain_ref[0]
            else:
                acc[:] = jnp.zeros((8, LANES), I32)
                acc[0:1, :] = jnp.full((1, LANES), neg, I32)     # best score
                acc[1:2, :] = jnp.full((1, LANES), I32(qp_total))  # best i
                acc[2:3, :] = jnp.full((1, LANES), BIG, I32)     # best j

        @pl.when(jblk == 0)
        def _init_chunk():
            if resume:
                # Continue from the previous reference segment's state.
                hprev[:] = hin_ref[0, 0]
                fprev[:] = fin_ref[0, 0]
                htop_scr[:] = tin_ref[0, 0]
                if want_stats:
                    planes = ((hm, fm) if packed else
                              (*h_ms, hl, *f_ms, fl))
                    for dst, src in zip(planes, sin_refs):
                        dst[:] = src[0, 0]
                return
            # Bordered left column H[i+1][0] of this chunk's rows.
            hprev[:] = left_b(ig + 1) * jnp.ones((Qc, LANES), I32)
            fprev[:] = jnp.full((Qc, LANES), neg)
            # H[r0-1, -1 bordered] = bordered (r0, 0): the first column's
            # row-0 diagonal predecessor (value row 0; stats rows 1-3 when
            # stats are on: m = s = 0, l = bordered left length).
            htop_scr[0:1, :] = jnp.full((1, LANES), 1, I32) * left_b(r0)
            if want_stats and packed:
                left_l = jnp.int32(0) if (db or local) else r0
                htop_scr[1:2, :] = jnp.full((1, LANES), 1, I32) * (
                    left_l + OFFL)
                # golden: boundary Hl[i][0] = i (bordered), 0 when free
                init_l = (jnp.zeros((Qc, LANES), I32)
                          if (db or local) else ig + 1)
                hm[:] = init_l + OFFL
                fm[:] = jnp.full((Qc, LANES), OFFL, I32)
            elif want_stats:
                left_l = jnp.int32(0) if (db or local) else r0
                for k in range(nms):
                    htop_scr[1 + k:2 + k, :] = jnp.zeros((1, LANES), I32)
                htop_scr[1 + nms:2 + nms, :] = \
                    jnp.full((1, LANES), 1, I32) * left_l
                for p in h_ms + f_ms:
                    p[:] = jnp.zeros((Qc, LANES), I32)
                # golden: boundary Hl[i][0] = i (bordered), 0 when free
                hl[:] = (jnp.zeros((Qc, LANES), I32)
                         if (db or local) else ig + 1)
                fl[:] = jnp.zeros((Qc, LANES), I32)
            for cs in col_scratch:
                cs[:] = jnp.zeros((Qc, LANES), I32)

        # Per-column DP state rides the fori-loop CARRY (vector registers
        # / compiler-managed stack) instead of VMEM scratch round-trips —
        # the refs only persist state across grid steps (read before the
        # loop, written back after).  The candidate/saturation trackers
        # live purely in the carry: best-H and its column per query row,
        # running masked min/max H for the saturation flags (+ stats of
        # the best cell), reduced ONCE into acc after the loop.
        nhrows = htop_scr.shape[0]
        st0 = {
            "hp": hprev[:], "fp": fprev[:],
            "htop": tuple(htop_scr[r:r + 1, :] for r in range(nhrows)),
            "stats": ((hm[:], fm[:]) if (want_stats and packed) else
                      (*(p[:] for p in h_ms), hl[:],
                       *(p[:] for p in f_ms), fl[:])
                      if want_stats else ()),
            "colcap": tuple(cs[:] for cs in col_scratch),
            "cand": ((jnp.full((Qc, LANES), neg, I32),) if pack_cand else
                     (jnp.full((Qc, LANES), neg, I32),
                      jnp.full((Qc, LANES), BIG, I32)))
                    + ((jnp.zeros((Qc, LANES), I32),
                        jnp.zeros((Qc, LANES), I32))
                       if track_sat else ())
                    + (((jnp.zeros((Qc, LANES), I32),) if packed else
                        (jnp.zeros((Qc, LANES), I32),) * (nms + 1))
                       if want_stats else ()),
        }

        def col(jj, st):
            jl = jblk * Jt + jj          # segment-local column (scratch)
            j = j0 + jl                  # global column (boundaries, coords)
            if gsel_npk:
                rj = ridx_ref[0, pl.ds(jj, 1), :]       # (1, LANES)
                s = _gsel_substitution(gpack_ref, rj, gsel_npk)
            else:
                s = scol_ref[0, jj, :, :].astype(I32)   # (Qc, LANES)
            hp = st["hp"]
            fp = st["fp"]
            htop_rows = st["htop"]

            from_open_f = hp - open_ >= fp - ext
            F = jnp.maximum(hp - open_, fp - ext)
            # Diagonal predecessor of the chunk's top row: H[r0-1, j-1],
            # carried column-to-column through the htop carry.
            htopd = htop_rows[0]
            hdiag = jnp.where(pmasks[0], htopd, _roll1(hp, 1))
            diag = hdiag + s
            htemp = jnp.maximum(diag, F)
            if local:
                htemp = jnp.maximum(htemp, 0)
            if banded:
                in_band = jnp.abs(ig - j) <= bw
                htemp = jnp.where(in_band, htemp, neg)
                F = jnp.where(in_band, F, neg)

            # Cell directly above the chunk: H[r0-1, j] — boundary row for
            # the top chunk, the previous chunk's last row otherwise.
            ones = jnp.ones((1, LANES), I32)
            if chunked:
                dH_j = dH[pl.ds(jl, 1), :]
                toph = jnp.where(tq == 0, top_b(j + 1) * ones, dH_j)
            elif rowseg:
                toph = dinh_ref[0, pl.ds(jj, 1), :]
            else:
                toph = top_b(j + 1) * ones
            # Vertical-gap origin above the chunk: for the top chunk the
            # boundary cell (A[-1] = H[0][j+1] - open + ext*(-1)); deeper
            # chunks use the carried cross-chunk prefix max.
            if rowseg:
                seed = dinp_ref[0, pl.ds(jj, 1), :]
            else:
                seed0 = top_b(j + 1) - open_ + e_ext * (r0 - 1)
                if chunked:
                    seed = jnp.where(tq == 0, seed0 * ones,
                                     dPM[pl.ds(jl, 1), :])
                else:
                    seed = seed0 * ones
            a = htemp + a_base

            if want_stats and packed:
                # Packed stats: all three accumulator planes (matches,
                # similar, length) live in ONE int32 [m|s|l+OFFL] plane —
                # the recurrences become field-aligned adds and the E
                # prefix carries a single payload instead of three.
                qidx_c = qidx_ref[0, :, :]                    # (Qc, LANES)
                ridx_c = ridx_ref[0, pl.ds(jj, 1), :]         # (1, LANES)
                im = (qidx_c == ridx_c).astype(I32)
                hp_msl = st["stats"][0]
                msl_d = jnp.where(pmasks[0], htop_rows[1],
                                  _roll1(hp_msl, 1))
                D_msl = msl_d + (im * (1 << SH_M)
                                 + (s > 0).astype(I32) * (1 << SH_S) + 1)
                F_msl = jnp.where(from_open_f, hp_msl, st["stats"][1]) + 1
                t_diag = diag >= F
                T_msl = jnp.where(t_diag, D_msl, F_msl)
                if local:
                    T_msl = jnp.where(htemp == 0, OFFL, T_msl)
                payload = T_msl - ig                 # l-k+OFFL domain
                seed_l = (jnp.int32(0) if (qb or local) else j + 1) + 1
                if chunked:
                    sd = jnp.where(
                        tq == 0,
                        (seed_l + OFFL) * jnp.ones((1, LANES), I32),
                        dPMm[pl.ds(jl, 1), :])
                    seeds = (sd,)
                else:
                    seeds = (seed_l + OFFL,)
                pm, (E_msl_p,) = _prefix_argmax_exclusive(
                    a, (payload,), pmasks, seed, seeds)
                E = pm - e_base
                E_msl = E_msl_p + ig
            elif want_stats:
                # Stats planes ride the same recurrences (golden
                # model.py:166-211); E stats ride the prefix scan as
                # payloads of the winning origin row — exact for
                # open > ext (gap-restart ties are impossible then).
                # pack2 fuses matches|similar into ONE [m|s] plane
                # (stats_pack2_params): identical selects, one plane.
                qidx_c = qidx_ref[0, :, :]                    # (Qc, LANES)
                ridx_c = ridx_ref[0, pl.ds(jj, 1), :]         # (1, LANES)
                im = (qidx_c == ridx_c).astype(I32)
                simv = (s > 0).astype(I32)
                ms_p = st["stats"][:nms]
                hl_p = st["stats"][nms]
                fms_p = st["stats"][nms + 1:2 * nms + 1]
                fl_p = st["stats"][2 * nms + 1]
                # diagonal-predecessor stats at the chunk's top row come
                # from the column carry (boundary values for the top
                # chunk, the previous chunk's last row otherwise)
                incs = ([(im << SH2) + simv] if pack2 else [im, simv])
                D_ms = [jnp.where(pmasks[0], htop_rows[1 + k],
                                  _roll1(ms_p[k], 1)) + incs[k]
                        for k in range(nms)]
                Dl = jnp.where(pmasks[0], htop_rows[1 + nms],
                               _roll1(hl_p, 1)) + 1
                F_ms = [jnp.where(from_open_f, ms_p[k], fms_p[k])
                        for k in range(nms)]
                Fl = jnp.where(from_open_f, hl_p, fl_p) + 1
                # Htemp stats: which of diag/F won (clamp resets later)
                t_diag = diag >= F
                T_ms = [jnp.where(t_diag, D_ms[k], F_ms[k])
                        for k in range(nms)]
                Tlm = jnp.where(t_diag, Dl, Fl) - ig   # "l minus k" payload
                if local:
                    zt = htemp == 0
                    T_ms = [jnp.where(zt, 0, t) for t in T_ms]
                    Tlm = jnp.where(zt, -ig, Tlm)
                seed_l = (jnp.int32(0) if (qb or local) else j + 1) + 1
                if chunked:
                    z1 = jnp.zeros((1, LANES), I32)
                    seeds = tuple(
                        jnp.where(tq == 0, z1, dPM_ms[k][pl.ds(jl, 1), :])
                        for k in range(nms)) + (
                        jnp.where(tq == 0, seed_l + z1,
                                  dPMl[pl.ds(jl, 1), :]),)
                elif rowseg:
                    seeds = tuple(
                        dins_refs[nms + 1 + k][0, pl.ds(jj, 1), :]
                        for k in range(nms + 1))
                else:
                    seeds = (jnp.int32(0),) * nms + (seed_l,)
                pm, epay = _prefix_argmax_exclusive(
                    a, (*T_ms, Tlm), pmasks, seed, seeds)
                E_ms = list(epay[:nms])
                Elm = epay[nms]
                E = pm - e_base
                El = Elm + ig
            else:
                pm = _prefix_impl(a, pmasks, seed)
                E = pm - e_base
            H = jnp.maximum(htemp, E)

            if want_stats and packed:
                take_diag = (diag >= E) & (diag >= F)
                take_e = (~take_diag) & (E >= F)
                H_msl = jnp.where(take_diag, D_msl,
                                  jnp.where(take_e, E_msl, F_msl))
                if local:
                    H_msl = jnp.where(H <= 0, OFFL, H_msl)
                new_stats = (H_msl, F_msl)
            elif want_stats:
                take_diag = (diag >= E) & (diag >= F)
                take_e = (~take_diag) & (E >= F)
                H_ms = [jnp.where(take_diag, D_ms[k],
                                  jnp.where(take_e, E_ms[k], F_ms[k]))
                        for k in range(nms)]
                Hl = jnp.where(take_diag, Dl, jnp.where(take_e, El, Fl))
                if local:
                    z = H <= 0
                    H_ms = [jnp.where(z, 0, h) for h in H_ms]
                    Hl = jnp.where(z, 0, Hl)
                new_stats = (*H_ms, Hl, *F_ms, Fl)

            if want_trace:
                # Trace flags by the Gotoh comparisons, bit-identical to
                # the golden oracle (golden/model.py:166-211): the scan's
                # E/F/H columns carry the same values, so the same >= tie
                # rules produce the same flags.
                fflag = jnp.where(from_open_f, TRACE_DIAG_F, TRACE_DEL_F)
                h_up = jnp.where(pmasks[0], toph, _roll1(H, 1))
                if chunked:
                    e_top = jnp.where(tq == 0, neg * ones, dE[pl.ds(jl, 1), :])
                elif rowseg:
                    e_top = dine_ref[0, pl.ds(jj, 1), :]
                else:
                    e_top = neg * ones
                e_up = jnp.where(pmasks[0], e_top, _roll1(E, 1))
                eflag = jnp.where(h_up - open_ >= e_up - ext,
                                  TRACE_DIAG_E, TRACE_INS_E)
                take_diag = (diag >= E) & (diag >= F)
                hflag = jnp.where(
                    take_diag, TRACE_DIAG,
                    jnp.where(E >= F, TRACE_INS, TRACE_DEL))
                if local:
                    pre = jnp.maximum(jnp.maximum(diag, E), F)
                    hflag = jnp.where(pre <= 0, 0, hflag)
                trace_ref[0, jj, :, :] = (hflag | eflag | fflag).astype(jnp.int8)

            if banded:
                H = jnp.where(in_band, H, neg)
            new_htop = (toph,)
            if want_stats and packed:
                # packed stats of the cell above at column j: m = s = 0,
                # l = boundary length -> value top_l + OFFL
                ones1 = jnp.ones((1, LANES), I32)
                top_p = ((jnp.int32(0) if (qb or local) else j + 1)
                         + OFFL) * ones1
                if chunked:
                    new_htop += (jnp.where(
                        tq == 0, top_p, dHm[pl.ds(jl, 1), :]),)
                else:
                    new_htop += (top_p,)
            elif want_stats:
                # stats of the cell above at column j, carried for the
                # next column's diagonal
                ones1 = jnp.ones((1, LANES), I32)
                top_l1 = (jnp.int32(0) if (qb or local) else j + 1) * ones1
                if chunked:
                    new_htop += tuple(
                        jnp.where(tq == 0, 0 * ones1,
                                  dH_ms[k][pl.ds(jl, 1), :])
                        for k in range(nms)) + (
                        jnp.where(tq == 0, top_l1, dHl[pl.ds(jl, 1), :]),)
                elif rowseg:
                    new_htop += tuple(dins_refs[k][0, pl.ds(jj, 1), :]
                                      for k in range(nms + 1))
                else:
                    new_htop += (0 * ones1,) * nms + (top_l1,)
            if chunked:
                dH[pl.ds(jl, 1), :] = H[Qc - 1:Qc, :]
                if want_stats and packed:
                    lastA = a[Qc - 1:Qc, :]
                    prev = pm[Qc - 1:Qc, :]
                    take_last = lastA >= prev
                    dPM[pl.ds(jl, 1), :] = jnp.where(take_last, lastA, prev)
                    dPMm[pl.ds(jl, 1), :] = jnp.where(
                        take_last, payload[Qc - 1:Qc, :],
                        E_msl_p[Qc - 1:Qc, :])
                    dHm[pl.ds(jl, 1), :] = H_msl[Qc - 1:Qc, :]
                elif want_stats:
                    # cross-chunk prefix max with payloads: combine the
                    # exclusive scan at the last row (covers seed + rows
                    # 0..Qc-2) with the last row itself, preferring the
                    # larger origin on ties (golden's preference)
                    lastA = a[Qc - 1:Qc, :]
                    prev = pm[Qc - 1:Qc, :]
                    take_last = lastA >= prev
                    dPM[pl.ds(jl, 1), :] = jnp.where(take_last, lastA, prev)
                    for k in range(nms):
                        dPM_ms[k][pl.ds(jl, 1), :] = jnp.where(
                            take_last, T_ms[k][Qc - 1:Qc, :],
                            E_ms[k][Qc - 1:Qc, :])
                        dH_ms[k][pl.ds(jl, 1), :] = H_ms[k][Qc - 1:Qc, :]
                    dPMl[pl.ds(jl, 1), :] = jnp.where(
                        take_last, Tlm[Qc - 1:Qc, :], Elm[Qc - 1:Qc, :])
                    dHl[pl.ds(jl, 1), :] = Hl[Qc - 1:Qc, :]
                else:
                    dPM[pl.ds(jl, 1), :] = jnp.maximum(
                        seed, a.max(axis=0, keepdims=True))
                if want_trace:
                    dE[pl.ds(jl, 1), :] = E[Qc - 1:Qc, :]
            elif rowseg:
                # emit this chunk's down-state for the NEXT row chunk
                # (consumed by the same device's next superstep)
                douth_ref[0, pl.ds(jj, 1), :] = H[Qc - 1:Qc, :]
                if want_stats:
                    lastA = a[Qc - 1:Qc, :]
                    prev = pm[Qc - 1:Qc, :]
                    take_last = lastA >= prev
                    doutp_ref[0, pl.ds(jj, 1), :] = jnp.where(
                        take_last, lastA, prev)
                    for k in range(nms):
                        douts_refs[k][0, pl.ds(jj, 1), :] = \
                            H_ms[k][Qc - 1:Qc, :]
                        douts_refs[nms + 1 + k][0, pl.ds(jj, 1), :] = \
                            jnp.where(take_last, T_ms[k][Qc - 1:Qc, :],
                                      E_ms[k][Qc - 1:Qc, :])
                    douts_refs[nms][0, pl.ds(jj, 1), :] = Hl[Qc - 1:Qc, :]
                    douts_refs[2 * nms + 1][0, pl.ds(jj, 1), :] = jnp.where(
                        take_last, Tlm[Qc - 1:Qc, :], Elm[Qc - 1:Qc, :])
                else:
                    doutp_ref[0, pl.ds(jj, 1), :] = jnp.maximum(
                        seed, a.max(axis=0, keepdims=True))
                if want_trace:
                    doute_ref[0, pl.ds(jj, 1), :] = E[Qc - 1:Qc, :]

            inseq = imask & (j < rlen)
            # packed stats never serve table/rowcol, so the separate
            # plane list only exists in the unpacked branches
            planes = ([H] if (not want_stats or packed) else
                      [H, *H_ms, Hl])
            if want_table:
                for tref, P in zip(tab_refs, planes):
                    tref[0, jj, :, :] = P
            if want_rowcol:
                # last query row value at this column (0 beyond rlen,
                # matching wavefront_align's zero-initialised row)
                rowsel = (ig == qlen - 1) & inseq
                for rref, P in zip(row_refs, planes):
                    rref[0, 0, pl.ds(jj, 1), :] = jnp.where(rowsel, P, 0).sum(
                        axis=0, keepdims=True)
                # last reference column (captured when j == rlen-1)
                colsel = (j == rlen - 1) & imask
                new_colcap = tuple(
                    jnp.where(colsel, P, c)
                    for c, P in zip(st["colcap"], planes))
            else:
                new_colcap = st["colcap"]
            # Saturation tracking: running masked min/max of H — the flag
            # comparisons happen once per block, not per column.  With
            # pack_cand in local mode these planes are elided (H >= 0 and
            # the candidate tracker covers every positive cell, so the
            # extremes derive from it after the loop).
            cand = list(st["cand"])
            if track_sat:
                Hmasked = jnp.where(inseq, H, 0)
                cand[si] = jnp.maximum(cand[si], Hmasked)
                cand[si + 1] = jnp.minimum(cand[si + 1], Hmasked)

            # End-cell candidates: per-row running best (strict > keeps the
            # earliest column per row — the reference's j-ascending tie
            # preference); reduced across rows once per block.
            last_row = ig == qlen - 1
            last_col = j == rlen - 1
            if local:
                if pack_cand and not want_stats:
                    # candidate-update fusion: drop the H > 0 term.  An
                    # H == 0 cell's packed candidate decodes to cb == 0,
                    # which only wins when NO positive cell exists — and
                    # the readout's empty clamp (best <= 0 -> score and
                    # ends 0) already owns that case, so results are
                    # identical.  Saves a compare+and per column
                    # (A/B ledger: PERFORMANCE.md).
                    sel_c = inseq
                else:
                    sel_c = inseq & (H > 0)
            elif mode == "sg":
                sel = last_row & last_col
                if qe:
                    sel = sel | last_row
                if de:
                    sel = sel | last_col
                sel_c = inseq & sel
            else:
                sel_c = last_row & last_col & inseq
            if pack_cand:
                # [H | P-1-j] in one carried plane: max-reduce keeps
                # (H desc, j asc), identical to the strict-> update
                candidate = jnp.where(
                    sel_c, (H << SHJ) | (PJ - 1 - j), neg)
                upd = candidate > cand[0]
                cand[0] = jnp.maximum(cand[0], candidate)
            else:
                upd = sel_c & (H > cand[0])
                cand[0] = jnp.where(upd, H, cand[0])
                cand[1] = jnp.where(upd, j, cand[1])
            if want_stats and packed:
                cand[ci] = jnp.where(upd, H_msl, cand[ci])
            elif want_stats:
                for k in range(nms):
                    cand[ci + k] = jnp.where(upd, H_ms[k], cand[ci + k])
                cand[ci + nms] = jnp.where(upd, Hl, cand[ci + nms])
            return {
                "hp": H, "fp": F, "htop": new_htop,
                "stats": new_stats if want_stats else (),
                "colcap": new_colcap if want_rowcol else (),
                "cand": tuple(cand),
            }

        ncols = jnp.minimum(Jt, rlen_total - jblk * Jt)
        stf = jax.lax.fori_loop(0, ncols, col, st0)

        # Persist the cross-grid-step state back to the scratch refs
        # (the next column block / streamed segment continues from it).
        hprev[:] = stf["hp"]
        fprev[:] = stf["fp"]
        for r in range(nhrows):
            htop_scr[r:r + 1, :] = stf["htop"][r]
        if want_stats and packed:
            hm[:], fm[:] = stf["stats"]
        elif want_stats:
            for dst, val in zip((*h_ms, hl, *f_ms, fl), stf["stats"]):
                dst[:] = val
        for cs, val in zip(col_scratch, stf["colcap"]):
            cs[:] = val
        candf = stf["cand"]

        # Reduce this block's trackers into the cross-block accumulator
        # (same lexicographic rule as the old per-column update: H desc,
        # then i asc; earlier blocks keep ties, preserving j asc).
        if pack_cand:
            # decode [H | P-1-j]: arithmetic shift floors negative
            # sentinels; the low-bit mask works on two's complement
            cb = candf[0] >> SHJ
            rowj = (PJ - 1) - (candf[0] & (PJ - 1))
        else:
            cb, rowj = candf[0], candf[1]
        step_best = cb.max(axis=0, keepdims=True)               # (1, LANES)
        rowhit = cb == step_best
        step_i = jnp.where(rowhit, ig, I32(qp_total)).min(axis=0,
                                                          keepdims=True)
        selrow = rowhit & (ig == step_i)
        step_j = jnp.where(selrow, rowj, 0).sum(axis=0,
                                            keepdims=True)
        best, bi = acc[0:1, :], acc[1:2, :]
        better = (step_best > best) | (
            (step_best == best) & (step_best > neg) & (step_i < bi))
        acc[0:1, :] = jnp.where(better, step_best, best)
        acc[1:2, :] = jnp.where(better, step_i, bi)
        acc[2:3, :] = jnp.where(better, step_j, acc[2:3, :])
        if want_stats and packed:
            msl = jnp.where(selrow, candf[ci], 0).sum(
                axis=0, keepdims=True)
            m_v = jnp.right_shift(msl, SH_M)
            s_v = jnp.bitwise_and(jnp.right_shift(msl, SH_S),
                                  (1 << (SH_M - SH_S)) - 1)
            l_v = jnp.bitwise_and(msl, (1 << SH_S) - 1) - OFFL
            acc[5:6, :] = jnp.where(better, m_v, acc[5:6, :])
            acc[6:7, :] = jnp.where(better, s_v, acc[6:7, :])
            acc[7:8, :] = jnp.where(better, l_v, acc[7:8, :])
        elif want_stats:
            pick = lambda k: jnp.where(selrow, candf[k], 0).sum(
                axis=0, keepdims=True)
            if pack2:
                # decode the fused [m|s] field here so the acc layout
                # (m, s, l rows) is identical across stats modes
                ms = pick(ci)
                m_v = jnp.right_shift(ms, SH2)
                s_v = jnp.bitwise_and(ms, MS_MASK)
                l_v = pick(ci + 1)
            else:
                m_v, s_v, l_v = pick(ci), pick(ci + 1), pick(ci + 2)
            acc[5:6, :] = jnp.where(better, m_v, acc[5:6, :])
            acc[6:7, :] = jnp.where(better, s_v, acc[6:7, :])
            acc[7:8, :] = jnp.where(better, l_v, acc[7:8, :])
        if track_sat:
            if detect8:
                hit8 = ((candf[si] >= WIDTH_MAX["8"]) |
                        (candf[si + 1] <= WIDTH_MIN["8"]))
                acc[3:4, :] = acc[3:4, :] | hit8.any(
                    axis=0, keepdims=True).astype(I32)
            if detect16:
                hit16 = ((candf[si] >= WIDTH_MAX["16"]) |
                         (candf[si + 1] <= WIDTH_MIN["16"]))
                acc[4:5, :] = acc[4:5, :] | hit16.any(
                    axis=0, keepdims=True).astype(I32)
        elif detect8 or detect16:
            # local + pack_cand: H ranges over [0, step_best] — the
            # candidate tracker covers every positive cell, so the block's
            # H extreme IS max(step_best, 0) and the negative bound never
            # trips (H >= 0 in local mode).
            mx = jnp.maximum(step_best, 0)
            if detect8:
                acc[3:4, :] = acc[3:4, :] | (
                    mx >= WIDTH_MAX["8"]).astype(I32)
            if detect16:
                acc[4:5, :] = acc[4:5, :] | (
                    mx >= WIDTH_MAX["16"]).astype(I32)

        @pl.when(jblk == nj - 1)
        def _fini_chunk():
            # each chunk owns its slice of the last-column output
            for cref, cs in zip(col_refs, col_scratch):
                cref[0] = cs[:]
            if stream:
                hout_ref[0, 0] = hprev[:]
                fout_ref[0, 0] = fprev[:]
                tout_ref[0, 0] = htop_scr[:]
                if want_stats:
                    for dst, src in zip(sout_refs, (*h_ms, hl, *f_ms, fl)):
                        dst[0, 0] = src[:]

        @pl.when((tq == nq - 1) & (jblk == nj - 1))
        def _fini():
            out_ref[0] = acc[:]

    return kernel


def build_gpack(profile):
    """Pack profile rows 4-bytes-per-int32, lanes-last: the G-select
    kernel input.

    profile (Bq, Qp, A) int32 -> (nb or 1, NPK, Qp, LANES) int32 with
    gpack[b, p, i, l] holding profile[b*LANES+l, i, 4p:4p+4] as 4 little-
    endian bytes (two's complement).  This replaces the (B, Rp, Qp)
    substitution tensor: letter-indexed (28x smaller for protein), built
    with elementwise ops instead of the MXU-hostile batched K=25 one-hot
    matmul, and reference-segment invariant.  A shared (1, Qp, A)
    profile packs once and broadcasts across lanes.
    """
    Bq, Qp, A = profile.shape
    NPK = _npk(A)
    p8 = jnp.clip(profile, -128, 127).astype(jnp.int8)
    if Bq == 1:
        pT = jnp.swapaxes(p8[0], 0, 1)                       # (A, Qp)
        pT = jnp.pad(pT, ((0, NPK * 4 - A), (0, 0)))
        u = pT.astype(jnp.uint8).astype(jnp.int32)           # (4NPK, Qp)
        packed = (u[0::4] | (u[1::4] << 8)
                  | (u[2::4] << 16) | (u[3::4] << 24))       # (NPK, Qp)
        return jnp.broadcast_to(packed[None, :, :, None],
                                (1, NPK, Qp, LANES))
    nb = Bq // LANES
    # lanes-last first (33 MB int8 relayout), THEN pack along the now-
    # major letter axis — strided slices of a minor dim would force
    # padded relayouts costing more than the pack itself
    pT = p8.reshape(nb, LANES, Qp, A).transpose(0, 3, 2, 1)  # (nb,A,Qp,LANES)
    pT = jnp.pad(pT, ((0, 0), (0, NPK * 4 - A), (0, 0), (0, 0)))
    u = pT.astype(jnp.uint8).astype(jnp.int32)
    return (u[:, 0::4] | (u[:, 1::4] << 8)
            | (u[:, 2::4] << 16) | (u[:, 3::4] << 24))       # (nb,NPK,Qp,LANES)


def build_gpack_from_table(table, qidx):
    """(A, A) substitution table + (B or 1, Qp) query letters -> G-select
    input, bypassing per-pair profile materialization entirely.

    gpack[b, p, i, l] packs table[qidx[b*LANES+l, i], 4p:4p+4]; built
    with A*NPK lane-broadcast selects over (nb, Qp, LANES) planes — no
    MXU batched matmul, no (B, Qp, A) tensor.  Padded query rows
    (qidx -1) pack to score 0.
    """
    A = table.shape[0]
    NPK = _npk(A)
    Bq, Qp = qidx.shape
    t8 = jnp.clip(jnp.asarray(table, I32), -128, 127).astype(jnp.int8)
    t8 = jnp.pad(t8, ((0, 0), (0, NPK * 4 - A)))
    u = t8.astype(jnp.uint8).astype(jnp.int32)
    tp = (u[:, 0::4] | (u[:, 1::4] << 8)
          | (u[:, 2::4] << 16) | (u[:, 3::4] << 24))          # (A, NPK)
    if Bq == 1:
        qT = jnp.asarray(qidx, I32).T[None, :, :]             # (1, Qp, 1)
        nb = 1
    else:
        nb = Bq // LANES
        qT = jnp.asarray(qidx, I32).reshape(
            nb, LANES, Qp).transpose(0, 2, 1)                 # (nb, Qp, LANES)
    planes = []
    for p in range(NPK):
        g = jnp.zeros(qT.shape, I32)
        for a in range(A):
            g = g + jnp.where(qT == a, tp[a, p], 0)
        planes.append(g)
    gp = jnp.stack(planes, axis=1)                 # (nb, NPK, Qp, lanes)
    if Bq == 1:
        gp = jnp.broadcast_to(gp, (1, NPK, Qp, LANES))
    return gp


def _gsel_substitution(gpack_ref, rj, npk):
    """Per-column substitution scores from the packed profile block.

    ``rj`` (1, LANES) int32 reference letters; returns (Qc, LANES) int32
    scores.  Plane select tree (ceil(log2 npk) levels of per-lane
    selects) + byte extract: ~log(A/4) + 3 slab ops per column, replacing
    the scol load.  Out-of-range letters (padding -1) resolve to score 0
    because build_* zero-fills beyond the alphabet/query.
    """
    p = rj >> 2
    planes = [gpack_ref[0, k] for k in range(npk)]
    bit = 0
    while len(planes) > 1:
        if len(planes) % 2:
            planes.append(planes[-1])
        b = ((p >> bit) & 1) == 1
        planes = [jnp.where(b, planes[k + 1], planes[k])
                  for k in range(0, len(planes), 2)]
        bit += 1
    g = planes[0]
    sh = (rj & 3) << 3
    v = (g >> sh) & 255
    return (v ^ 128) - 128


def build_scol(profile, ridx):
    """One-hot MXU matmul: (B, Rp, Qp) substitution scores, column-major.

    S[b, j, i] = profile[b or 0, i, ridx[b, j]] — a (1, Qp, A) profile is
    shared across the batch (profile reuse) and becomes a single plain
    matmul.  f32 accumulation is exact for |score| < 2^24 (every
    parasail-style matrix and any sane PSSM).
    """
    Bp, Qp, A = profile.shape
    onehot = jax.nn.one_hot(ridx, A, dtype=jnp.float32)      # (B, Rp, A)
    if Bp == 1:
        s = jnp.einsum(
            "bra,qa->brq", onehot, profile[0].astype(jnp.float32),
            preferred_element_type=jnp.float32)
    else:
        s = jax.lax.dot_general(
            onehot, profile.astype(jnp.float32),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                    # (B, Rp, Qp)
    return s.astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "free", "width", "outputs", "banded",
                     "interpret", "hmax_bound", "alphabet"),
)
def scan_score_align(
    profile,       # (B or 1, Qp, A) int32; None iff ``gpack`` is given
    ridx,          # (B, Rp) int32
    qlen,          # (B,) int32
    rlen,          # (B,) int32
    qidx=None,     # (B or 1, Qp) int32 — required for stats outputs
    *,
    open_,
    ext,
    mode: str,
    free: tuple[bool, bool, bool, bool],
    width: str = "32",
    outputs: str = "score",
    banded: bool = False,
    bandwidth=0,
    interpret: bool = False,
    hmax_bound: int | None = None,
    gpack=None,    # prebuilt (nb or 1, NPK, Qp, LANES) G-select input
    alphabet: int | None = None,   # static A, required with ``gpack``
):
    """Pallas alignment kernel; same output contract as
    ``wavefront_align`` for every output class.

    B must be a multiple of 128 (the engine pads batches); Qp/Rp are the
    padded buckets.  Scores are exact int32; ``width`` only controls the
    saturation flags (see wavefront_align docstring).  ``scan_fits``
    reports whether a shape/output combination is servable.

    ``hmax_bound`` (static) is an upper bound on |H| over every DP cell
    — e.g. ``(max|s| + open + ext) * (Qp + Rp)`` — and unlocks the
    packed end-cell candidate tracker (one carried plane instead of
    two, plus elided saturation planes in local mode; see
    :func:`cand_pack_params`).  Results are identical either way.
    """
    want_trace, want_stats, want_table, want_rowcol = _classes(outputs)
    nplanes = 4 if want_stats else 1
    if gpack is not None:
        assert alphabet is not None, "gpack requires the static alphabet"
        A, Qp = alphabet, gpack.shape[2]
    else:
        _, Qp, A = profile.shape
    B, Rp = ridx.shape
    assert B % LANES == 0, "batch must be padded to a multiple of 128"
    nb = B // LANES
    gsel = gpack is not None or _gsel(A)
    npk = _npk(A) if gsel else None
    plan = _plan(Qp, Rp, outputs, npk=npk)
    assert plan is not None, (
        f"shape (Qp={Qp}, Rp={Rp}, {outputs}) does not fit the scan "
        f"kernel; route to wavefront_align")
    Qc, nq, Jt, nj = plan
    Rpad = (Rp + 7) // 8 * 8
    chunked = nq > 1

    qlen_b = qlen.reshape(nb, 1, LANES)
    rlen_b = rlen.reshape(nb, 1, LANES)
    gaps = jnp.stack([jnp.asarray(open_, I32), jnp.asarray(ext, I32),
                      jnp.asarray(bandwidth, I32), jnp.asarray(0, I32)])

    kernel = _make_kernel(Qc, nq, Jt, nj, mode, free, width, Rp, Qp,
                          want_trace=want_trace, want_stats=want_stats,
                          want_table=want_table, want_rowcol=want_rowcol,
                          banded=banded, hmax_bound=hmax_bound,
                          gsel_npk=npk)

    inputs = [gaps, qlen_b, rlen_b]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                 # gaps
        pl.BlockSpec((1, 1, LANES), lambda b, t, j: (b, 0, 0),
                     memory_space=pltpu.VMEM),                 # qlen
        pl.BlockSpec((1, 1, LANES), lambda b, t, j: (b, 0, 0),
                     memory_space=pltpu.VMEM),                 # rlen
    ]
    if gsel:
        if gpack is None:
            gpack = build_gpack(profile)   # (nb or 1, npk, Qp, LANES)
        shared = gpack.shape[0] == 1
        inputs.append(gpack)
        in_specs.append(
            pl.BlockSpec((1, npk, Qc, LANES),
                         (lambda b, t, j: (0, 0, t, 0)) if shared else
                         (lambda b, t, j: (b, 0, t, 0)),
                         memory_space=pltpu.VMEM))             # gpack
    else:
        scol = build_scol(profile, ridx)                 # (B, Rp, Qp) int8
        # Lanes-last layout: (nb, Rp, Qp, LANES).
        scol = scol.reshape(nb, LANES, Rp, Qp).transpose(0, 2, 3, 1)
        inputs.append(scol)
        in_specs.append(
            pl.BlockSpec((1, Jt, Qc, LANES), lambda b, t, j: (b, j, t, 0),
                         memory_space=pltpu.VMEM))             # scol
    if want_stats:
        assert qidx is not None, "stats outputs need the mapped query indices"
        qidx_full = jnp.broadcast_to(jnp.asarray(qidx, I32), (B, Qp))
        qidx_b = qidx_full.reshape(nb, LANES, Qp).transpose(0, 2, 1)
        inputs.append(qidx_b)
        in_specs.append(
            pl.BlockSpec((1, Qc, LANES), lambda b, t, j: (b, t, 0),
                         memory_space=pltpu.VMEM))             # qidx
    if want_stats or gsel:
        ridx_b = ridx.reshape(nb, LANES, Rp).transpose(0, 2, 1)
        inputs.append(ridx_b)
        in_specs.append(
            pl.BlockSpec((1, Jt, LANES), lambda b, t, j: (b, j, 0),
                         memory_space=pltpu.VMEM))             # ridx

    out_shape = [jax.ShapeDtypeStruct((nb, 8, LANES), I32)]
    out_specs = [pl.BlockSpec((1, 8, LANES), lambda b, t, j: (b, 0, 0),
                              memory_space=pltpu.VMEM)]
    if want_trace:
        out_shape.append(
            jax.ShapeDtypeStruct((nb, Rp, Qp, LANES), jnp.int8))
        out_specs.append(
            pl.BlockSpec((1, Jt, Qc, LANES), lambda b, t, j: (b, j, t, 0),
                         memory_space=pltpu.VMEM))
    if want_table:
        for _ in range(nplanes):
            out_shape.append(
                jax.ShapeDtypeStruct((nb, Rp, Qp, LANES), I32))
            out_specs.append(
                pl.BlockSpec((1, Jt, Qc, LANES), lambda b, t, j: (b, j, t, 0),
                             memory_space=pltpu.VMEM))
    if want_rowcol:
        for _ in range(nplanes):
            out_shape.append(jax.ShapeDtypeStruct((nb, nq, Rp, LANES), I32))
            out_specs.append(
                pl.BlockSpec((1, 1, Jt, LANES), lambda b, t, j: (b, t, j, 0),
                             memory_space=pltpu.VMEM))
        for _ in range(nplanes):
            out_shape.append(jax.ShapeDtypeStruct((nb, Qp, LANES), I32))
            out_specs.append(
                pl.BlockSpec((1, Qc, LANES), lambda b, t, j: (b, t, 0),
                             memory_space=pltpu.VMEM))

    packed, pack2, nms = stats_layout(Qp, Rp, outputs)
    nstats = 0 if not want_stats else (2 if packed else 2 * nms + 2)
    scratch = [
        pltpu.VMEM((Qc, LANES), I32),      # hprev
        pltpu.VMEM((Qc, LANES), I32),      # fprev
    ]
    if want_stats:
        # packed folds (m, s, l) into one plane each for H/F stats;
        # pack2 folds [m|s] (l separate): 4 planes instead of 6
        scratch += [pltpu.VMEM((Qc, LANES), I32) for _ in range(nstats)]
    if want_rowcol:
        scratch += [pltpu.VMEM((Qc, LANES), I32) for _ in range(nplanes)]
    scratch.append(pltpu.VMEM(
        ((2 if packed else nms + 2) if want_stats else 1, LANES),
        I32))    # htop carry
    if chunked:
        scratch += [pltpu.VMEM((Rpad, LANES), I32),    # dH
                    pltpu.VMEM((Rpad, LANES), I32)]    # dPM
        if want_trace:
            scratch.append(pltpu.VMEM((Rpad, LANES), I32))  # dE
        if want_stats:
            scratch += [pltpu.VMEM((Rpad, LANES), I32)
                        for _ in range(nstats)]
    scratch.append(pltpu.VMEM((8, LANES), I32))    # acc

    res = pl.pallas_call(
        kernel,
        grid=(nb, nq, nj),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)

    res = res if isinstance(res, (tuple, list)) else (res,)
    acc = res[0].transpose(0, 2, 1).reshape(B, 8)
    best, bi, bj = acc[:, 0], acc[:, 1], acc[:, 2]
    sat8, sat16 = acc[:, 3] != 0, acc[:, 4] != 0

    out = {}
    if width == "8":
        out["saturated"] = sat8
    elif width in ("16", "sat"):
        out["saturated"] = sat16
        if width == "sat":
            out["promoted"] = sat8
    else:
        out["saturated"] = jnp.zeros(B, bool)
    if mode == "nw":
        out["score"] = best
        out["end_query"] = qlen - 1
        out["end_ref"] = rlen - 1
    else:
        empty = best <= 0 if mode == "sw" else jnp.zeros_like(best, bool)
        out["score"] = jnp.where(empty, 0, best) if mode == "sw" else best
        out["end_query"] = jnp.where(empty, 0, bi)
        out["end_ref"] = jnp.where(empty, 0, bj)
    if want_stats:
        bm, bs, bl = acc[:, 5], acc[:, 6], acc[:, 7]
        if mode == "sw":
            empty = best <= 0
            bm = jnp.where(empty, 0, bm)
            bs = jnp.where(empty, 0, bs)
            bl = jnp.where(empty, 0, bl)
        out["matches"], out["similar"], out["length"] = bm, bs, bl

    names = ("score", "matches", "similar", "length")[:nplanes]
    ri = 1
    if want_trace:
        # (nb, Rp, Qp, LANES) -> (B, Qp, Rp)
        out["trace_table"] = (
            res[ri].transpose(0, 3, 2, 1).reshape(B, Qp, Rp))
        ri += 1
    if want_table:
        for name in names:
            out[f"{name}_table"] = (
                res[ri].transpose(0, 3, 2, 1).reshape(B, Qp, Rp))
            ri += 1
    if want_rowcol:
        for name in names:
            # chunk axis: the true last query row lives in exactly one
            # chunk; every other chunk contributed zeros
            out[f"{name}_row"] = (
                res[ri].sum(axis=1).transpose(0, 2, 1).reshape(B, Rp))
            ri += 1
        for name in names:
            out[f"{name}_col"] = res[ri].transpose(0, 2, 1).reshape(B, Qp)
            ri += 1
    return out


@functools.partial(
    jax.jit,
    static_argnames=("mode", "free", "width", "outputs", "resume",
                     "interpret", "alphabet"),
)
def scan_score_segment(
    profile,       # (B or 1, Qp, A) int32
    ridx_seg,      # (B, Rseg) int32 — THIS segment's reference columns
    qlen,          # (B,) int32 — global query lengths
    rlen,          # (B,) int32 — GLOBAL reference lengths
    state=None,    # carried state dict from the previous segment
    qidx=None,     # (B or 1, Qp) int32 — required for outputs="stats"
    *,
    open_,
    ext,
    mode: str,
    free: tuple[bool, bool, bool, bool],
    width: str = "32",
    outputs: str = "score",     # "score" | "stats"
    col_offset=0,  # traced: global column index of this segment's start
    resume: bool = False,
    interpret: bool = False,
    gpack=None,    # prebuilt segment-invariant G-select input
    alphabet: int | None = None,   # static A, required with ``gpack``
):
    """One reference segment of a score or stats sweep (unbounded Rp).

    The engine streams segments left to right, threading the carried
    state (per-chunk H/F boundary columns, diag/stat carries, stats
    planes, and the candidate accumulators); after the last segment the
    returned dict matches ``scan_score_align``'s contract for the same
    output class.  Returns (out, new_state).  Passing the prebuilt
    ``gpack`` (letter-indexed, so identical for every segment) skips
    the per-segment substitution build entirely.
    """
    want_stats = outputs == "stats"
    want_trace = outputs == "trace"
    if gpack is not None:
        assert alphabet is not None, "gpack requires the static alphabet"
        A, Qp = alphabet, gpack.shape[2]
    else:
        _, Qp, A = profile.shape
    B, Rseg = ridx_seg.shape
    assert B % LANES == 0
    nb = B // LANES
    gsel = gpack is not None or _gsel(A)
    npk = _npk(A) if gsel else None
    plan = _plan(Qp, Rseg, outputs, npk=npk, stream=True)
    assert plan is not None
    Qc, nq, Jt, nj = plan
    _, _pack2, _nms = stats_layout(Qp, Rseg, outputs, stream=True)
    TROWS = (_nms + 2) if want_stats else 1

    qlen_b = qlen.reshape(nb, 1, LANES)
    rlen_b = rlen.reshape(nb, 1, LANES)
    gaps = jnp.stack([jnp.asarray(open_, I32), jnp.asarray(ext, I32),
                      jnp.asarray(0, I32), jnp.asarray(col_offset, I32)])

    kernel = _make_kernel(Qc, nq, Jt, nj, mode, free, width, Rseg, Qp,
                          want_stats=want_stats, want_trace=want_trace,
                          resume=resume, stream=True, gsel_npk=npk)

    inputs = [gaps, qlen_b, rlen_b]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, LANES), lambda b, t, j: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, LANES), lambda b, t, j: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if gsel:
        if gpack is None:
            gpack = build_gpack(profile)
        shared_g = gpack.shape[0] == 1
        inputs.append(gpack)
        in_specs.append(
            pl.BlockSpec((1, npk, Qc, LANES),
                         (lambda b, t, j: (0, 0, t, 0)) if shared_g else
                         (lambda b, t, j: (b, 0, t, 0)),
                         memory_space=pltpu.VMEM))
    else:
        scol = build_scol(profile, ridx_seg)
        scol = scol.reshape(nb, LANES, Rseg, Qp).transpose(0, 2, 3, 1)
        inputs.append(scol)
        in_specs.append(
            pl.BlockSpec((1, Jt, Qc, LANES), lambda b, t, j: (b, j, t, 0),
                         memory_space=pltpu.VMEM))
    if want_stats:
        assert qidx is not None
        qidx_full = jnp.broadcast_to(jnp.asarray(qidx, I32), (B, Qp))
        qidx_b = qidx_full.reshape(nb, LANES, Qp).transpose(0, 2, 1)
        inputs.append(qidx_b)
        in_specs.append(
            pl.BlockSpec((1, Qc, LANES), lambda b, t, j: (b, t, 0),
                         memory_space=pltpu.VMEM))
    if want_stats or gsel:
        ridx_b = ridx_seg.reshape(nb, LANES, Rseg).transpose(0, 2, 1)
        inputs.append(ridx_b)
        in_specs.append(
            pl.BlockSpec((1, Jt, LANES), lambda b, t, j: (b, j, 0),
                         memory_space=pltpu.VMEM))

    chunk_spec = pl.BlockSpec((1, 1, Qc, LANES), lambda b, t, j: (b, t, 0, 0),
                              memory_space=pltpu.VMEM)
    carry_spec = pl.BlockSpec(
        (1, 1, TROWS, LANES), lambda b, t, j: (b, t, 0, 0),
        memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((1, 8, LANES), lambda b, t, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    nstate = (2 * _nms + 2) if want_stats else 0
    if resume:
        inputs += [state["h"], state["f"], state["t"], state["acc"]]
        in_specs += [chunk_spec, chunk_spec, carry_spec, acc_spec]
        if want_stats:
            inputs += list(state["stats"])
            in_specs += [chunk_spec] * nstate

    out_shape = [
        jax.ShapeDtypeStruct((nb, 8, LANES), I32),
        jax.ShapeDtypeStruct((nb, nq, Qc, LANES), I32),      # H boundary
        jax.ShapeDtypeStruct((nb, nq, Qc, LANES), I32),      # F boundary
        jax.ShapeDtypeStruct((nb, nq, TROWS, LANES), I32),   # diag carry
    ] + [jax.ShapeDtypeStruct((nb, nq, Qc, LANES), I32)] * nstate
    out_specs = [acc_spec, chunk_spec, chunk_spec, carry_spec] + \
        [chunk_spec] * nstate
    if want_trace:
        out_shape.append(
            jax.ShapeDtypeStruct((nb, Rseg, Qp, LANES), jnp.int8))
        out_specs.append(
            pl.BlockSpec((1, Jt, Qc, LANES), lambda b, t, j: (b, j, t, 0),
                         memory_space=pltpu.VMEM))
    Rpad = (Rseg + 7) // 8 * 8
    scratch = [
        pltpu.VMEM((Qc, LANES), I32),      # hprev
        pltpu.VMEM((Qc, LANES), I32),      # fprev
    ]
    if want_stats:
        scratch += [pltpu.VMEM((Qc, LANES), I32) for _ in range(nstate)]
    scratch.append(pltpu.VMEM((TROWS, LANES), I32))  # htop carry
    if nq > 1:
        scratch += [pltpu.VMEM((Rpad, LANES), I32),
                    pltpu.VMEM((Rpad, LANES), I32)]
        if want_trace:
            scratch.append(pltpu.VMEM((Rpad, LANES), I32))   # dE
        if want_stats:
            scratch += [pltpu.VMEM((Rpad, LANES), I32)
                        for _ in range(nstate)]
    scratch.append(pltpu.VMEM((8, LANES), I32))

    res = pl.pallas_call(
        kernel,
        grid=(nb, nq, nj),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)

    acc_dev, hout, fout, tout = res[0], res[1], res[2], res[3]
    new_state = {"h": hout, "f": fout, "t": tout, "acc": acc_dev}
    if want_stats:
        new_state["stats"] = tuple(res[4:4 + nstate])

    acc = acc_dev.transpose(0, 2, 1).reshape(B, 8)
    best, bi, bj = acc[:, 0], acc[:, 1], acc[:, 2]
    sat8, sat16 = acc[:, 3] != 0, acc[:, 4] != 0
    out = {}
    if width == "8":
        out["saturated"] = sat8
    elif width in ("16", "sat"):
        out["saturated"] = sat16
        if width == "sat":
            out["promoted"] = sat8
    else:
        out["saturated"] = jnp.zeros(B, bool)
    if mode == "nw":
        out["score"] = best
        out["end_query"] = qlen - 1
        out["end_ref"] = rlen - 1
    else:
        empty = best <= 0 if mode == "sw" else jnp.zeros_like(best, bool)
        out["score"] = jnp.where(empty, 0, best) if mode == "sw" else best
        out["end_query"] = jnp.where(empty, 0, bi)
        out["end_ref"] = jnp.where(empty, 0, bj)
    if want_stats:
        bm, bs, bl = acc[:, 5], acc[:, 6], acc[:, 7]
        if mode == "sw":
            empty = best <= 0
            bm = jnp.where(empty, 0, bm)
            bs = jnp.where(empty, 0, bs)
            bl = jnp.where(empty, 0, bl)
        out["matches"], out["similar"], out["length"] = bm, bs, bl
    if want_trace:
        # this segment's flag plane, (B, Qp, Rseg); the engine
        # concatenates segments along the reference axis
        out["trace_table_seg"] = (
            res[4 + nstate].transpose(0, 3, 2, 1).reshape(B, Qp, Rseg))
    return out, new_state


def rowseg_plan(q_chunk, C, outputs, A):
    """(Jt, nj) column tiling for a seqpar rowseg tile, or None if the
    (q_chunk x C) tile cannot run as ONE unchunked kernel call."""
    plan = _plan(q_chunk, C, outputs, npk=_npk(A), stream=True,
                 rowseg=True)
    if plan is None or plan[0] != q_chunk or plan[1] != 1:
        return None
    return plan[2], plan[3]


def scan_rowseg_step(
    gpack_chunk,   # (nb or 1, NPK, Qc, LANES) int32 — THIS row chunk
    ridx_seg,      # (B, C) int32 — the device's reference column shard
    qlen,          # (B,) int32 — GLOBAL query lengths
    rlen,          # (B,) int32 — GLOBAL reference lengths
    state,         # left-edge resume state {h, f, t, acc[, stats]}
    down,          # {h, pm[, e][, stats]} down planes, (nb, C, LANES)
    qidx_chunk=None,   # (B or 1, Qc) int32 — required for stats
    *,
    open_,
    ext,
    mode: str,
    free: tuple[bool, bool, bool, bool],
    width: str = "32",
    outputs: str = "score",     # "score" | "stats" | "trace"
    row_offset,    # traced: global row index of this chunk's first row
    col_offset,    # traced: global column index of this shard's start
    qp_total: int,  # static: global padded query length (sentinels)
    interpret: bool = False,
    alphabet: int,  # static A
):
    """One (row chunk x column shard) tile of a sequence-parallel fill.

    The Pallas twin of one ``superstep`` tile in dist/seqpar.py: device d
    holds reference columns [col_offset, col_offset+C) and sweeps them
    for query rows [row_offset, row_offset+Qc).  State threads two ways —
    ``state`` rides rightward (the shard's final H/F/diag column, the
    halo a neighbor consumes via ppermute), ``down`` rides downward
    (device-local, per-column last-row H / prefix-max seeds / stats / E).
    The caller pre-fills both with bordered boundary values when no
    producer tile exists (row chunk 0 / device 0) — see
    dist/seqpar_scan.py.  G-select only (A <= 32); requires the same
    gap_open >= gap_extend (> for stats) exactness contract as the other
    scan kernels.  Returns (new_state, new_down, trace_tile_or_None).
    """
    want_stats = outputs == "stats"
    want_trace = outputs == "trace"
    A = alphabet
    npk = _npk(A)
    Qc = gpack_chunk.shape[2]
    B, C = ridx_seg.shape
    assert B % LANES == 0
    nb = B // LANES
    tile = rowseg_plan(Qc, C, outputs, A)
    assert tile is not None, (
        f"rowseg tile (Qc={Qc}, C={C}, {outputs}) does not fit VMEM "
        f"unchunked; lower q_chunk")
    Jt, nj = tile
    TROWS = 4 if want_stats else 1

    qlen_b = jnp.asarray(qlen, I32).reshape(nb, 1, LANES)
    rlen_b = jnp.asarray(rlen, I32).reshape(nb, 1, LANES)
    gaps = jnp.stack([jnp.asarray(open_, I32), jnp.asarray(ext, I32),
                      jnp.asarray(0, I32), jnp.asarray(col_offset, I32),
                      jnp.asarray(row_offset, I32)])

    kernel = _make_kernel(Qc, 1, Jt, nj, mode, free, width, C, qp_total,
                          want_stats=want_stats, want_trace=want_trace,
                          resume=True, stream=True, gsel_npk=npk,
                          rowseg=True)

    shared_g = gpack_chunk.shape[0] == 1
    inputs = [gaps, qlen_b, rlen_b, gpack_chunk]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, LANES), lambda b, t, j: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, LANES), lambda b, t, j: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, npk, Qc, LANES),
                     (lambda b, t, j: (0, 0, 0, 0)) if shared_g else
                     (lambda b, t, j: (b, 0, 0, 0)),
                     memory_space=pltpu.VMEM),
    ]
    if want_stats:
        assert qidx_chunk is not None
        qidx_full = jnp.broadcast_to(jnp.asarray(qidx_chunk, I32), (B, Qc))
        qidx_b = qidx_full.reshape(nb, LANES, Qc).transpose(0, 2, 1)
        inputs.append(qidx_b)
        in_specs.append(
            pl.BlockSpec((1, Qc, LANES), lambda b, t, j: (b, t, 0),
                         memory_space=pltpu.VMEM))
    ridx_b = jnp.asarray(ridx_seg, I32).reshape(
        nb, LANES, C).transpose(0, 2, 1)
    inputs.append(ridx_b)
    in_specs.append(
        pl.BlockSpec((1, Jt, LANES), lambda b, t, j: (b, j, 0),
                     memory_space=pltpu.VMEM))

    chunk_spec = pl.BlockSpec((1, 1, Qc, LANES), lambda b, t, j: (b, t, 0, 0),
                              memory_space=pltpu.VMEM)
    carry_spec = pl.BlockSpec(
        (1, 1, TROWS, LANES), lambda b, t, j: (b, t, 0, 0),
        memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((1, 8, LANES), lambda b, t, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    down_spec = pl.BlockSpec((1, Jt, LANES), lambda b, t, j: (b, j, 0),
                             memory_space=pltpu.VMEM)
    nstate = 6 if want_stats else 0
    ndown = 2 + (1 if want_trace else 0) + nstate

    inputs += [state["h"], state["f"], state["t"], state["acc"]]
    in_specs += [chunk_spec, chunk_spec, carry_spec, acc_spec]
    if want_stats:
        inputs += list(state["stats"])
        in_specs += [chunk_spec] * nstate
    inputs += [down["h"], down["pm"]]
    in_specs += [down_spec, down_spec]
    if want_trace:
        inputs.append(down["e"])
        in_specs.append(down_spec)
    if want_stats:
        inputs += list(down["stats"])
        in_specs += [down_spec] * nstate

    out_shape = [
        jax.ShapeDtypeStruct((nb, 8, LANES), I32),
        jax.ShapeDtypeStruct((nb, 1, Qc, LANES), I32),       # H boundary
        jax.ShapeDtypeStruct((nb, 1, Qc, LANES), I32),       # F boundary
        jax.ShapeDtypeStruct((nb, 1, TROWS, LANES), I32),    # diag carry
    ] + [jax.ShapeDtypeStruct((nb, 1, Qc, LANES), I32)] * nstate \
      + [jax.ShapeDtypeStruct((nb, C, LANES), I32)] * ndown
    out_specs = [acc_spec, chunk_spec, chunk_spec, carry_spec] + \
        [chunk_spec] * nstate + [down_spec] * ndown
    if want_trace:
        out_shape.append(
            jax.ShapeDtypeStruct((nb, C, Qc, LANES), jnp.int8))
        out_specs.append(
            pl.BlockSpec((1, Jt, Qc, LANES), lambda b, t, j: (b, j, t, 0),
                         memory_space=pltpu.VMEM))

    scratch = [
        pltpu.VMEM((Qc, LANES), I32),      # hprev
        pltpu.VMEM((Qc, LANES), I32),      # fprev
    ]
    if want_stats:
        scratch += [pltpu.VMEM((Qc, LANES), I32) for _ in range(6)]
    scratch.append(pltpu.VMEM((TROWS, LANES), I32))  # htop carry
    scratch.append(pltpu.VMEM((8, LANES), I32))      # acc

    res = pl.pallas_call(
        kernel,
        grid=(nb, 1, nj),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)

    new_state = {"acc": res[0], "h": res[1], "f": res[2], "t": res[3]}
    ri = 4
    if want_stats:
        new_state["stats"] = tuple(res[ri:ri + nstate])
        ri += nstate
    new_down = {"h": res[ri], "pm": res[ri + 1]}
    ri += 2
    if want_trace:
        new_down["e"] = res[ri]
        ri += 1
    if want_stats:
        new_down["stats"] = tuple(res[ri:ri + nstate])
        ri += nstate
    trace_tile = res[ri] if want_trace else None
    return new_state, new_down, trace_tile
