"""Pallas-native sequence-parallel fill: the scan kernel under shard_map.

The production form of dist/seqpar.py's pipelined wavefront: the
reference axis is sharded into contiguous column chunks over the mesh,
query chunks pipeline down the device ring (device d works on query
chunk t at superstep s = t + d), and every (row chunk x column shard)
tile runs as ONE :func:`ops.scan_kernel.scan_rowseg_step` Pallas call —
the same ~35-slab-op column sweep that serves single-chip batches, not
an XLA ``lax.scan`` re-derivation.  Two state flows, identical to the
XLA twin:

- rightward (``lax.ppermute`` over ICI): the tile's final H/F column,
  the diagonal carry row, and the stats planes — the streamed kernel's
  resume state, consumed by the right neighbor's next superstep;
- downward (device-local): per-column last-row H, the cross-chunk
  prefix-max seeds (+ stats payload seeds, + E for trace), threaded
  through the rowseg kernel's down-state refs.

Layout follows the engine (pairs ride the 128 vector lanes), so the
natural unit is a BATCH of long pairs: 128 pairs x (Qp x Rp) cells per
mesh, each pair's DP matrix column-sharded across every chip.  For a
single pair, lanes carry padding and the XLA path's (Qc, B) layout
wastes the same vector width — this route still wins on the kernel's
per-column cost.

Exactness: G-select only (alphabet <= 32 — every parasail matrix); any
penalty pair for value outputs (the vertical scan runs at slope
min(open, ext) — scan_kernel.py), stats strictly gap_open > gap_extend.
Callers outside that envelope use dist/seqpar.seqpar_align.

The reference has no distributed analog (its long-sequence story is the
scalar banded NW, src/aligner/mod.rs:454-489); this is the designed-
fresh TPU scaling path, bit-exact vs the golden oracle and the XLA
sequence-parallel implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..constants import NEG_INF32
from ..ops.scan_kernel import (
    BIG,
    LANES,
    _npk,
    build_gpack,
    rowseg_plan,
    scan_rowseg_step,
)
from .seqpar import _shard_map

I32 = jnp.int32


def seqpar_scan_fits(q_chunk: int, Rp: int, n_devices: int,
                     outputs: str, A: int, Qp: int | None = None,
                     batch: int = LANES, gap_open: int | None = None,
                     gap_extend: int | None = None) -> bool:
    """Can the Pallas rowseg route serve this seqpar configuration?

    Pass ``gap_open``/``gap_extend`` to also enforce the scan kernel's
    stats tie contract (stats need strict gap_open > gap_extend; value
    outputs are exact for any penalty pair).
    For ``outputs="trace"`` pass ``Qp``/``batch`` too: every device
    accumulates its (batch, Qp, Rp/D) int8 flag shard in HBM during the
    pipeline, and the route declines when that exceeds 4 GB.
    """
    if A > 32 or outputs not in ("score", "stats", "trace"):
        return False
    if Rp % n_devices or q_chunk % 8:
        return False
    if gap_open is not None and gap_extend is not None:
        if outputs == "stats" and gap_open <= gap_extend:
            return False
    if outputs == "trace" and Qp is not None:
        Bp = (batch + LANES - 1) // LANES * LANES
        if Bp * Qp * (Rp // n_devices) > 4 << 30:
            return False
    return rowseg_plan(q_chunk, Rp // n_devices, outputs, A) is not None


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "mode", "free", "q_chunk", "outputs",
                     "width", "interpret", "alphabet"),
)
def _seqpar_scan(
    profile, ridx, qlen, rlen, qidx, open_, ext, *,
    mesh: Mesh, mode: str, free, q_chunk: int, outputs: str,
    width: str, interpret: bool, alphabet: int,
):
    want_stats = outputs == "stats"
    want_trace = outputs == "trace"
    A = alphabet
    B, Rp = ridx.shape
    Qp = profile.shape[1]
    nb = B // LANES
    D = mesh.devices.size
    C = Rp // D
    S = Qp // q_chunk
    Qc = q_chunk
    axis = mesh.axis_names[0]
    local = mode == "sw"
    qb, qe, db, de = (True,) * 4 if local else free
    neg = NEG_INF32
    open_ = jnp.asarray(open_, I32)
    ext = jnp.asarray(ext, I32)
    TROWS = 4 if want_stats else 1

    # the packed letter-indexed profile is row-chunk sliceable and
    # reference-segment invariant: build it once, replicate
    gpack = build_gpack(profile)
    gnb = gpack.shape[0]

    def border(c):
        # bordered boundary H value at distance c from the corner
        return jnp.where(c > 0, -(open_ + (c - 1) * ext), 0).astype(I32)

    def device_fn(gpack, ridx_sh, qlen, rlen, qidx):
        d = jax.lax.axis_index(axis)
        j0 = d * C

        def lanes_bcast(v):                          # (C,) -> (nb, C, LANES)
            return jnp.broadcast_to(v[None, :, None], (nb, C, LANES))

        cols = j0 + jnp.arange(C, dtype=I32)         # global column index
        zc = jnp.zeros((C,), I32)
        topb = zc if (qb or local) else border(cols + 1)
        top_len = zc if (qb or local) else cols + 1
        # down-state of the virtual row above the matrix (row chunk 0).
        # The PM seed lives in the kernel's A-domain, whose slope is
        # min(open, ext) (scan_kernel.py: exact for any penalties):
        # A[-1] = H[0][j+1] - open + min(open, ext) * (-1).
        bd_down = {"h": lanes_bcast(topb),
                   "pm": lanes_bcast(topb - open_
                                     - jnp.minimum(ext, open_))}
        if want_trace:
            bd_down["e"] = jnp.full((nb, C, LANES), neg, I32)
        if want_stats:
            z3 = lanes_bcast(zc)
            bd_down["stats"] = (z3, z3, lanes_bcast(top_len),
                                z3, z3, lanes_bcast(top_len + 1))

        def bstate(r0):
            # left-edge resume state for device 0: the bordered boundary
            # column at rows [r0, r0+Qc) — mirrors the streamed kernel's
            # non-resume _init_chunk
            ig = r0 + jnp.arange(Qc, dtype=I32)
            lfree = db or local
            lb = (lambda c: jnp.zeros_like(c)) if lfree else border

            def rows_bcast(v):                   # (Qc,) -> (nb, 1, Qc, LANES)
                return jnp.broadcast_to(v[None, None, :, None],
                                        (nb, 1, Qc, LANES))

            st = {"h": rows_bcast(lb(ig + 1)),
                  "f": jnp.full((nb, 1, Qc, LANES), neg, I32)}
            t0 = lb(jnp.asarray(r0, I32))
            trows = [t0]
            if want_stats:
                zi = jnp.asarray(0, I32)
                trows += [zi, zi, zi if lfree else jnp.asarray(r0, I32)]
            st["t"] = jnp.broadcast_to(
                jnp.stack(trows)[None, None, :, None],
                (nb, 1, TROWS, LANES))
            if want_stats:
                zq = jnp.zeros((nb, 1, Qc, LANES), I32)
                hl = zq if lfree else rows_bcast(ig + 1)
                st["stats"] = (zq, zq, hl, zq, zq, zq)
            return st

        acc0 = jnp.zeros((nb, 8, LANES), I32)
        acc0 = acc0.at[:, 0].set(neg)
        acc0 = acc0.at[:, 1].set(I32(Qp))
        acc0 = acc0.at[:, 2].set(I32(BIG))
        halo0 = bstate(jnp.asarray(0, I32))    # placeholder shapes
        tbuf0 = jnp.zeros(
            (S, nb, C, Qc, LANES) if want_trace else (1,) * 5, jnp.int8)

        def superstep(carry, s):
            halo, acc, down, tbuf = carry
            t = s - d
            active = (t >= 0) & (t < S)
            tc = jnp.clip(t, 0, S - 1)
            r0 = tc * Qc
            bs = bstate(r0)
            d0 = d == 0
            state_in = {
                "h": jnp.where(d0, bs["h"], halo["h"]),
                "f": jnp.where(d0, bs["f"], halo["f"]),
                "t": jnp.where(d0, bs["t"], halo["t"]),
                "acc": acc,
            }
            if want_stats:
                state_in["stats"] = tuple(
                    jnp.where(d0, b, h)
                    for b, h in zip(bs["stats"], halo["stats"]))
            t0 = t == 0
            down_in = {k: jnp.where(t0, bd_down[k], down[k])
                       for k in ("h", "pm") + (("e",) if want_trace else ())}
            if want_stats:
                down_in["stats"] = tuple(
                    jnp.where(t0, b, v)
                    for b, v in zip(bd_down["stats"], down["stats"]))
            gpk = jax.lax.dynamic_slice(
                gpack, (0, 0, r0, 0), (gnb, _npk(A), Qc, LANES))
            qx = (jax.lax.dynamic_slice(
                qidx, (0, r0), (qidx.shape[0], Qc)) if want_stats else None)
            new_state, new_down, ttile = scan_rowseg_step(
                gpk, ridx_sh, qlen, rlen, state_in, down_in, qx,
                open_=open_, ext=ext, mode=mode, free=free, width=width,
                outputs=outputs, row_offset=r0, col_offset=j0,
                qp_total=Qp, interpret=interpret, alphabet=A)

            upd = lambda old, new: jnp.where(active, new, old)
            acc = upd(acc, new_state["acc"])
            down = jax.tree.map(upd, down, {k: v for k, v in
                                            new_down.items()})
            # the halo rides the ring: what device d sends at superstep s
            # is consumed by d+1 at s+1, whose tile (d+1, t) is active
            # exactly when (d, t) was — stale sends land on idle tiles
            perm = [(k, k + 1) for k in range(D - 1)]
            pp = lambda x: jax.lax.ppermute(x, axis, perm)
            old_halo = halo
            halo = {
                "h": pp(upd(old_halo["h"], new_state["h"])),
                "f": pp(upd(old_halo["f"], new_state["f"])),
                "t": pp(upd(old_halo["t"], new_state["t"])),
            }
            if want_stats:
                halo["stats"] = tuple(
                    pp(upd(o, n)) for o, n in
                    zip(old_halo["stats"], new_state["stats"]))
            if want_trace:
                old = jax.lax.dynamic_slice(
                    tbuf, (tc, 0, 0, 0, 0), (1,) + tbuf.shape[1:])
                tbuf = jax.lax.dynamic_update_slice(
                    tbuf, jnp.where(active, ttile[None], old),
                    (tc, 0, 0, 0, 0))
            return (halo, acc, down, tbuf), None

        halo_init = dict(halo0)
        carry0 = (halo_init, acc0, dict(bd_down), tbuf0)
        (halo, acc, down, tbuf), _ = jax.lax.scan(
            superstep, carry0, jnp.arange(S + D - 1, dtype=I32))

        # combine per-device candidate accumulators:
        # (score desc, i asc, j asc), stats of the winner, OR of flags
        accT = acc.transpose(0, 2, 1).reshape(B, 8)
        stacked = jnp.stack([accT[:, k] for k in range(8)])     # (8, B)
        allb = jax.lax.all_gather(stacked, axis)                # (D, 8, B)
        gb = allb[:, 0].max(axis=0)
        is_max = allb[:, 0] == gb[None, :]
        gi = jnp.where(is_max, allb[:, 1], I32(Qp)).min(axis=0)
        gj = jnp.where(is_max & (allb[:, 1] == gi[None, :]),
                       allb[:, 2], I32(BIG)).min(axis=0)
        win = is_max & (allb[:, 1] == gi[None, :]) & \
            (allb[:, 2] == gj[None, :])
        sat8 = allb[:, 3].max(axis=0)
        sat16 = allb[:, 4].max(axis=0)
        gm = jnp.where(win, allb[:, 5], 0).max(axis=0)
        gs = jnp.where(win, allb[:, 6], 0).max(axis=0)
        gl = jnp.where(win, allb[:, 7], 0).max(axis=0)
        res = (gb, gi, gj, sat8, sat16, gm, gs, gl)
        if want_trace:
            # (S, nb, C, Qc, LANES) -> (B, Qp, C): this device's shard
            tplane = tbuf.transpose(1, 4, 0, 3, 2).reshape(B, Qp, C)
            res = res + (tplane,)
        return res

    rep = P()
    out_specs = (rep,) * 8
    if want_trace:
        out_specs = out_specs + (P(None, None, axis),)
    fn = _shard_map(
        device_fn, mesh,
        in_specs=(rep, P(None, axis), rep, rep, rep),
        out_specs=out_specs,
    )
    if qidx is None:
        qidx = jnp.zeros((1, Qp), I32)
    res = fn(gpack, ridx, qlen, rlen, jnp.asarray(qidx, I32))
    gb, gi, gj, sat8, sat16, gm, gs, gl = res[:8]

    out = {}
    if width == "8":
        out["saturated"] = sat8 != 0
    elif width in ("16", "sat"):
        out["saturated"] = sat16 != 0
        if width == "sat":
            out["promoted"] = sat8 != 0
    else:
        out["saturated"] = jnp.zeros(B, bool)
    if mode == "nw":
        out.update(score=gb, end_query=qlen - 1, end_ref=rlen - 1)
    else:
        empty = gb <= 0 if local else jnp.zeros_like(gb, bool)
        out["score"] = jnp.where(empty, 0, gb) if local else gb
        out["end_query"] = jnp.where(empty, 0, gi)
        out["end_ref"] = jnp.where(empty, 0, gj)
    if want_stats:
        if local:
            empty = gb <= 0
            gm = jnp.where(empty, 0, gm)
            gs = jnp.where(empty, 0, gs)
            gl = jnp.where(empty, 0, gl)
        out["matches"], out["similar"], out["length"] = gm, gs, gl
    if want_trace:
        out["trace_table"] = res[8]
    return out


def seqpar_align_scan(
    profile,      # (B or 1, Qp, A) int32 — engine-convention profile rows
    ridx,         # (B, Rp) int32 — reference indices (column-sharded)
    qlen,         # (B,) int32
    rlen,         # (B,) int32
    qidx=None,    # (B or 1, Qp) int32 — required for outputs="stats"
    *,
    open_,
    ext,
    mesh: Mesh,
    mode: str,
    free: tuple[bool, bool, bool, bool] = (False,) * 4,
    q_chunk: int = 256,
    outputs: str = "score",
    width: str = "32",
    interpret: bool | None = None,
):
    """Sequence-parallel alignment through the Pallas scan kernel.

    Same result contract as :func:`dist.seqpar.seqpar_align` (score /
    end coordinates, + matches/similar/length for ``outputs="stats"``,
    + a column-sharded ``trace_table`` for ``outputs="trace"``), but
    engine-convention inputs (batch-major, like ``scan_score_align``)
    and the production kernel per tile.  The batch is padded to 128
    lanes internally; Rp must divide the mesh size and Qp must divide
    ``q_chunk``.  Requires alphabet <= 32 (G-select) and the scan
    kernel's gap contract — use :func:`seqpar_scan_fits` to gate, and
    fall back to the XLA implementation otherwise.
    """
    assert outputs in ("score", "stats", "trace"), outputs
    if outputs == "stats" and qidx is None:
        raise ValueError("outputs='stats' needs the mapped query indices "
                         "(qidx) — matches are counted against them")
    profile = np.asarray(profile, np.int32)
    if profile.min() < -128 or profile.max() > 127:
        # the packed G-select profile stores int8 scores; clipping would
        # silently change results — such matrices take the XLA route
        raise ValueError("substitution scores exceed int8; "
                         "use dist.seqpar.seqpar_align")
    ridx = np.asarray(ridx, np.int32)
    qlen = np.asarray(qlen, np.int32)
    rlen = np.asarray(rlen, np.int32)
    Bq, Qp, A = profile.shape
    B0, Rp = ridx.shape
    D = mesh.devices.size
    if not seqpar_scan_fits(q_chunk, Rp, D, outputs, A, Qp=Qp, batch=B0,
                            gap_open=int(open_), gap_extend=int(ext)):
        raise ValueError(
            f"seqpar scan route cannot serve (q_chunk={q_chunk}, Rp={Rp}, "
            f"D={D}, {outputs}, A={A}, gaps={int(open_)}/{int(ext)}); "
            f"use dist.seqpar.seqpar_align")
    assert Qp % q_chunk == 0, "pad the query to a q_chunk multiple"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    Bp = (B0 + LANES - 1) // LANES * LANES
    shared = Bq == 1

    def padb(x):
        if x.shape[0] == Bp:
            return x
        return np.pad(x, [(0, Bp - x.shape[0])] + [(0, 0)] * (x.ndim - 1))

    prof = profile if shared else padb(profile)
    if qidx is not None:
        qidx = np.asarray(qidx, np.int32)
        qidx = qidx if qidx.shape[0] == 1 else padb(qidx)
    out = _seqpar_scan(
        jnp.asarray(prof), jnp.asarray(padb(ridx)),
        jnp.asarray(padb(qlen)), jnp.asarray(padb(rlen)),
        None if qidx is None else jnp.asarray(qidx),
        jnp.asarray(open_, jnp.int32), jnp.asarray(ext, jnp.int32),
        mesh=mesh, mode=mode, free=tuple(free), q_chunk=q_chunk,
        outputs=outputs, width=width, interpret=interpret, alphabet=A)
    if Bp != B0:
        out = {k: v[:B0] for k, v in out.items()}
    return out
