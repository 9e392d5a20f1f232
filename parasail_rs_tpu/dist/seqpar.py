"""Sequence-parallel DP fill: one (huge) pair sharded across chips.

The DP-matrix analog of ring attention (SURVEY.md §5.7): the reference
axis is sharded into contiguous column chunks over the ``seq`` axis of a
device mesh, the query axis is cut into chunks, and the fill proceeds as
a pipelined wavefront over (query-chunk x device) tiles — device d works
on query-chunk t at super-step s = t + d.  Two state flows:

- rightward (device -> right neighbor, ``lax.ppermute`` over ICI): the
  final (H, F) column of the device's chunk for the current query-chunk
  rows, plus the above-row diagonal cell — the halo the neighbor's first
  column consumes;
- downward (device-local): per column, the last-row H and the running
  prefix-max PM[j] = max_{k<r0} (Htemp[k,j] - open + ext*k), which seeds
  the vertical-gap prefix scan of the next query-chunk (the same scan
  trick as ops/scan_kernel.py, so exactness likewise needs
  gap_open >= gap_extend).

The reference's closest feature is the scalar banded NW offered for
"large sequences" (src/aligner/mod.rs:454-489); there is no distributed
analog to port — this is the designed-fresh long-sequence story.

Substitution scores are produced per tile by an on-the-fly one-hot
matmul (no global substitution tensor is ever materialized), so memory
per device is O(Qp + C·Qc), independent of the full Qp x Rp problem.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import NEG_INF32

I32 = jnp.int32


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except (AttributeError, TypeError):
        from jax.experimental.shard_map import shard_map

        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def _prefix_max_exclusive(a, ii, seed):
    neg = NEG_INF32
    x = jnp.where(ii == 0, seed, jnp.roll(a, 1, axis=0))
    s = 1
    while s < a.shape[0]:
        x = jnp.maximum(x, jnp.where(ii >= s, jnp.roll(x, s, axis=0), neg))
        s *= 2
    return x


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "mode", "free", "q_chunk"),
)
def seqpar_align(
    profile,      # (Qp, A, B) int32 — query profile rows, replicated
    ridx,         # (Rp, B) int32 — reference indices, sharded over "seq"
    qlen,         # (B,) int32
    rlen,         # (B,) int32
    *,
    open_,
    ext,
    mesh: Mesh,
    mode: str,
    free: tuple[bool, bool, bool, bool] = (False,) * 4,
    q_chunk: int = 256,
):
    """Score + end coordinates for pairs too long for one chip.

    Rp must divide by the mesh size; Qp by ``q_chunk``.  Returns
    {score, end_query, end_ref} (B,) int32, bit-exact vs the golden
    oracle (same candidate tie-breaks as the single-chip kernels).
    """
    Qp, A, B = profile.shape
    Rp = ridx.shape[0]
    D = mesh.devices.size
    assert Rp % D == 0 and Qp % q_chunk == 0
    C = Rp // D
    S = Qp // q_chunk
    Qc = q_chunk
    axis = mesh.axis_names[0]
    local = mode == "sw"
    qb, qe, db, de = (True,) * 4 if local else free
    neg = NEG_INF32
    open_ = jnp.asarray(open_, I32)
    ext = jnp.asarray(ext, I32)

    def top_b(jg):  # bordered H[0][jg]
        v = jnp.where(jg > 0, -(open_ + (jg - 1) * ext), 0).astype(I32)
        return jnp.zeros_like(v) if qb or local else v

    def left_b(ig):  # bordered H[ig][0]
        v = jnp.where(ig > 0, -(open_ + (ig - 1) * ext), 0).astype(I32)
        return jnp.zeros_like(v) if db or local else v

    def device_fn(profile, ridx_sh, qlen, rlen):
        # ridx_sh: (C, B) — this device's column chunk.
        d = jax.lax.axis_index(axis)
        jg0 = d * C                                   # first global column
        onehot = jax.nn.one_hot(ridx_sh, A, dtype=jnp.float32,
                                axis=1)               # (C, A, B)
        iic = jax.lax.broadcasted_iota(I32, (Qc, B), 0)

        def superstep(carry, s):
            (dHlast, dPM, halo_h, halo_f, halo_top,
             best, bi, bj) = carry
            t = s - d
            active = (t >= 0) & (t < S)
            tc = jnp.clip(t, 0, S - 1)
            r0 = tc * Qc                              # first global row
            prof_c = jax.lax.dynamic_slice(
                profile, (r0, 0, 0), (Qc, A, B)).astype(jnp.float32)
            # (C, Qc, B) substitution tile via one-hot MXU matmul.
            stile = jnp.einsum(
                "cab,qab->cqb", onehot, prof_c,
                preferred_element_type=jnp.float32).astype(I32)

            # Left edge of this device's sweep: halo from the left
            # neighbor, or the bordered boundary for device 0.
            hcol0 = jnp.where(d == 0, left_b(r0 + iic + 1), halo_h)
            fcol0 = jnp.where(d == 0, jnp.full((Qc, B), neg), halo_f)
            htop0 = jnp.where(d == 0, left_b(r0), halo_top)   # H[r0-1, j-1]

            ig = r0 + iic                                     # global i

            def colstep(cc, xs):
                hcol, fcol, htopd = cc
                s_col, dH_j, dPM_j, jl = xs               # per-column ins
                jg = jg0 + jl                              # global j
                F = jnp.maximum(hcol - open_, fcol - ext)
                # Interior H[r0-1, j]; for the top chunk this is the
                # bordered boundary cell H[0][j+1].
                toph = jnp.where(t == 0, top_b(jg + 1), dH_j)
                hdiag = jnp.where(iic == 0, htopd,
                                  jnp.roll(hcol, 1, axis=0))
                htemp = jnp.maximum(hdiag + s_col, F)
                if local:
                    htemp = jnp.maximum(htemp, 0)
                a = htemp - open_ + ext * ig
                seed = jnp.where(t == 0, top_b(jg + 1) - open_ - ext, dPM_j)
                pm = _prefix_max_exclusive(a, iic, seed)
                E = pm - ext * (ig - 1)
                H = jnp.maximum(htemp, E)
                newPM = jnp.maximum(seed, a.max(axis=0))
                ys = (H[-1, :], newPM, H, toph)
                return (H, F, toph), ys

            cols = (
                jnp.moveaxis(stile, 0, 0),                 # (C, Qc, B)
                dHlast, dPM,                               # (C, B)
                jnp.arange(C, dtype=I32),
            )
            (hfin, ffin, htopfin), (nHlast, nPM, Hall, _tops) = \
                jax.lax.scan(colstep, (hcol0, fcol0, htop0), cols)

            # -- candidate tracking over the freshly filled tile --------
            # Hall: (C, Qc, B); global coords jg = jg0 + c, ig = r0 + q.
            jgv = (jg0 + jnp.arange(C, dtype=I32))[:, None, None]
            igv = ig[None, :, :]
            inseq = (igv < qlen) & (jgv < rlen)
            last_row = igv == qlen - 1
            last_col = jgv == rlen - 1
            if local:
                cand = inseq & (Hall > 0)
            elif mode == "sg":
                sel = last_row & last_col
                if qe:
                    sel = sel | last_row
                if de:
                    sel = sel | last_col
                cand = inseq & sel
            else:
                cand = inseq & last_row & last_col
            Hc = jnp.where(cand & active, Hall, neg)
            stepb = Hc.max(axis=(0, 1))                          # (B,)
            cellmax = Hc == stepb[None, None, :]
            stepi = jnp.where(cellmax, igv, I32(Qp)).min(axis=(0, 1))
            stepj = jnp.where(cellmax & (igv == stepi[None, None, :]),
                              jgv, I32(Rp)).min(axis=(0, 1))
            better = (stepb > best) | (
                (stepb == best) & (stepb > neg) & (
                    (stepi < bi) | ((stepi == bi) & (stepj < bj))))
            best = jnp.where(better, stepb, best)
            bi = jnp.where(better, stepi, bi)
            bj = jnp.where(better, stepj, bj)

            # -- state updates ------------------------------------------
            upd = lambda old, new: jnp.where(active, new, old)
            dHlast = upd(dHlast, nHlast)
            dPM = upd(dPM, nPM)
            # halo to the right neighbor (ICI ring step)
            perm = [(k, k + 1) for k in range(D - 1)]
            halo_h = jax.lax.ppermute(upd(halo_h, hfin), axis, perm)
            halo_f = jax.lax.ppermute(upd(halo_f, ffin), axis, perm)
            halo_top = jax.lax.ppermute(upd(halo_top, htopfin), axis, perm)
            return (dHlast, dPM, halo_h, halo_f, halo_top, best, bi, bj), None

        carry0 = (
            jnp.zeros((C, B), I32), jnp.zeros((C, B), I32),
            jnp.zeros((Qc, B), I32), jnp.zeros((Qc, B), I32),
            jnp.zeros((B,), I32),
            jnp.full((B,), neg), jnp.full((B,), I32(Qp)),
            jnp.full((B,), I32(Rp)),
        )
        carry, _ = jax.lax.scan(
            superstep, carry0, jnp.arange(S + D - 1, dtype=I32))
        best, bi, bj = carry[5], carry[6], carry[7]
        # Combine candidates across devices: max score, then min (i, j).
        allb = jax.lax.all_gather(jnp.stack([best, bi, bj]), axis)  # (D,3,B)
        gb = allb[:, 0, :].max(axis=0)
        is_max = allb[:, 0, :] == gb[None, :]
        gi = jnp.where(is_max, allb[:, 1, :], I32(Qp)).min(axis=0)
        gj = jnp.where(is_max & (allb[:, 1, :] == gi[None, :]),
                       allb[:, 2, :], I32(Rp)).min(axis=0)
        return gb, gi, gj

    spec_rep = P()
    fn = _shard_map(
        device_fn, mesh,
        in_specs=(spec_rep, P(axis), spec_rep, spec_rep),
        out_specs=(spec_rep, spec_rep, spec_rep),
    )
    best, bi, bj = fn(
        jnp.asarray(profile, I32), jnp.asarray(ridx, I32),
        jnp.asarray(qlen, I32), jnp.asarray(rlen, I32))

    if mode == "nw":
        return {"score": best, "end_query": qlen - 1, "end_ref": rlen - 1}
    empty = best <= 0 if local else jnp.zeros_like(best, bool)
    return {
        "score": jnp.where(empty, 0, best) if local else best,
        "end_query": jnp.where(empty, 0, bi),
        "end_ref": jnp.where(empty, 0, bj),
    }
