#!/usr/bin/env python
"""Ablation lab for the scan kernel's per-column cost (dev-only tool).

CAVEAT (2026-08-20, round 5): the chained timing loops in this lab link
IDENTICAL kernel calls with `(out & 0)`-style data dependencies.  XLA
CSE collapses such chains to ONE kernel, so the per-call magnitudes
printed here are really (fixed overhead + 1 kernel)/N.  A/B ORDERINGS
remain valid (both arms collapse the same way); absolute numbers do
not.  For honest per-kernel magnitudes use the roll-chain differential
(tools/bench_kernel.py, bench.py): perturb an input per step (e.g.
`jnp.roll(ridx, 1, axis=0)`) and difference two chain lengths.

Times stripped-down variants of the score sweep to locate where the
per-column slab ops go and what int16 packing would buy:

  full      — the real scan_score_align score path (width knob),
              including the XLA-side one-hot matmul + transpose
  base      — stripped kernel, all features (kernel-only baseline)
  noprefix  — E replaced by htemp (measures the Hillis-Steele cost)
  nocand    — no candidate/saturation tracking (measures tracker cost)
  nosub     — no scol load/convert (measures the i8 fetch+sign-extend)
  u2        — two-column unroll of the fori loop
  scratch   — DP state in VMEM scratch refs (pre-09395d9 structure)
              instead of the fori-loop carry
  packed    — single packed [H | P-1-j] candidate plane (the
              cand_pack_params structure) instead of best+bj
  i16       — same recurrence in int16 (2x VPU packing; FAILS to
              legalize on the current Mosaic toolchain — arith.maxsi
              has no packed-i16 lowering)
  i16roll   — int16 + pltpu.roll instead of jnp.roll (unsupported)

Chained-dependency timing under a watchdog, same pattern as
tools/bench_kernel.py.  Results are JSON lines on stdout.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import with_timeout  # noqa: E402

LANES = 128




def make_lab_kernel(Qc, Rp, dtype, variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NEG = -(2 ** 14) if dtype == jnp.int16 else -(2 ** 30)
    use_ptroll = variant == "i16roll"

    def roll(x, s):
        if use_ptroll:
            return pltpu.roll(x, s, 0)
        return jnp.roll(x, s, axis=0)

    def kernel(scol_ref, out_ref, acc, hscr, fscr, bscr, jscr):
        ii = jax.lax.broadcasted_iota(jnp.int32, (Qc, LANES), 0)
        masks = {0: ii == 0}
        s_ = 1
        while s_ < Qc:
            masks[s_] = ii >= s_
            s_ *= 2
        open_ = jnp.asarray(11, dtype)
        ext = jnp.asarray(1, dtype)
        a_base = (ext * ii - open_).astype(dtype)
        e_base = (ext * (ii - 1)).astype(dtype)

        # Splat-constant carry inits give the fori-loop carry a replicated
        # Mosaic layout that the body's computed {0,0} values can't legally
        # relayout back to; VMEM scratch round-trips anchor {0,0} layouts
        # (the same structure the real kernel uses).
        hscr[:] = jnp.zeros((Qc, LANES), dtype)
        fscr[:] = jnp.full((Qc, LANES), NEG, dtype)
        bscr[:] = jnp.full((Qc, LANES), NEG, dtype)
        jscr[:] = jnp.zeros((Qc, LANES), jnp.int32)
        st0 = {
            "hp": hscr[:],
            "fp": fscr[:],
            "best": bscr[:],
            "bj": jscr[:],
        }
        if variant == "packed":
            st0 = {"hp": hscr[:], "fp": fscr[:], "best": bscr[:]}

        def col(jj, st):
            if variant == "nosub":
                # no scol load/convert: measures the i8 fetch+sign-extend
                # share of the per-column cost (results are wrong, timing
                # structure is identical otherwise)
                s = st["hp"] - st["fp"]
            else:
                s = scol_ref[0, jj, :, :].astype(dtype)
            hp, fp = st["hp"], st["fp"]
            F = jnp.maximum(hp - open_, fp - ext)
            hdiag = jnp.where(masks[0], jnp.asarray(0, dtype),
                              roll(hp, 1))
            htemp = jnp.maximum(hdiag + s, F)
            htemp = jnp.maximum(htemp, 0)
            if variant == "noprefix":
                E = htemp - open_
            else:
                a = htemp + a_base
                x = jnp.where(masks[0], NEG, roll(a, 1))
                s_ = 1
                while s_ < Qc:
                    x = jnp.maximum(
                        x, jnp.where(masks[s_], roll(x, s_), NEG))
                    s_ *= 2
                E = x - e_base
            H = jnp.maximum(htemp, E)
            out = {"hp": H, "fp": F}
            if variant == "packed":
                out["best"] = jnp.maximum(
                    st["best"], jnp.where(H > 0, (H << 8) | (255 - jj), NEG))
            elif variant == "nocand":
                out["best"] = jnp.maximum(st["best"], H)
                out["bj"] = st["bj"]
            else:
                upd = H > st["best"]
                out["best"] = jnp.where(upd, H, st["best"])
                out["bj"] = jnp.where(upd, jj, st["bj"])
            return out

        if variant == "u2":
            def col2(kk, st):
                return col(2 * kk + 1, col(2 * kk, st))
            stf = jax.lax.fori_loop(0, Rp // 2, col2, st0)
        elif variant == "scratch":
            def col_s(jj, tok):
                st = {"hp": hscr[:], "fp": fscr[:], "best": bscr[:],
                      "bj": jscr[:]}
                nst = col(jj, st)
                hscr[:] = nst["hp"]
                fscr[:] = nst["fp"]
                bscr[:] = nst["best"]
                jscr[:] = nst["bj"]
                return tok
            jax.lax.fori_loop(0, Rp, col_s, 0)
            stf = {"best": bscr[:], "bj": jscr[:]}
        else:
            stf = jax.lax.fori_loop(0, Rp, col, st0)
        acc[:] = jnp.zeros((8, LANES), jnp.int32)
        if variant == "packed":
            acc[0:1, :] = (stf["best"] >> 8).astype(jnp.int32).max(
                axis=0, keepdims=True)
        else:
            acc[0:1, :] = stf["best"].astype(jnp.int32).max(
                axis=0, keepdims=True)
            acc[1:2, :] = stf["bj"].max(axis=0, keepdims=True)
        out_ref[0] = acc[:]

    return kernel


def make_dual_kernel(Qc, Rp, dtype):
    """Stripped score sweep over TWO independent lane blocks per grid
    step, their per-column chains interleaved in one fori body.

    Hypothesis: the sweep is dependency-stall-bound (~13x per-op
    overhead measured), so a second independent chain should fill the
    VLIW pipeline gaps — dual ≪ 2x the single-block cost would justify
    restructuring the production kernel's grid."""
    import jax
    import jax.numpy as jnp

    NEG = -(2 ** 30)

    def kernel(scol_ref, out_ref, acc, h0, f0, b0, h1, f1, b1):
        ii = jax.lax.broadcasted_iota(jnp.int32, (Qc, LANES), 0)
        masks = {0: ii == 0}
        s_ = 1
        while s_ < Qc:
            masks[s_] = ii >= s_
            s_ *= 2
        open_ = jnp.asarray(11, dtype)
        ext = jnp.asarray(1, dtype)
        a_base = (ext * ii - open_).astype(dtype)
        e_base = (ext * (ii - 1)).astype(dtype)

        for scr, fill in ((h0, 0), (f0, NEG), (b0, NEG),
                          (h1, 0), (f1, NEG), (b1, NEG)):
            scr[:] = jnp.full((Qc, LANES), fill, dtype)
        st0 = {"hp0": h0[:], "fp0": f0[:], "best0": b0[:],
               "hp1": h1[:], "fp1": f1[:], "best1": b1[:]}

        def one(s, hp, fp, best, jj):
            F = jnp.maximum(hp - open_, fp - ext)
            hdiag = jnp.where(masks[0], jnp.asarray(0, dtype),
                              jnp.roll(hp, 1, axis=0))
            htemp = jnp.maximum(hdiag + s, F)
            htemp = jnp.maximum(htemp, 0)
            a = htemp + a_base
            x = jnp.where(masks[0], NEG, jnp.roll(a, 1, axis=0))
            s_ = 1
            while s_ < Qc:
                x = jnp.maximum(
                    x, jnp.where(masks[s_], jnp.roll(x, s_, axis=0), NEG))
                s_ *= 2
            E = x - e_base
            H = jnp.maximum(htemp, E)
            nb_ = jnp.maximum(
                best, jnp.where(H > 0, (H << 8) | (255 - jj), NEG))
            return H, F, nb_

        def col(jj, st):
            sa = scol_ref[0, jj, :, :].astype(dtype)
            sb = scol_ref[1, jj, :, :].astype(dtype)
            H0, F0, B0 = one(sa, st["hp0"], st["fp0"], st["best0"], jj)
            H1, F1, B1 = one(sb, st["hp1"], st["fp1"], st["best1"], jj)
            return {"hp0": H0, "fp0": F0, "best0": B0,
                    "hp1": H1, "fp1": F1, "best1": B1}

        stf = jax.lax.fori_loop(0, Rp, col, st0)
        acc[:] = jnp.zeros((8, LANES), jnp.int32)
        acc[0:1, :] = (stf["best0"] >> 8).astype(jnp.int32).max(
            axis=0, keepdims=True)
        acc[1:2, :] = (stf["best1"] >> 8).astype(jnp.int32).max(
            axis=0, keepdims=True)
        out_ref[0] = acc[:]
        out_ref[1] = acc[:]

    return kernel


def run_dual(B=8192, Qc=160, Rp=160):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = B // LANES
    rng = np.random.default_rng(0)
    scol = jax.device_put(
        rng.integers(-4, 12, size=(nb, Rp, Qc, LANES)).astype(np.int8))
    jax.block_until_ready(scol)
    kernel = make_dual_kernel(Qc, Rp, jnp.int32)
    f = pl.pallas_call(
        kernel,
        grid=(nb // 2,),
        in_specs=[pl.BlockSpec((2, Rp, Qc, LANES), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, 8, LANES), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 8, LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, LANES), jnp.int32)]
        + [pltpu.VMEM((Qc, LANES), jnp.int32) for _ in range(6)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )
    f = jax.jit(f)
    t0 = time.time()
    with_timeout(lambda: jax.block_until_ready(f(scol)), 180)
    compile_s = time.time() - t0
    best = None
    for iters in (1, 4, 16, 32):
        def window(iters=iters):
            x = scol
            t0 = time.time()
            out = None
            for _ in range(iters):
                out = f(x)
                x = scol + (out[:1, :1, :1] & 0).astype(np.int8)
            float(np.asarray(out).sum())
            return (time.time() - t0) / iters
        try:
            dt = with_timeout(window, 90)
        except Exception as e:  # noqa: BLE001
            print(f"[dual] window x{iters} failed: {e}", flush=True)
            continue
        best = dt if best is None else min(best, dt)
    rec = {"variant": "dual", "B": B, "Qc": Qc, "Rp": Rp,
           "compile_s": round(compile_s, 2),
           "best_ms": None if best is None else round(best * 1e3, 3)}
    print(json.dumps(rec), flush=True)


def make_flip_kernel(Qc, Rp, dtype):
    """Score recurrence with FLIPPED slab orientation: pairs on sublanes,
    query positions on lanes — consumes scol in the dot's natural
    (nb, LANES, Rp, Qc) layout, no lanes-last transpose needed."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NEG = -(2 ** 30)

    def kernel(scol_ref, out_ref, acc, hscr, fscr, bscr):
        qq = jax.lax.broadcasted_iota(jnp.int32, (LANES, Qc), 1)
        masks = {0: qq == 0}
        s_ = 1
        while s_ < Qc:
            masks[s_] = qq >= s_
            s_ *= 2
        open_ = jnp.asarray(11, dtype)
        ext = jnp.asarray(1, dtype)
        a_base = (ext * qq - open_).astype(dtype)
        e_base = (ext * (qq - 1)).astype(dtype)

        hscr[:] = jnp.zeros((LANES, Qc), dtype)
        fscr[:] = jnp.full((LANES, Qc), NEG, dtype)
        bscr[:] = jnp.full((LANES, Qc), NEG, dtype)
        st0 = {"hp": hscr[:], "fp": fscr[:], "best": bscr[:]}

        def col(jj, st):
            s = scol_ref[0, :, jj, :].astype(dtype)        # (LANES, Qc)
            hp, fp = st["hp"], st["fp"]
            F = jnp.maximum(hp - open_, fp - ext)
            hdiag = jnp.where(masks[0], jnp.asarray(0, dtype),
                              jnp.roll(hp, 1, axis=1))
            htemp = jnp.maximum(hdiag + s, F)
            htemp = jnp.maximum(htemp, 0)
            a = htemp + a_base
            x = jnp.where(masks[0], NEG, jnp.roll(a, 1, axis=1))
            s_ = 1
            while s_ < Qc:
                x = jnp.maximum(
                    x, jnp.where(masks[s_], jnp.roll(x, s_, axis=1), NEG))
                s_ *= 2
            E = x - e_base
            H = jnp.maximum(htemp, E)
            best = jnp.maximum(
                st["best"], jnp.where(H > 0, (H << 8) | (255 - jj), NEG))
            return {"hp": H, "fp": F, "best": best}

        stf = jax.lax.fori_loop(0, Rp, col, st0)
        acc[:] = jnp.zeros((8, LANES), jnp.int32)
        acc[0:1, :] = (stf["best"] >> 8).astype(jnp.int32).max(
            axis=1, keepdims=True).reshape(1, LANES)
        out_ref[0] = acc[:]

    return kernel


def run_flip(B=8192, Qc=160, Rp=160):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = B // LANES
    rng = np.random.default_rng(0)
    scol = jax.device_put(
        rng.integers(-4, 12, size=(nb, LANES, Rp, Qc)).astype(np.int8))
    jax.block_until_ready(scol)
    kernel = make_flip_kernel(Qc, Rp, jnp.int32)
    f = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, LANES, Rp, Qc), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, LANES), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 8, LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, LANES), jnp.int32),
                        pltpu.VMEM((LANES, Qc), jnp.int32),
                        pltpu.VMEM((LANES, Qc), jnp.int32),
                        pltpu.VMEM((LANES, Qc), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )
    f = jax.jit(f)
    t0 = time.time()
    with_timeout(lambda: jax.block_until_ready(f(scol)), 180)
    compile_s = time.time() - t0
    best = None
    for iters in (1, 4, 16, 32):
        def window(iters=iters):
            x = scol
            t0 = time.time()
            out = None
            for _ in range(iters):
                out = f(x)
                x = scol + (out[:1, :1, :1] & 0).astype(np.int8)
            float(np.asarray(out).sum())
            return (time.time() - t0) / iters
        try:
            dt = with_timeout(window, 90)
        except Exception as e:  # noqa: BLE001
            print(f"[flip] window x{iters} failed: {e}", flush=True)
            continue
        best = dt if best is None else min(best, dt)
    rec = {"variant": "flip", "B": B, "Qc": Qc, "Rp": Rp,
           "compile_s": round(compile_s, 2),
           "best_ms": None if best is None else round(best * 1e3, 3)}
    print(json.dumps(rec), flush=True)


def make_pallas_transpose(nb, Rp, Qp, Jt, in_dtype):
    """(nb, LANES, Rp, Qp) in_dtype -> (nb, Rp, Qp, LANES) int8 block
    transpose-and-cast kernel (candidate replacement for the XLA
    lanes-last relayout in scan prep)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        for j in range(Jt):                            # static unroll
            x = x_ref[0, :, j, :]                      # (LANES, Qp)
            o_ref[0, j] = jnp.swapaxes(x, 0, 1).astype(jnp.int8)

    nj = Rp // Jt
    f = pl.pallas_call(
        kernel,
        grid=(nb, nj),
        in_specs=[pl.BlockSpec((1, LANES, Jt, Qp), lambda b, j: (b, 0, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Jt, Qp, LANES), lambda b, j: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, Rp, Qp, LANES), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )
    return f


def run_prep(variant, B=8192, Qp=160, Rp=160, A=25):
    """Time the XLA-side scol prep (one-hot matmul + lanes-last
    relayout) in isolation, plus cheaper candidate formulations."""
    import jax
    import jax.numpy as jnp

    nb = B // LANES
    rng = np.random.default_rng(0)
    profile = jax.device_put(
        rng.integers(-4, 12, size=(B, Qp, A)).astype(np.int32))
    ridx = jax.device_put(rng.integers(0, A, size=(B, Rp)).astype(np.int32))
    jax.block_until_ready([profile, ridx])

    def dot_f32(profile, ridx):
        onehot = jax.nn.one_hot(ridx, A, dtype=jnp.float32)
        return jax.lax.dot_general(
            onehot, profile.astype(jnp.float32),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (B, Rp, Qp)

    def dot_bf16(profile, ridx):
        # exact: one-hot rows have a single nonzero, scores are small ints
        onehot = jax.nn.one_hot(ridx, A, dtype=jnp.bfloat16)
        return jax.lax.dot_general(
            onehot, profile.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    if variant == "prep_i8dot":
        def fn(profile, ridx):
            onehot = jax.nn.one_hot(ridx, A, dtype=jnp.int8)
            s = jax.lax.dot_general(
                onehot, profile.astype(jnp.int8),
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32).astype(jnp.int8)
            return s.reshape(nb, LANES, Rp, Qp).transpose(0, 2, 3, 1)
    elif variant == "prep_gather":
        def fn(profile, ridx):
            s = jnp.take_along_axis(
                profile.astype(jnp.int8), ridx[:, None, :], axis=2)
            # (B, Qp, Rp) -> lanes-last (nb, Rp, Qp, LANES)
            return s.reshape(nb, LANES, Qp, Rp).transpose(0, 3, 2, 1)
    elif variant == "prep_tpack":
        # G-select prep: pack profile rows 4-per-int32, lanes-last
        npk = (A + 3) // 4

        def fn(profile, ridx):
            p8 = profile.astype(jnp.int8).astype(jnp.uint8).astype(jnp.int32)
            pad = npk * 4 - A
            p8 = jnp.pad(p8, ((0, 0), (0, 0), (0, pad)))
            p4 = p8.reshape(B, Qp, npk, 4)
            packed = (p4[..., 0] | (p4[..., 1] << 8)
                      | (p4[..., 2] << 16) | (p4[..., 3] << 24))
            return packed.reshape(nb, LANES, Qp, npk).transpose(0, 3, 2, 1)
    elif variant == "prep_full":
        def fn(profile, ridx):
            s = dot_f32(profile, ridx).astype(jnp.int8)
            return s.reshape(nb, LANES, Rp, Qp).transpose(0, 2, 3, 1)
    elif variant == "prep_dot":
        def fn(profile, ridx):
            return dot_f32(profile, ridx).astype(jnp.int8)
    elif variant == "prep_bf16":
        def fn(profile, ridx):
            s = dot_bf16(profile, ridx).astype(jnp.int8)
            return s.reshape(nb, LANES, Rp, Qp).transpose(0, 2, 3, 1)
    elif variant == "prep_castlast":
        def fn(profile, ridx):
            s = dot_f32(profile, ridx)
            return s.reshape(nb, LANES, Rp, Qp).transpose(
                0, 2, 3, 1).astype(jnp.int8)
    elif variant in ("prep_pallasT", "prep_bf16_pallasT", "prep_pallasT8"):
        Jt = 8
        dt = jnp.int8 if variant == "prep_pallasT8" else jnp.float32
        tk = make_pallas_transpose(nb, Rp, Qp, Jt, dt)
        dot = dot_bf16 if variant == "prep_bf16_pallasT" else dot_f32

        def fn(profile, ridx):
            s = dot(profile, ridx)
            if variant == "prep_pallasT8":
                s = s.astype(jnp.int8)
            elif s.dtype != jnp.float32:
                s = s.astype(jnp.float32)
            return tk(s.reshape(nb, LANES, Rp, Qp))
    else:
        raise SystemExit(f"unknown prep variant {variant}")

    fn = jax.jit(fn)
    t0 = time.time()
    out0 = with_timeout(lambda: jax.block_until_ready(fn(profile, ridx)), 180)
    compile_s = time.time() - t0
    if variant not in ("prep_dot", "prep_tpack"):
        # verify one lane block: ref[l, r, q] = profile[l, q, ridx[l, r]]
        p0 = np.asarray(profile)[:LANES]
        r0 = np.asarray(ridx)[:LANES]
        ref = np.take_along_axis(
            p0, r0[:, None, :], axis=2).astype(np.int8)    # (LANES, Qp, Rp)
        ref = ref.transpose(2, 1, 0)                       # (Rp, Qp, LANES)
        ok = bool(np.array_equal(np.asarray(out0[0]), ref))
    else:
        ok = True
    best = None
    for iters in (1, 4, 16, 32):
        def window(iters=iters):
            r = ridx
            t0 = time.time()
            out = None
            for _ in range(iters):
                out = fn(profile, r)
                r = ridx + (out[:1, :1, :1].astype(jnp.int32)
                            .reshape(-1)[0] & 0)
            jax.block_until_ready(out)
            return (time.time() - t0) / iters
        try:
            dt = with_timeout(window, 90)
        except Exception as e:  # noqa: BLE001
            print(f"[{variant}] window x{iters} failed: {e}", flush=True)
            continue
        best = dt if best is None else min(best, dt)

    # Fused chain: N preps inside one jit — one dispatch, zero per-call
    # host overhead in the timed region (ground truth).
    NCH = 16

    @jax.jit
    def chained(r):
        out = None
        for _ in range(NCH):
            out = fn._fun(profile, r) if hasattr(fn, "_fun") else fn(profile, r)
            r = r + (out[:1, :1, :1].astype(jnp.int32).reshape(-1)[0] & 0)
        return out

    fused_ms = None
    try:
        with_timeout(lambda: jax.block_until_ready(chained(ridx)), 240)
        for _ in range(3):
            def fwin():
                t0 = time.time()
                jax.block_until_ready(chained(ridx))
                return (time.time() - t0) / NCH
            try:
                dt = with_timeout(fwin, 90)
            except Exception as e:  # noqa: BLE001
                print(f"[{variant}] fused window failed: {e}", flush=True)
                continue
            fused_ms = dt if fused_ms is None else min(fused_ms, dt)
    except Exception as e:  # noqa: BLE001
        print(f"[{variant}] fused chain unavailable: {e}", flush=True)
    if fused_ms is not None and (best is None or fused_ms < best):
        best = fused_ms
    rec = {"variant": variant, "B": B, "Qp": Qp, "Rp": Rp,
           "compile_s": round(compile_s, 2), "exact": ok,
           "fused_ms": None if fused_ms is None else round(fused_ms * 1e3, 3),
           "best_ms": None if best is None else round(best * 1e3, 3)}
    print(json.dumps(rec), flush=True)


def run_variant(variant, B=8192, Qc=160, Rp=160):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if variant == "full":
        from parasail_rs_tpu.ops.scan_kernel import scan_score_align
        rng = np.random.default_rng(0)
        profile = jax.device_put(
            rng.integers(-4, 12, size=(B, Qc, 25)).astype(np.int32))
        ridx = jax.device_put(
            rng.integers(0, 25, size=(B, Rp)).astype(np.int32))
        qlen = jax.device_put(np.full(B, 150, np.int32))
        rlen = jax.device_put(np.full(B, 150, np.int32))
        jax.block_until_ready([profile, ridx])

        def run(ql):
            return scan_score_align(
                profile, ridx, ql, rlen, None,
                open_=np.int32(11), ext=np.int32(1),
                mode="sw", free=(True,) * 4, width="32",
                outputs="score")["score"]
        seedarr = qlen
    else:
        dtype = jnp.int16 if variant.startswith("i16") else jnp.int32
        nb = B // LANES
        rng = np.random.default_rng(0)
        scol = jax.device_put(
            rng.integers(-4, 12, size=(nb, Rp, Qc, LANES)).astype(np.int8))
        jax.block_until_ready(scol)
        kernel = make_lab_kernel(Qc, Rp, dtype, variant)
        f = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[pl.BlockSpec((1, Rp, Qc, LANES), lambda b: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, LANES), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, 8, LANES), jnp.int32),
            scratch_shapes=[pltpu.VMEM((8, LANES), jnp.int32),
                            pltpu.VMEM((Qc, LANES), dtype),
                            pltpu.VMEM((Qc, LANES), dtype),
                            pltpu.VMEM((Qc, LANES), dtype),
                            pltpu.VMEM((Qc, LANES), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )
        f = jax.jit(f)

        def run(x):
            return f(x)
        seedarr = scol

    t0 = time.time()
    with_timeout(lambda: jax.block_until_ready(run(seedarr)), 180)
    compile_s = time.time() - t0
    best = None
    for iters in (1, 4, 16, 32):
        def window(iters=iters):
            x = seedarr
            t0 = time.time()
            out = None
            for _ in range(iters):
                out = run(x)
                if variant == "full":
                    x = seedarr + (out & 0)
                else:
                    x = seedarr + (out[:1, :1, :1] & 0).astype(np.int8)
            float(np.asarray(out).sum())
            return (time.time() - t0) / iters
        try:
            dt = with_timeout(window, 90)
        except Exception as e:  # noqa: BLE001
            print(f"[{variant}] window x{iters} failed: {e}", flush=True)
            continue  # tunnel hiccup on one window; later windows often fine
        best = dt if best is None else min(best, dt)
    rec = {"variant": variant, "B": B, "Qc": Qc, "Rp": Rp,
           "compile_s": round(compile_s, 2),
           "best_ms": None if best is None else round(best * 1e3, 3)}
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    variants = sys.argv[1:] or ["full", "noprefix", "nocand", "i16",
                                "i16roll"]
    try:
        for v in variants:
            try:
                if v.startswith("prep"):
                    run_prep(v)
                elif v == "flip":
                    run_flip()
                elif v == "dual":
                    run_dual()
                else:
                    run_variant(v)
            except Exception:  # noqa: BLE001
                import traceback

                traceback.print_exc()
                sys.stdout.flush()
                sys.stderr.flush()
    finally:
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)
