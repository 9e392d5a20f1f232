#!/usr/bin/env python
"""Ablation lab for the scan kernel's per-column cost (dev-only tool).

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
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES = 128


def with_timeout(fn, t):
    box = {}

    def work():
        try:
            box["out"] = fn()
        except Exception as e:  # noqa: BLE001
            box["err"] = e

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(t)
    if th.is_alive():
        raise TimeoutError(f"no result in {t}s")
    if "err" in box:
        raise box["err"]
    return box.get("out")


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
