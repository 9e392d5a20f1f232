"""Basic usage: one-off alignments, traceback, and batches.

Run: python examples/basic.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parasail_rs_tpu.prelude import Aligner, Matrix, Profile

# One-off local alignment with traceback
aligner = (Aligner.new().local().use_trace()
           .gap_open(5).gap_extend(2).build())
q, r = b"TTTACGTTT", b"GGGACGGGG"
res = aligner.align(q, r)
print("score:", res.get_score(), " cigar:", res.get_cigar(q, r))
res.print_traceback(q, r)

# Profile reuse: one query against many references, one kernel launch
matrix = Matrix.from_name("blosum62")
profile = Profile.new(b"HEAGAWGHEE", True, matrix)
pa = (Aligner.new().profile(profile).use_stats()
      .gap_open(11).gap_extend(1).local().build())
for ref, res in zip([b"PAWHEAE", b"AWGHEE"],
                    pa.align_batch(None, [b"PAWHEAE", b"AWGHEE"])):
    print(ref, "->", res.get_score(), "matches:", res.get_matches())

# CIGAR serving path: device traceback walk — the flag plane never
# leaves the device; one fused scalar+opcode fetch per batch
sw = (Aligner.new().matrix(matrix).gap_open(11).gap_extend(1)
      .local().build())
alns, cigars = sw.align_cigars([b"HEAGAWGHEE", b"PAWHEAE"],
                               [b"PAWHEAE", b"HEAGAWGHEE"])
for a, c in zip(alns, cigars):
    print("score:", a.get_score(), " cigar:", c)
