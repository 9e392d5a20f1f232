"""Production serving: streaming executor over a pair stream.

Run: python examples/serving.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from parasail_rs_tpu.engine import Aligner, StreamingAligner
from parasail_rs_tpu.matrices import Matrix

rng = np.random.default_rng(0)
aligner = (Aligner.new().matrix(Matrix.from_name("blosum62"))
           .gap_open(11).gap_extend(1).local().build())
stream = StreamingAligner(aligner, flush_size=1024)

alpha = list(b"ARNDCQEGHILKMFPSTWYV")
handles = []
for _ in range(5000):
    q = rng.choice(alpha, size=rng.integers(50, 250)).astype("uint8").tobytes()
    r = rng.choice(alpha, size=rng.integers(50, 250)).astype("uint8").tobytes()
    handles.append(stream.submit(q, r))   # dispatches as buckets fill
stream.flush()
scores = [h.result().get_score() for h in handles]
print(f"aligned {len(scores)} pairs; mean score {np.mean(scores):.1f}")

# Batched CIGAR extraction: one native walk over a whole trace batch
# (~20x less host time than per-pair get_cigar).
tr = (Aligner.new().matrix(Matrix.from_name("blosum62"))
      .gap_open(11).gap_extend(1).semi_global().use_trace().build())
qs = [rng.choice(alpha, size=60).astype("uint8").tobytes()
      for _ in range(256)]
rs = [rng.choice(alpha, size=60).astype("uint8").tobytes()
      for _ in range(256)]
results = tr.align_batch(qs, rs)
cigars = tr.cigars(results, qs, rs)
print(f"first CIGAR: {cigars[0][:40]}")
