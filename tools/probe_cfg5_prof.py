"""cProfile align_many (cfg5) on the TPU: find the host time that the
stage accounting misses (probe_cfg45 saw wall 158ms vs stage-sum 78ms).
"""
import cProfile
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/pt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from parasail_rs_tpu.engine import Aligner

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(1)
    dna = list(b"ACGT")
    mixed_q = [rng.choice(dna, size=rng.integers(100, 2000))
               .astype("uint8").tobytes() for _ in range(256)]
    mixed_r = [rng.choice(dna, size=rng.integers(100, 2000))
               .astype("uint8").tobytes() for _ in range(256)]
    mx = Aligner.new().gap_open(5).gap_extend(2).local().build()
    mx.align_many(mixed_q, mixed_r)  # warm
    mx.align_many(mixed_q, mixed_r)

    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    mx.align_many(mixed_q, mixed_r)
    pr.disable()
    wall = (time.perf_counter() - t0) * 1e3
    print(f"wall={wall:.1f}ms", flush=True)
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(28)


if __name__ == "__main__":
    main()
