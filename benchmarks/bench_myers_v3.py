"""Standalone throughput of the production Pallas Myers kernel
(ops/myers_pallas_v3) at the DXZ1 recruitment shape: m = 2055 query
(the HOR unit), L = 2048-column read segments, TILE_B-lane batches.

Reports Mcol/s = millions of DP columns (read positions) scored per
second; the two-strand kernel scores BOTH strands per column, so its
effective cell rate is 2 * m * Mcol/s. Role: the inner loop of the
reference recruiter (rr.cpp:74-79 -> edlib.cpp:526), whose envelope is
~11.1M reads (~155 Gbp) in 1 h on 50 threads.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from centroflye_tpu.io import encode, encode_batch
from centroflye_tpu.io.encoding import revcomp
from centroflye_tpu.ops.myers import build_peq
from centroflye_tpu.ops.myers_pallas_v3 import (
    TILE_B, myers_hw_pallas_v3, myers_hw_pallas_v3_2strand)


def main():
    rng = np.random.default_rng(0)
    m, L, B = 2055, 2048, 4 * TILE_B
    unit = "".join("ACGT"[i] for i in rng.integers(0, 4, m))
    texts = ["".join("ACGT"[i] for i in rng.integers(0, 4, L))
             for _ in range(B)]
    codes, lens = encode_batch(texts, max_len=L)
    ct = jnp.asarray(codes).T
    l2 = jnp.asarray(lens).reshape(-1, 1)
    pf = jnp.asarray(build_peq(encode(unit)))
    pr = jnp.asarray(build_peq(revcomp(encode(unit))))

    results = {}
    for name, fn in [
        ("v3_1strand", lambda: myers_hw_pallas_v3(pf, ct, l2, m=m)),
        ("v3_2strand", lambda: myers_hw_pallas_v3_2strand(
            pf, pr, ct, l2, m=m)),
    ]:
        out = fn()
        # force a real host readback: block_until_ready alone under-waits
        # on the experimental tunneled backend
        for v in out.values():
            np.asarray(v)
        reps, t = 5, []
        for _ in range(reps):
            t0 = time.perf_counter()
            for v in fn().values():
                np.asarray(v)
            t.append(time.perf_counter() - t0)
        best = min(t)
        med = sorted(t)[len(t) // 2]
        cols = B * L
        results[name] = {
            "mcol_per_s_best": cols / best / 1e6,
            "mcol_per_s_median": cols / med / 1e6,
            "mcell_per_s_best": cols * m / best / 1e6
            * (2 if "2strand" in name else 1),
        }
        print(f"{name}: {cols / best / 1e6:.1f} Mcol/s best, "
              f"{cols / med / 1e6:.1f} median "
              f"({best * 1e3:.1f} ms / {B}x{L} batch)")

    print(json.dumps({
        "metric": "myers_v3_2strand_mcol_per_s",
        "value": round(results["v3_2strand"]["mcol_per_s_best"], 1),
        "unit": "Mcol/s", "shape": {"m": m, "L": L, "B": B},
        "detail": results}))


if __name__ == "__main__":
    main()
