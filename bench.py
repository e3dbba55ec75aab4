"""Benchmark: read-recruitment throughput on one chip (the reference's
headline stage: rr/edlib HW k=350 over rel2, ~1h on 50 CPU threads for
11.1M reads ~= 3083 reads/s, BASELINE.md).

Measures the batched two-strand Myers recruitment kernel on the real DXZ1
unit (2055 bp) over simulated reads, steady-state. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": N}.

vs_baseline compares against the reference's effective 3083 reads/s
(50-thread server) at the rel2 mean read length; we normalize by bases:
throughput_reads/s = bases_per_s / mean_read_len with the same mean length
assumption for both sides (the kernel's work is proportional to bases).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# rel2 envelope (BASELINE.md): ~11.1M reads in ~1h on 50 threads.
BASELINE_READS_PER_S = 11_100_000 / 3600.0
# genome-skimming ONT runs average ~10kb/read; both sides use this length.
MEAN_READ_LEN = 10_000


def main():
    import jax
    from centroflye_tpu.io import read_seq
    from centroflye_tpu.io.encoding import encode, revcomp
    from centroflye_tpu.ops.myers import build_peq, myers_distance_batch

    data = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "centroflye_tpu", "data")
    unit = read_seq(os.path.join(data, "DXZ1_rc.fasta"))
    m = len(unit)
    unit_codes = encode(unit)
    peq_f = build_peq(unit_codes)
    peq_r = build_peq(revcomp(unit_codes))

    B, L = 128, MEAN_READ_LEN
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(B, L)).astype(np.int8)
    lens = np.full((B,), L, dtype=np.int32)

    def step(codes, lens):
        f = myers_distance_batch(peq_f, codes, lens, m=m, mode="HW")
        r = myers_distance_batch(peq_r, codes, lens, m=m, mode="HW")
        return f["dist"], r["dist"]

    # warmup / compile
    out = step(codes, lens)
    jax.block_until_ready(out)

    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = step(codes, lens)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    bases = n_iter * B * L            # each read scanned once per strand
    bases_per_s = bases / dt
    reads_per_s = bases_per_s / MEAN_READ_LEN
    print(json.dumps({
        "metric": "recruitment_reads_per_s_1chip",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
