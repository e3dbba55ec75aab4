"""Benchmark: per-position consensus polishing throughput.

The reference launches one `flye --polish-target` subprocess per unit
position x iteration (eltr_polisher.py:99-114, ~1,400 positions for cenX).
Here each position is a deterministic voting round whose read-vs-template
alignments run as ONE threaded native batch (cf_align_path_batch).

Run: python benchmarks/bench_polisher.py [positions] [coverage]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from centroflye_tpu.io import read_seq
    from centroflye_tpu.pipeline.simulate import add_read_noise
    from centroflye_tpu.stages.consensus import polish_round

    positions = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    coverage = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    data = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "centroflye_tpu", "data")
    unit = read_seq(os.path.join(data, "DXZ1_rc.fasta"))

    rng = np.random.default_rng(0)
    jobs = []
    for p in range(positions):
        truth = add_read_noise(rng, unit, 0.005)     # position's true unit
        template = add_read_noise(rng, truth, 0.02)  # imperfect template
        reads = [add_read_noise(rng, truth, 0.05) for _ in range(coverage)]
        jobs.append((template, reads, truth))

    t0 = time.perf_counter()
    n_exact = 0
    for template, reads, truth in jobs:
        out = polish_round(template, reads)
        n_exact += out == truth
    dt = time.perf_counter() - t0
    print(f"{positions} positions x {coverage} reads "
          f"({len(unit)} bp unit): {dt:.1f}s, {n_exact} exact")
    print(json.dumps({
        "metric": "polish_positions_per_s",
        "value": round(positions / dt, 2), "unit": "positions/s",
        "coverage": coverage, "unit_len": len(unit),
        "exact_frac": round(n_exact / positions, 3)}))


if __name__ == "__main__":
    main()
