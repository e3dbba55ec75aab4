"""Benchmark: greedy read placement at DXZ1 scale.

The reference's hot loop #5 (read_placer.py:42-94 + cloud_contig.py:87-95):
place thousands of reads one-per-iteration into a ~1,500-unit contig. Here
the production FastPlacer (stages/placement_fast.py) runs the initial bulk
scoring as the device bitmap-popcount kernel and per-iteration updates /
argmax through per-row best caches.

Run: python benchmarks/bench_placement.py [n_reads] [genome_units] [k_per]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from centroflye_tpu.config import PlacerConfig
    from centroflye_tpu.stages.kmer_cloud import ReadClouds
    from centroflye_tpu.stages.placement_fast import ArrayContig, FastPlacer

    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    genome_units = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    T = 25                       # units per read (~50 kb / 2 kb)
    n_vocab = genome_units * K   # unique k-mers ~ one subset per position

    rng = np.random.default_rng(0)
    per_pos = (np.arange(genome_units)[:, None] * K
               + np.arange(K)[None, :]).astype(np.int64)

    def mk_read(r_id, start, t=T):
        clouds = []
        for i in range(t):
            kms = per_pos[start + i]
            keep = rng.random(K) < 0.75            # noise loss
            clouds.append(np.sort(kms[keep]))
        return ReadClouds(r_id=r_id, clouds=clouds)

    reads_clouds = {}
    names = []
    # prefix reads seed the contig at 0
    contig = ArrayContig(min_cloud_kmer_freq=2)   # the production contig
    for p in range(4):
        contig.add_read(mk_read(f"pre{p}", 0, T + 5), position=0)
    starts = rng.integers(0, genome_units - T, size=n_reads)
    for i in range(n_reads):
        r = mk_read(f"r{i:05d}", int(starts[i]))
        reads_clouds[r.r_id] = r
        names.append(r.r_id)

    cfg = PlacerConfig(min_cloud_kmer_freq=2, min_unit=2, min_inters=10,
                       min_prop=3)
    t0 = time.perf_counter()
    placer = FastPlacer(contig, names, reads_clouds, cfg)
    t_init = time.perf_counter() - t0
    t0 = time.perf_counter()
    placements, scores = placer.run()
    t_loop = time.perf_counter() - t0
    placed = sum(1 for v in placements.values() if v is not None)
    correct = sum(1 for i, name in enumerate(names)
                  if placements.get(name) == int(starts[i]))
    print(f"init (device bulk scoring): {t_init:.1f}s, "
          f"greedy loop: {t_loop:.1f}s")
    print(f"placed {placed}/{n_reads}, correct {correct}/{n_reads}")
    print(json.dumps({
        "metric": "placements_per_s",
        "value": round(placed / (t_init + t_loop), 1),
        "unit": "placements/s", "n_reads": n_reads,
        "genome_units": genome_units,
        "init_s": round(t_init, 1), "loop_s": round(t_loop, 1),
        "correct_frac": round(correct / max(placed, 1), 4)}))


if __name__ == "__main__":
    main()
