"""Benchmark: the unique-k-mer distance-graph stage at cenX-like scale.

The reference's dominant cost: ~9h wall / ~800GB RAM on a 50-thread server
for the (kmer x kmer x dist<=150) co-occurrence tabulation over rel2
(README.md:121-124). Here the same exact counting is sort/segment-reduce on
device. This script builds a synthetic cloud tensor at cenX-like shape
(reads x units-per-read x rare-kmers-per-cloud over a rare-kmer vocabulary)
and measures the full d=1..150 table build.

Run: python benchmarks/bench_distance_stage.py [n_reads] [t_units] [k_per]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from centroflye_tpu.config import KmerRecruitmentConfig
    from centroflye_tpu.stages.distance_graph import (
        build_distance_table, filter_dist_tuples)

    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    n_vocab = 200_000

    rng = np.random.default_rng(0)
    # clouds mimic genuine structure: each unit position of the genome has
    # its own recurring rare-kmer subset; reads sample consecutive windows
    genome_units = 1500
    per_pos = rng.integers(0, n_vocab, size=(genome_units, K)).astype(
        np.int32)
    clouds = np.empty((n_reads, T, K), np.int32)
    starts = rng.integers(0, genome_units - T, size=n_reads)
    for r in range(n_reads):
        clouds[r] = per_pos[starts[r]:starts[r] + T]
    # drop ~30% entries to emulate noise loss
    mask = rng.random(clouds.shape) < 0.3
    clouds[mask] = -1
    n_units = np.full(n_reads, T, np.int32)

    cfg = KmerRecruitmentConfig(min_distance=1, max_distance=min(150, T - 1),
                                min_coverage=4)
    pairs = 0
    for d in range(cfg.min_distance, cfg.max_distance + 1):
        pairs += n_reads * max(0, T - d) * (K * 0.7) ** 2

    t0 = time.perf_counter()
    # capacity auto-sized from the pair-observation bound: one compile
    # per shape, no recompile-on-doubling
    uhi, ulo, cnt, n = build_distance_table(clouds, n_units, cfg)
    # force materialization
    total = int(np.asarray(cnt[:max(n, 1)]).sum())
    dt = time.perf_counter() - t0
    edges = filter_dist_tuples(np.asarray(uhi), np.asarray(ulo),
                               np.asarray(cnt), n, cfg)
    print(f"reads={n_reads} T={T} K={K} distances<={cfg.max_distance}")
    print(f"raw pair observations ~{pairs/1e9:.2f}G, distinct keys {n}, "
          f"total counts {total}")
    print(f"wall: {dt:.1f}s  ({pairs/dt/1e6:.0f}M pair-observations/s)")
    print(f"unique kmers: {len(edges.unique_kmer_indices)}, "
          f"edges: {len(edges.i)}")
    import json
    print(json.dumps({
        "metric": "distance_stage_pair_obs_per_s",
        "value": round(pairs / dt / 1e6, 1), "unit": "M pair-obs/s",
        "reads": n_reads, "T": T, "K": K,
        "raw_pair_obs": int(pairs), "wall_s": round(dt, 1)}))


if __name__ == "__main__":
    main()
