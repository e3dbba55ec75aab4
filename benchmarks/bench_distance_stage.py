"""Benchmark: the unique-k-mer distance-graph stage at cenX-like scale.

The reference's dominant cost: ~9h wall / ~800GB RAM on a 50-thread server
for the (kmer x kmer x dist<=150) co-occurrence tabulation over rel2
(README.md:121-124) — about 1.6M pair observations/s. Here the same exact
counting runs as the production path (stages/distance_graph.py
recruit_unique_kmers): exact ragged pair enumeration on device,
sort/merge-forest counting, per-strip ON-DEVICE distance-consistency
filter — only surviving edges cross the device->host link. This script
builds a synthetic cloud tensor at cenX-like shape (reads x units-per-read
x rare-kmers-per-cloud over a rare-kmer vocabulary) and measures the full
d=1..max sweep, cold (incl. compiles) and warm.

Run: python benchmarks/bench_distance_stage.py [n_reads] [t_units] [k_per]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from centroflye_tpu.config import KmerRecruitmentConfig
    from centroflye_tpu.stages.distance_graph import recruit_unique_kmers

    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 80
    n_vocab = 400_000

    rng = np.random.default_rng(0)
    # clouds mimic the PRODUCTION regime (measured on the 1500-unit /
    # 52x demo): each genome unit has its own rare-k-mer subset
    # (~290/unit over a 432k vocabulary there); a read covers a
    # rel2-like SPAN of consecutive units — ~75% short reads (~6
    # units) and ~25% ultra-long (up to T) — and retains each cloud
    # entry with k-mer survival ~0.34. Span mix matters: with every
    # read spanning all T units the key-dedup factor is ~20 and the
    # count tables compress 20x; at the real mix it is ~1.0 (most
    # (i, j, d) keys observed once) and the sweep's raw sorted-pair
    # path carries the load — the regime this benchmark must measure.
    genome_units = 1500
    per_pos = rng.integers(0, n_vocab, size=(genome_units, K)).astype(
        np.int32)
    ul = rng.random(n_reads) < 0.25
    spans = np.where(
        ul, rng.integers(T // 2, T + 1, size=n_reads),
        np.minimum(rng.integers(3, 10, size=n_reads), T)).astype(int)
    clouds = np.full((n_reads, T, K), -1, np.int32)
    starts = rng.integers(0, genome_units - T, size=n_reads)
    for r in range(n_reads):
        clouds[r, :spans[r]] = per_pos[starts[r]:starts[r] + spans[r]]
    # per-entry survival 0.34 (noise loss; rows are canonicalized —
    # sorted, valid-front — by the sweep itself)
    mask = rng.random(clouds.shape) < 0.66
    clouds[mask] = -1
    n_units = spans.astype(np.int32)
    rare_codes = np.arange(n_vocab, dtype=np.uint64)

    cfg = KmerRecruitmentConfig(min_distance=1, max_distance=min(150, T - 1),
                                min_coverage=4)
    sizes = (clouds >= 0).sum(axis=2).astype(np.int64)
    obs = 0
    for d in range(cfg.min_distance, cfg.max_distance + 1):
        obs += int((sizes[:, :-d] * sizes[:, d:]).sum())

    results = {}
    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        uniq_codes, edges = recruit_unique_kmers(clouds, n_units,
                                                 rare_codes, cfg)
        dt = time.perf_counter() - t0
        results[tag] = dt
    print(f"reads={n_reads} T={T} K={K} distances<={cfg.max_distance}",
          file=sys.stderr)
    print(f"pair observations {obs/1e6:.0f}M; unique kmers "
          f"{len(uniq_codes)}, edges {len(edges.i)}; cold "
          f"{results['cold']:.1f}s, warm {results['warm']:.1f}s",
          file=sys.stderr)
    print(json.dumps({
        "metric": "distance_stage_pair_obs_per_s",
        "value": round(obs / results["warm"] / 1e6, 2),
        "unit": "M pair-obs/s",
        "reads": n_reads, "T": T, "K": K, "pair_obs": int(obs),
        "warm_s": round(results["warm"], 1),
        "cold_s": round(results["cold"], 1),
        "vs_reference_rate": round(
            (obs / results["warm"]) / 1.6e6, 2)}))


if __name__ == "__main__":
    main()
