"""North-star demo: the cenX pipeline at the REFERENCE'S production shape.

The reference's proven envelope is rel2: a ~1,500-unit / ~3.1 Mbp DXZ1
array at coverage 32, reads ~14 kb mean with an ultra-long tail, ~8-15%
ONT error, assembled in ~9 h / 800 GB RAM on a 50-thread server
(reference README.md:72-75,121-124; centroFlye.py:40-134 defaults).
This script simulates that shape and runs CenXPipeline end-to-end with
the reference defaults (k=19, d<=150, min_coverage=4, bottom 0.9 /
top 3.0), reporting per-stage wall-clock, peak RSS, and the final
assembly divergence vs the simulated ground truth.

NOISE MODEL NOTE (measured, 400-unit run at uniform 8%): the
distance-graph algorithm needs edge counts >= min_coverage=4, and an
edge's count is (reads spanning both copies) x (joint survival of two
k=19-mers) = ~31 x (1-e)^38. At UNIFORM e=8% that is ~31 x 0.042 = 1.3
< 4 — no edges survive (we measured 204 unique k-mers, 3 placed reads),
and the reference's own scripts would fail identically on such input.
The reference's default kmer-survival-rate 0.34 (centroFlye.py:52)
corresponds to (1-e)^19 = 0.34, i.e. ~5.5% EFFECTIVE uniform error —
real ONT error is higher nominally but clustered (homopolymers), so
5.5% uniform is the rel2-equivalent regime. `--noise-mode clustered`
simulates that directly: bursty, homopolymer-biased errors at the
NOMINAL rate whose k-mer survival matches the uniform-rate equivalent
(pipeline/simulate.add_read_noise_clustered).

Run: python benchmarks/demo_cenx_production.py [n_units] [coverage] [noise]
                                               [--noise-mode uniform|clustered]
Defaults 1500 50 0.055: rel2 is ~50x TOTAL with ~32x on ultra-long
50kb+ reads (README.md:87; centroFlye.py:31-32 — the reference's
--coverage 32 counts only 50kb+ reads), at rel2-equivalent error.
Smaller shapes, e.g. `200 25 0.055`, are useful for smoke runs.
"""

import json
import logging
import os
import resource
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from centroflye_tpu.config import (
    CentroFlyeConfig, RecruitmentConfig, UnitDecompositionConfig,
    KmerRecruitmentConfig, PlacerConfig, ConsensusUnitConfig,
    PolisherConfig,
)
from centroflye_tpu.io import write_seqs, read_seq
from centroflye_tpu.io.encoding import revcomp_str
from centroflye_tpu.ops.align_path import align_path
from centroflye_tpu.pipeline import simulate as sim_mod
from centroflye_tpu.pipeline.cenx import CenXPipeline


def rel2_length_mix(rng, n):
    """rel2-like read lengths for the RECRUITED cenX set: the reference
    runs with --coverage 32 documented as 'Coverage with ultra-long
    (50kb+) reads' (centroFlye.py:31-32) out of the ~50x total rel2 set
    (README.md:87) — i.e. ~2/3 of recruited BASES ride 50kb+ reads.
    This mix realizes that split: 25% of reads ~79 kb mean (tail past
    150 kb), 75% ~13 kb mean => ~0.65 of bases in 50kb+ reads. The UL
    share is STRUCTURAL, not cosmetic: a distance-d edge's count is
    (reads spanning units t and t+d) x survival^2, and only 50kb+
    reads span enough unit pairs to push counts over min_coverage=4 —
    a short-read mix starves the unique-k-mer stage at any coverage
    (measured: 3,593 unique k-mers / 24 placed reads of 5,542 at a
    32x mostly-short mix)."""
    ul = rng.random(n) < 0.25
    lens = np.where(
        ul,
        rng.lognormal(np.log(75_000), 0.35, n),
        rng.lognormal(np.log(11_000), 0.6, n))
    return np.clip(lens, 3_000, 200_000).astype(np.int64)


def sample_divergence(assembly, truth, rng, chunk=10_000, n_chunks=32,
                      window=30_000):
    """Divergence estimate: HW-align truth chunks sampled at even
    fractions into a +-window slice of the assembly at the same
    fraction (the two are collinear when assembly is correct, so a
    bounded window suffices; full 3 Mb x 3 Mb alignment is pointless).
    Returns (total_dist, total_aligned, per-chunk list)."""
    n_t, n_a = len(truth), len(assembly)
    if n_a == 0:
        return 0, 0, []
    tot_d = tot_b = 0
    per = []
    fracs = np.linspace(0.0, 1.0 - chunk / n_t, n_chunks)
    for f in fracs:
        ts = int(f * n_t)
        piece = truth[ts:ts + chunk]
        ac = int(f * n_a)
        lo, hi = max(0, ac - window), min(n_a, ac + chunk + window)
        al = align_path(piece, assembly[lo:hi], mode="HW")
        tot_d += al.dist
        tot_b += len(piece)
        per.append(round(al.dist / max(len(piece), 1), 5))
    return tot_d, tot_b, per


def build_world(n_units, coverage, noise, *, seed=7, div_rate=0.003,
                flank=200_000, noise_mode="uniform"):
    """Simulate the rel2-shaped world: flanked tandem array + reads.

    Returns (reads dict, sim result, realized total tandem coverage,
    realized 50kb+ coverage). Seeded — identical inputs across runs."""
    unit = read_seq(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "centroflye_tpu", "data", "DXZ1_rc.fasta"))
    rng = np.random.default_rng(seed)
    sim = sim_mod.simulate_tandem_repeat(rng, unit, n_units, div_rate,
                                         flank_len=flank)
    g = sim.flanked_tr
    ts, te = flank, flank + len(sim.tr)

    # reads: uniform starts over the flanked genome, rel2-like lengths,
    # random strand, `noise` sub/ins/del error
    n_reads = int(coverage * len(g) / 29_000)   # mix mean ~29 kb
    lens = rel2_length_mix(rng, n_reads)
    starts = rng.integers(0, len(g), size=n_reads)
    reads = {}
    cen_bases = 0
    ul_cen_bases = 0      # bases on 50kb+ reads — the reference's
    #                       --coverage counts THESE (centroFlye.py:31-32)
    for i in range(n_reads):
        s, L = int(starts[i]), int(lens[i])
        seq = g[s:s + L]
        if len(seq) < 3000:
            continue
        ov = max(0, min(s + L, te) - max(s, ts))
        cen_bases += ov
        if len(seq) >= 50_000:
            ul_cen_bases += ov
        if rng.random() < 0.5:
            seq = revcomp_str(seq)
        reads[f"sim{i:05d}"] = seq
    # ultra-long boundary reads at rel2-like depth: the rel2 release is
    # specifically a 50x ULTRA-LONG set, so ~25-50 reads span each
    # array boundary with >50 kb of flank (the reference's
    # prefix-threshold, centroFlye.py:32) — the greedy placer IGNITES
    # from these seeds (a k-mer turns "frequent" only once 2 seed reads
    # retain it at the same position; 3 seeds at (1-e)^19 k-mer
    # survival leave the contig too sparse for min_inters=10, measured:
    # placement stalls at 3/1487 reads with 3 guaranteed seeds)
    n_bnd = 24
    for j in range(n_bnd):
        left = int(rng.integers(52_000, 90_000))
        into = int(rng.integers(4, 10)) * len(unit)
        reads[f"pre{j:02d}"] = g[ts - left:ts + into]
    for j in range(n_bnd):
        right = int(rng.integers(52_000, 90_000))
        into = int(rng.integers(4, 10)) * len(unit)
        reads[f"suf{j:02d}"] = g[te - into:te + right]
    # background-only reads (recruitment reject path)
    for b in range(300):
        reads[f"bg{b:03d}"] = sim_mod.gen_random_seq(rng, 12_000)
    if noise_mode == "clustered":
        reads = {r: sim_mod.add_read_noise_clustered(rng, s, noise)
                 for r, s in reads.items()}
    else:
        reads = {r: sim_mod.add_read_noise(rng, s, noise)
                 for r, s in reads.items()}
    return unit, reads, sim, cen_bases / len(sim.tr), \
        ul_cen_bases / len(sim.tr)


def classify_divergence(final, truth, unit_len, rundir, rng):
    """Per-unit-window error classification (the reference ships only
    whole-assembly convergence diagnostics, eltr_polisher.py:133-146;
    round-4 verdict asked for a per-window error-class artifact): align
    every truth unit window into the assembly, classify divergent
    windows as array_end (first/last 2 units), low_coverage (< 6 placed
    reads span the unit), or interior. Returns (rows, class summary)."""
    import numpy as _np
    from centroflye_tpu.stages.read_placer import read_positions_file
    from centroflye_tpu.pipeline.cenx import load_decomposition

    pos_fn = os.path.join(rundir, "tr_resolution", "read_positions.csv")
    dec_fn = os.path.join(rundir, "decomposition.json")
    placements = read_positions_file(pos_fn)
    dec = load_decomposition(dec_fn)
    total_units = 0
    for r, p in placements.items():
        if p is not None and r in dec.records:
            total_units = max(total_units,
                              p + len(dec.records[r].bounds) - 1)
    cov = _np.zeros(max(total_units, 1), _np.int32)
    for r, p in placements.items():
        if p is not None and r in dec.records:
            nu = len(dec.records[r].bounds) - 1
            cov[p:p + nu] += 1
    n_t, n_a = len(truth), len(final)
    n_units_t = n_t // unit_len
    rows = []
    for u in range(n_units_t):
        ts = u * unit_len
        piece = truth[ts:ts + unit_len]
        ac = int(ts / n_t * n_a)
        lo, hi = max(0, ac - 8000), min(n_a, ac + unit_len + 8000)
        win = final[lo:hi]
        al = align_path(piece, win, mode="HW")
        div = al.dist / max(len(piece), 1)
        cu = min(int(u / n_units_t * len(cov)), len(cov) - 1)
        if u < 2 or u >= n_units_t - 2:
            cls = "array_end"
        elif cov[cu] < 6:
            cls = "low_coverage"
        elif al.dist >= 4:
            # unit-boundary class: the error concentrated in the unit's
            # first/last ~25 bp (reads disagreeing on the phase of a
            # unit seam truncate the per-position consensus there)
            al_t = align_path(piece[25:-25], win, mode="HW")
            cls = ("unit_boundary"
                   if al.dist - al_t.dist >= 0.7 * al.dist
                   else "interior")
        else:
            cls = "interior"
        rows.append({"unit": u, "divergence": round(div, 5),
                     "coverage": int(cov[cu]), "class": cls})
    summary = {}
    for cls in ("array_end", "low_coverage", "unit_boundary",
                "interior"):
        sel = [r for r in rows if r["class"] == cls]
        bad = [r for r in sel if r["divergence"] > 0.001]
        if sel:
            summary[cls] = {
                "units": len(sel),
                "units_over_0.1pct": len(bad),
                "mean_divergence": round(
                    sum(r["divergence"] for r in sel) / len(sel), 5),
                "max_divergence": max(r["divergence"] for r in sel),
            }
    return rows, summary


def run_production(n_units, coverage, noise, *, tag=None, fresh=False,
                   auto_min_coverage=False, noise_mode="uniform",
                   save_artifact=True, seed=7):
    """Simulate + run the full cenX pipeline; return the summary dict
    (the same one main() prints and persists)."""
    t_all = time.time()
    print(f"simulating {n_units}-unit array, coverage {coverage}, "
          f"noise {noise:.0%} ({noise_mode})...", flush=True)
    unit, reads, sim, realized_cov, realized_ul_cov = build_world(
        n_units, coverage, noise, seed=seed, noise_mode=noise_mode)
    print(f"{len(reads)} reads, tandem {len(sim.tr):,} bp, realized "
          f"tandem coverage {realized_cov:.1f}x "
          f"({realized_ul_cov:.1f}x on 50kb+ reads)", flush=True)

    if tag is None:
        tag = f"{n_units}u_c{int(coverage)}_n{int(noise * 100)}"
        if noise_mode != "uniform":
            tag += f"_{noise_mode}"
    simdir, rundir = f"/tmp/cenx_prod_sim_{tag}", f"/tmp/cenx_prod_run_{tag}"
    # the pipeline's skip-if-exists resume lets an interrupted run pick
    # up at the first missing artifact (the simulation is seeded, so
    # re-simulated reads are identical); CENTROFLYE_DEMO_FRESH=1 wipes
    if fresh or os.environ.get("CENTROFLYE_DEMO_FRESH") == "1":
        shutil.rmtree(rundir, ignore_errors=True)
    os.makedirs(simdir, exist_ok=True)
    write_seqs(os.path.join(simdir, "reads.fasta"), reads)
    t_sim = time.time() - t_all

    # effective per-k-mer survival: uniform noise kills a k-mer with any
    # hit in its 19 bases; clustered mode is calibrated to the same
    # EFFECTIVE survival at its nominal rate (simulate.py)
    eff_noise = (sim_mod.clustered_effective_error(noise)
                 if noise_mode == "clustered" else noise)
    survival = (1.0 - eff_noise) ** 19
    # the reference's --coverage is the ULTRA-LONG (50kb+) coverage
    # (centroFlye.py:31-32, 32 for rel2) — the rare band and placer
    # calibrate against it, while all recruited reads feed the stages
    cfg = CentroFlyeConfig(
        coverage=max(int(round(realized_ul_cov)), 1),
        recruitment=RecruitmentConfig(threshold=350),
        decomposition=UnitDecompositionConfig(min_record_len=5000),
        kmer_recruitment=KmerRecruitmentConfig(
            k=19, min_distance=1, max_distance=150, min_coverage=4,
            bottom=0.9, top=3.0, kmer_survival_rate=survival,
            auto_min_coverage=auto_min_coverage),
        placer=PlacerConfig(),                      # reference defaults
        consensus_unit=ConsensusUnitConfig(k=30),
        polisher=PolisherConfig(num_iters=4))
    pipe = CenXPipeline(unit, cfg, rundir)
    final = pipe.run(os.path.join(simdir, "reads.fasta"))
    wall = time.time() - t_all

    rng = np.random.default_rng(seed + 1)
    d, b, per_chunk = sample_divergence(final, sim.tr, rng)
    try:
        class_rows, class_summary = classify_divergence(
            final, sim.tr, len(unit), rundir, rng)
    except Exception as e:      # classification is diagnostics, not gate
        class_rows, class_summary = [], {"error": str(e)}
    peak_rss_gb = resource.getrusage(
        resource.RUSAGE_SELF).ru_maxrss / (1 << 20)
    div = d / max(b, 1)
    summary = {
        "shape": {"n_units": n_units, "tandem_bp": len(sim.tr),
                  "coverage": round(realized_cov, 1),
                  "coverage_ul50kb": round(realized_ul_cov, 1),
                  "noise": noise, "noise_mode": noise_mode,
                  "n_reads": len(reads),
                  "read_bp": sum(len(s) for s in reads.values())},
        "auto_min_coverage": auto_min_coverage,
        "assembly_bp": len(final),
        "truth_bp": len(sim.tr),
        "length_error": round(abs(len(final) - len(sim.tr))
                              / len(sim.tr), 5),
        "sampled_divergence": round(div, 5),
        "divergence_chunks": per_chunk,
        "divergence_classes": class_summary,
        "wall_s": round(wall, 1),
        "sim_s": round(t_sim, 1),
        "peak_rss_gb": round(peak_rss_gb, 2),
        "stages": {k: {"wall_s": round(v.wall_s, 1), "items": v.items}
                   for k, v in pipe.metrics.stages.items()},
        "reference_envelope": "9 h wall / 800 GB RAM, 50 threads "
                              "(README.md:72-75,121-124)",
    }
    print(json.dumps(summary, indent=2), flush=True)
    if save_artifact and class_rows:
        cls_fn = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            f"divergence_classes_{tag}.json")
        with open(cls_fn, "w") as f:
            json.dump({"summary": class_summary, "units": class_rows}, f)
    if save_artifact:
        out_fn = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            f"production_{tag}.json")
        with open(out_fn, "w") as f:
            json.dump(summary, f, indent=2)
        print(f"assembly {len(final):,} bp vs truth {len(sim.tr):,} bp; "
              f"sampled divergence {div:.4%}; wall {wall:.0f}s; "
              f"peak RSS {peak_rss_gb:.1f} GB -> {out_fn}", flush=True)
    return summary


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    noise_mode = "uniform"
    argv = sys.argv[1:]
    if "--noise-mode" in argv:
        noise_mode = argv[argv.index("--noise-mode") + 1]
    auto = "--auto-min-coverage" in argv
    n_units = int(args[0]) if len(args) > 0 else 1500
    coverage = float(args[1]) if len(args) > 1 else 50.0
    noise = float(args[2]) if len(args) > 2 else 0.055
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s: %(message)s")
    run_production(n_units, coverage, noise, noise_mode=noise_mode,
                   auto_min_coverage=auto)


if __name__ == "__main__":
    main()
