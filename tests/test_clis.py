"""Smoke tests for the module CLIs (argparse mains) on tiny inputs."""

import json
import os

import numpy as np
import pytest

from centroflye_tpu.io import read_seq, read_seqs, write_seqs
from centroflye_tpu.pipeline.simulate import gen_random_seq, add_read_noise


def test_simulate_cli(tmp_path):
    from centroflye_tpu.pipeline.simulate import main
    out = str(tmp_path / "sim")
    main(["--multiplicity", "10", "--div-rate", "0.02", "--unit-len", "80",
          "--flank-len", "500", "-o", out, "--seed", "3",
          "--n-reads", "5", "--read-len-mean", "600",
          "--read-len-std", "50", "--error-rate", "0.05"])
    assert os.path.exists(os.path.join(out, "tandem_repeat.fasta"))
    assert os.path.exists(os.path.join(out, "all_muts.json"))
    reads = read_seqs(os.path.join(out, "reads.fasta"))
    assert len(reads) == 5


def test_recruitment_cli(tmp_path, rng):
    from centroflye_tpu.stages.recruitment import main
    unit = gen_random_seq(rng, 120)
    write_seqs(str(tmp_path / "unit.fasta"), {"u": unit})
    write_seqs(str(tmp_path / "reads.fasta"), {
        "hit": add_read_noise(rng, unit * 4, 0.05),
        "miss": gen_random_seq(rng, 600)})
    main([str(tmp_path / "unit.fasta"), str(tmp_path / "reads.fasta"),
          str(tmp_path / "out.fasta"), "30", "--batch-size", "4"])
    assert set(read_seqs(str(tmp_path / "out.fasta"))) == {"hit"}


def test_cenx_cli_with_config(tmp_path, rng):
    from centroflye_tpu.pipeline.cenx import main
    from centroflye_tpu.config import (
        CentroFlyeConfig, RecruitmentConfig, UnitDecompositionConfig,
        KmerRecruitmentConfig, PlacerConfig, ConsensusUnitConfig,
        PolisherConfig)
    from centroflye_tpu.pipeline.simulate import simulate_tandem_repeat

    unit = gen_random_seq(rng, 120)
    sim = simulate_tandem_repeat(rng, unit, mult=20, div_rate=0.03,
                                 flank_len=2000)
    g = sim.flanked_tr
    ts, te = 2000, 2000 + len(sim.tr)
    reads = {}
    for pi, left in enumerate([1800, 1500]):
        reads[f"pre{pi}"] = g[ts - left:ts + 8 * 120]
    i = 0
    start = ts
    while start + 1400 < te:
        reads[f"int{i}"] = g[start:start + 1400]
        start += 350
        i += 1
    for si, right in enumerate([1800, 1500]):
        reads[f"suf{si}"] = g[te - 8 * 120:te + right]
    write_seqs(str(tmp_path / "reads.fasta"), reads)
    write_seqs(str(tmp_path / "unit.fasta"), {"u": unit})

    cfg = CentroFlyeConfig(
        coverage=4,
        recruitment=RecruitmentConfig(threshold=30, batch_size=8),
        decomposition=UnitDecompositionConfig(min_record_len=700),
        kmer_recruitment=KmerRecruitmentConfig(
            k=13, max_distance=5, min_coverage=2, bottom=0.0, top=1e9),
        placer=PlacerConfig(min_inters=5, prefix_threshold=1200),
        consensus_unit=ConsensusUnitConfig(k=21),
        polisher=PolisherConfig(num_iters=1))
    cfg_fn = str(tmp_path / "cfg.json")
    with open(cfg_fn, "w") as f:
        f.write(cfg.to_json())
    outdir = str(tmp_path / "run")
    main(["-i", str(tmp_path / "reads.fasta"), "-o", outdir,
          "-u", str(tmp_path / "unit.fasta"), "-c", "4",
          "--config", cfg_fn])
    final = read_seq(os.path.join(outdir, "final_assembly.fasta"))
    assert len(final) > 0.5 * len(sim.tr)
    # metrics artifact exists with all stages
    with open(os.path.join(outdir, "metrics.json")) as f:
        metrics = json.load(f)
    assert "recruitment" in metrics and "polishing" in metrics


def test_unit_extraction_cli(tmp_path, rng):
    from centroflye_tpu.stages.unit_extraction import main
    unit = gen_random_seq(rng, 150)
    reads = {f"r{i}": add_read_noise(rng, unit * 10, 0.03)
             for i in range(2)}
    write_seqs(str(tmp_path / "reads.fasta"), reads)
    out = str(tmp_path / "units.fasta")
    plot_dir = str(tmp_path / "plots")
    main(["--reads", str(tmp_path / "reads.fasta"), "--output", out,
          "--cluster", "--plot-dir", plot_dir])
    units = read_seqs(out)
    assert len(units) >= 1
    assert os.path.exists(out + ".clusters.fasta")
    # period-histogram PDFs (reference unit_extractor.py:148-151); the
    # plot helper degrades to False only when matplotlib is missing
    import importlib.util
    if importlib.util.find_spec("matplotlib") is not None:
        pdfs = [f for f in os.listdir(plot_dir) if f.endswith(".pdf")]
        assert len(pdfs) == len(reads)
