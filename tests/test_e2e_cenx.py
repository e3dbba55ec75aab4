"""End-to-end cenX pipeline test: simulated mutated tandem repeat + reads
-> full assembly; the final contig must reconstruct the repeat region."""

import os

import numpy as np
import pytest

from centroflye_tpu.config import (
    CentroFlyeConfig, RecruitmentConfig, UnitDecompositionConfig,
    KmerRecruitmentConfig, PlacerConfig, ConsensusUnitConfig, PolisherConfig,
)
from centroflye_tpu.io import write_seqs, read_seq
from centroflye_tpu.io.encoding import revcomp_str
from centroflye_tpu.ops.align_path import align_path
from centroflye_tpu.pipeline.cenx import CenXPipeline
from centroflye_tpu.pipeline.simulate import (
    gen_random_seq, simulate_tandem_repeat, add_read_noise,
)

UNIT = 150
MULT = 30
FLANK = 4000
ERR = 0.02


@pytest.fixture(scope="module")
def sim_world(tmp_path_factory):
    rng = np.random.default_rng(23)
    unit = gen_random_seq(rng, UNIT)
    sim = simulate_tandem_repeat(rng, unit, mult=MULT, div_rate=0.03,
                                 flank_len=FLANK)
    g = sim.flanked_tr
    tr_start, tr_end = FLANK, FLANK + len(sim.tr)

    reads = {}
    # prefix reads
    for pi, left in enumerate([3500, 3000, 2600]):
        reads[f"pre{pi}"] = g[tr_start - left:tr_start + 10 * UNIT]
    # internal tiling reads (forward and reverse strands)
    i = 0
    start = tr_start + 100
    while start + 2200 < tr_end - 100:
        seq = g[start:start + 2200]
        if i % 3 == 1:
            seq = revcomp_str(seq)
        reads[f"int{i:02d}"] = seq
        start += 500
        i += 1
    # suffix reads
    for si, right in enumerate([3500, 3000]):
        reads[f"suf{si}"] = g[tr_end - 10 * UNIT:tr_end + right]
    # background noise reads (should not be recruited)
    for bi in range(4):
        reads[f"bg{bi}"] = gen_random_seq(rng, 3000)
    # mild noise on everything
    reads = {r: add_read_noise(rng, s, ERR) for r, s in reads.items()}

    outdir = str(tmp_path_factory.mktemp("cenx_e2e"))
    reads_fn = os.path.join(outdir, "reads.fasta")
    write_seqs(reads_fn, reads)
    return dict(unit=unit, sim=sim, reads_fn=reads_fn, outdir=outdir)


@pytest.fixture(scope="module")
def pipeline_cfg():
    return CentroFlyeConfig(
        coverage=4,
        recruitment=RecruitmentConfig(threshold=int(UNIT * 0.25),
                                      batch_size=16),
        decomposition=UnitDecompositionConfig(min_record_len=800),
        kmer_recruitment=KmerRecruitmentConfig(
            k=13, min_distance=1, max_distance=6, min_coverage=2,
            bottom=0.0, top=1e9),
        placer=PlacerConfig(min_cloud_kmer_freq=2, min_kmer_mult=2,
                            min_unit=2, min_inters=5,
                            prefix_threshold=1800, small_threshold=1000),
        consensus_unit=ConsensusUnitConfig(k=21),
        polisher=PolisherConfig(num_iters=2),
    )


@pytest.fixture(scope="module")
def assembly(sim_world, pipeline_cfg):
    # single-device pipeline here (the sharded path is covered by
    # tests/test_parallel.py's 1-vs-8 bit-identity test; running it on 8
    # virtual CPU devices doubles this fixture's wall-clock for no extra
    # signal)
    from centroflye_tpu.parallel.mesh import make_mesh
    pipe = CenXPipeline(sim_world["unit"], pipeline_cfg,
                        os.path.join(sim_world["outdir"], "run"),
                        mesh=make_mesh(1))
    final = pipe.run(sim_world["reads_fn"])
    return pipe, final


def test_recruitment_excludes_background(sim_world, assembly):
    pipe, _ = assembly
    from centroflye_tpu.io import read_seqs
    rec = read_seqs(os.path.join(pipe.outdir, "centromeric_reads.fasta"))
    assert not any(r.startswith("bg") for r in rec)
    assert any(r.startswith("pre") for r in rec)
    assert any(r.startswith("int") for r in rec)
    assert any(r.startswith("suf") for r in rec)


def test_assembly_matches_truth(sim_world, assembly):
    _, final = assembly
    truth = sim_world["sim"].tr
    assert len(final) > 0.8 * len(truth)
    # the assembly covers the repeat: align assembly into truth (infix);
    # with 2% read noise and majority polishing the divergence must be tiny
    al = align_path(final, truth, mode="HW")
    assert al.dist / len(final) < 0.02, al.dist


def test_artifacts_and_resume(sim_world, assembly, pipeline_cfg):
    pipe, final = assembly
    # artifacts exist with reference-compatible names
    assert os.path.exists(os.path.join(
        pipe.outdir, "recruited_unique_kmers",
        "unique_kmers_min_edge_cov_2.txt"))
    assert os.path.exists(os.path.join(
        pipe.outdir, "tr_resolution", "read_positions.csv"))
    assert os.path.exists(os.path.join(
        pipe.outdir, "cons_unit", "unit_star.fasta"))
    assert os.path.exists(os.path.join(pipe.outdir, "final_assembly.fasta"))
    # resume: a second run must reuse artifacts and reproduce the output
    pipe2 = CenXPipeline(sim_world["unit"], pipeline_cfg, pipe.outdir)
    final2 = pipe2.run(sim_world["reads_fn"])
    assert final2 == final


def test_unit_star_matches_unit(sim_world, assembly):
    pipe, _ = assembly
    unit_star = read_seq(os.path.join(pipe.outdir, "cons_unit",
                                      "unit_star.fasta"))
    al = align_path(unit_star, sim_world["unit"], mode="NW")
    assert al.dist <= 0.05 * UNIT
