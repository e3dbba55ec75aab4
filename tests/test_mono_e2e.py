"""End-to-end mono (cen6-style) tests: simulated monomer genome -> noisy
nucleotide reads -> in-repo monomer decomposition -> error correction ->
iterative graph -> scaffolding -> pseudounit polishing."""

import numpy as np
import pytest

from centroflye_tpu.config import MonoConfig
from centroflye_tpu.io.encoding import revcomp_str
from centroflye_tpu.mono.monostring import MonoString, GAP
from centroflye_tpu.mono.string_decomposer import (
    MonomerDecomposer, MonomerDecomposerConfig, decompose_to_monostrings,
)
from centroflye_tpu.mono.pipeline import MonoPipeline
from centroflye_tpu.pipeline.simulate import gen_random_seq, add_read_noise

N_MONO = 6
MONO_LEN = 60


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(11)
    monomers = {f"m{i}": gen_random_seq(rng, MONO_LEN)
                for i in range(N_MONO)}
    mono_seqs = list(monomers.values())

    # genome in monomer space: 40 HOR copies (ABCDEF) with scattered
    # variant monomers as unique markers
    hor = list(range(N_MONO))
    genome_syms = []
    for copy in range(40):
        block = list(hor)
        genome_syms.extend(block)
    genome_syms = np.array(genome_syms, np.int16)
    marks = rng.choice(len(genome_syms), size=14, replace=False)
    for pos in marks:
        cur = int(genome_syms[pos])
        choices = [x for x in range(N_MONO) if x != cur]
        genome_syms[pos] = choices[int(rng.integers(0, N_MONO - 1))]

    genome_nucl = "".join(mono_seqs[int(s)] for s in genome_syms)
    return dict(rng=rng, monomers=monomers, genome_syms=genome_syms,
                genome_nucl=genome_nucl, mono_seqs=mono_seqs)


def test_decomposer_exact_reads(world):
    # noiseless read = genome prefix; calls must match the true symbols
    g = world["genome_nucl"]
    syms = world["genome_syms"]
    read = g[:20 * MONO_LEN]
    dec = MonomerDecomposer(world["monomers"],
                            MonomerDecomposerConfig(batch_reads=4))
    rows = dec.decompose([("r0", read)])["r0"]
    called = [r[0] for r in rows if r[3] == "+"]
    assert len(called) == 20
    assert called == syms[:20].tolist()
    # boundaries exact on noiseless input
    for i, (sym, st, en, rel) in enumerate(rows):
        assert (st, en) == (i * MONO_LEN, (i + 1) * MONO_LEN)


def test_decomposer_noisy_reads(world):
    rng = np.random.default_rng(3)
    g = world["genome_nucl"]
    syms = world["genome_syms"]
    read = add_read_noise(rng, g[:30 * MONO_LEN], 0.05)
    dec = MonomerDecomposer(world["monomers"])
    rows = dec.decompose([("r0", read)])["r0"]
    called = [r[0] for r in rows]
    # allow small call-count drift from indels; >=90% identity to truth
    n = min(len(called), 30)
    agree = sum(1 for a, b in zip(called[:n], syms[:n].tolist()) if a == b)
    assert agree >= 0.9 * n, (agree, n)


def test_decomposer_reverse_strand(world):
    g = world["genome_nucl"]
    syms = world["genome_syms"]
    read = revcomp_str(g[:15 * MONO_LEN])
    sd = decompose_to_monostrings(world["monomers"], [("r0", read)])
    m = sd.monostrings["r0"]
    # flipped to canonical: strand '-', forward symbols matching the genome
    assert m.strand == "-"
    called = [s for s in m.syms.tolist() if s != int(GAP)]
    assert called == syms[:15].tolist()


@pytest.fixture(scope="module")
def assembly(world):
    rng = np.random.default_rng(21)
    g = world["genome_nucl"]
    # tiling noisy reads over the genome, both strands
    reads = {}
    read_len, stride = 12 * MONO_LEN, 4 * MONO_LEN
    i = 0
    for start in range(0, len(g) - read_len + 1, stride):
        seq = g[start:start + read_len]
        if i % 3 == 1:
            seq = revcomp_str(seq)
        reads[f"r{i:03d}"] = add_read_noise(rng, seq, 0.03)
        i += 1
    sd = decompose_to_monostrings(world["monomers"], reads.items())
    cfg = MonoConfig(min_k=3, max_k=8, min_mult=3, polish_n_iter=2,
                     hor_min_mult=200, min_uniq_len=6, max_uniq_cov=100,
                     cut_min_length=8)
    import tempfile
    outdir = tempfile.mkdtemp(prefix="mono_e2e_")
    pipe = MonoPipeline(cfg, outdir=outdir)
    asm = pipe.run(sd, reads)
    # graph observability artifacts (reference debruijn_graph.py:359-361,
    # :480 writes db_k{k}.dot per round and scaffold_graph.dot)
    import os
    assert os.path.exists(os.path.join(outdir, "idb", "db_k8.dot"))
    assert os.path.exists(os.path.join(outdir, "idb",
                                       "scaffold_graph.dot"))
    return asm


def test_mono_pipeline_contigs(world, assembly):
    # the iterative graph must produce contigs covering the HOR structure
    contigs = assembly.contigs_per_k[8]
    assert len(contigs) >= 1
    total = sum(len(c) for c in contigs)
    assert total >= 20


def test_mono_pipeline_scaffold_nucleotides(world, assembly):
    # polished nucleotide scaffolds must align well into the true genome
    from centroflye_tpu.ops.align_path import align_path
    assert assembly.scaffolds_nucl
    best = max(assembly.scaffolds_nucl, key=len)
    assert len(best) >= 10 * MONO_LEN
    al = align_path(best, world["genome_nucl"], mode="HW")
    assert al.dist / len(best) < 0.05, (al.dist, len(best))


def test_real_d6z1_monomer_calling(rng):
    """Realism check: the 18 real D6Z1 monomers (~171bp, highly similar
    alpha-satellite) must be called correctly on a noisy HOR read."""
    import os
    from centroflye_tpu.io import read_seqs
    data = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "centroflye_tpu", "data")
    monomers = read_seqs(os.path.join(data, "D6Z1_monomers.fasta"))
    names = list(monomers)
    hor = list(range(18))
    clean = "".join(monomers[names[i]] for i in hor * 2)
    read = add_read_noise(rng, clean, 0.05)
    dec = MonomerDecomposer(monomers, MonomerDecomposerConfig(batch_reads=2))
    rows = dec.decompose([("r0", read)])["r0"]
    called = [r[0] for r in rows]
    truth = hor * 2
    n = min(len(called), len(truth))
    agree = sum(1 for a, b in zip(called[:n], truth[:n]) if a == b)
    assert agree >= 0.9 * n, (agree, n)


def test_decomposer_mesh_identical(world):
    """Mesh-sharded monomer decomposition (parallel/mesh.
    make_perrow_myers_step over the 8-device CPU mesh) must produce
    bit-identical calls to the single-device path — including a read
    count that doesn't divide the device count (padding path)."""
    import jax
    from centroflye_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(5)
    g = world["genome_nucl"]
    reads = []
    for i in range(3):
        st = int(rng.integers(0, len(g) - 6 * MONO_LEN))
        reads.append((f"r{i}", g[st:st + 6 * MONO_LEN]))

    single = MonomerDecomposer(
        world["monomers"], MonomerDecomposerConfig(batch_reads=4))
    sharded = MonomerDecomposer(
        world["monomers"], MonomerDecomposerConfig(batch_reads=4),
        mesh=make_mesh())
    assert single.decompose(reads) == sharded.decompose(reads)
