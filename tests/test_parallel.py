"""Multi-chip sharding tests on the 8-device virtual CPU mesh: sharded
results must equal single-device results exactly."""

from collections import Counter

import jax
import numpy as np
import pytest

from centroflye_tpu.io import encode, encode_batch
from centroflye_tpu.ops.myers import build_peq, myers_distance_batch
from centroflye_tpu.ops.kmers import table_to_numpy
from centroflye_tpu.parallel.mesh import (
    make_mesh, shard_batch, make_recruitment_step, make_kmer_count_step,
    make_placement_score_step,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
    return make_mesh()


def test_sharded_recruitment_matches_single(mesh, rng, make_dna):
    from centroflye_tpu.io.encoding import revcomp
    unit = make_dna(120)
    unit_codes = encode(unit)
    peq_f = build_peq(unit_codes)
    peq_r = build_peq(revcomp(unit_codes))
    texts = [make_dna(int(rng.integers(100, 800))) for _ in range(16)]
    codes, lens = encode_batch(texts, max_len=1024)

    step = make_recruitment_step(mesh, len(unit))
    s_codes, s_lens = shard_batch(mesh, codes, lens)
    df, dr = step(peq_f, peq_r, s_codes, s_lens)

    ref_f = myers_distance_batch(peq_f, codes, lens, m=len(unit), mode="HW")
    ref_r = myers_distance_batch(peq_r, codes, lens, m=len(unit), mode="HW")
    assert np.array_equal(np.asarray(df), np.asarray(ref_f["dist"]))
    assert np.array_equal(np.asarray(dr), np.asarray(ref_r["dist"]))


def test_sharded_kmer_count_matches_counter(mesh, make_dna):
    k = 9
    seqs = [make_dna(300) for _ in range(16)]
    codes, lens = encode_batch(seqs, max_len=512)
    step = make_kmer_count_step(mesh, k=k, capacity=8192)
    s_codes, s_lens = shard_batch(mesh, codes, lens)
    uhi, ulo, cnt, n = step(s_codes, s_lens)
    got_codes, got_counts = table_to_numpy(
        np.asarray(uhi), np.asarray(ulo), np.asarray(cnt), int(n))
    from centroflye_tpu.io import kmer_strings
    got = dict(zip(kmer_strings(got_codes, k), got_counts.tolist()))
    want = Counter()
    for s in seqs:
        want.update(s[i:i + k] for i in range(len(s) - k + 1))
    assert got == dict(want)


def test_sharded_placement_scores(mesh, rng):
    from centroflye_tpu.ops.scoring import (
        placement_scores, clouds_to_bitmaps,
    )
    R, T, K, n_kmers, Pdim = 16, 6, 5, 64, 12
    clouds = rng.integers(-1, n_kmers, size=(R, T, K)).astype(np.int32)
    read_bm = clouds_to_bitmaps(clouds, n_kmers)
    contig_bm = rng.integers(0, 2**31, size=(Pdim, 2)).astype(np.uint32)

    step = make_placement_score_step(mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P
    rb = jax.device_put(read_bm, NamedSharding(mesh, P("reads", None, None)))
    cb = jax.device_put(contig_bm, NamedSharding(mesh, P(None, None)))
    s0, s1, best = step(rb, cb)

    r0, r1 = placement_scores(read_bm, contig_bm)
    assert np.array_equal(np.asarray(s0), np.asarray(r0))
    assert np.array_equal(np.asarray(s1), np.asarray(r1))
    m0 = int(np.max(np.asarray(r0)))
    m1 = int(np.max(np.where(np.asarray(r0) == m0, np.asarray(r1), -1)))
    assert np.asarray(best).tolist() == [m0, m1]


def test_placement_scores_match_set_oracle(rng):
    from centroflye_tpu.ops.scoring import (
        placement_scores, clouds_to_bitmaps,
    )
    R, T, K, n_kmers, Pdim = 4, 5, 6, 50, 10
    clouds = rng.integers(-1, n_kmers, size=(R, T, K)).astype(np.int32)
    contig_sets = [set(rng.integers(0, n_kmers, size=8).tolist())
                   for _ in range(Pdim)]
    contig_bm = np.zeros((Pdim, -(-n_kmers // 32)), np.uint32)
    for p, s in enumerate(contig_sets):
        for v in s:
            contig_bm[p, v // 32] |= np.uint32(1) << np.uint32(v % 32)
    read_bm = clouds_to_bitmaps(clouds, n_kmers)
    s0, s1 = placement_scores(read_bm, contig_bm)
    for r in range(R):
        for o in range(Pdim):
            w0 = w1 = 0
            for t in range(T):
                if o + t >= Pdim:
                    continue
                cl = {int(x) for x in clouds[r, t] if x >= 0}
                inter = cl & contig_sets[o + t]
                w0 += len(inter) >= 1
                w1 += len(inter)
            assert int(s0[r, o]) == w0
            assert int(s1[r, o]) == w1


def test_pipeline_artifacts_identical_1_vs_8_devices(tmp_path):
    """CenXPipeline's device stages (recruitment, rare k-mers, distance
    table) must produce bit-identical artifacts on a single device and on
    the 8-device mesh — the sharded steps are exact, not approximate."""
    import os
    from centroflye_tpu.config import (
        CentroFlyeConfig, RecruitmentConfig, UnitDecompositionConfig,
        KmerRecruitmentConfig, PlacerConfig, ConsensusUnitConfig,
        PolisherConfig)
    from centroflye_tpu.io import write_seqs
    from centroflye_tpu.pipeline.cenx import CenXPipeline
    from centroflye_tpu.pipeline.simulate import (
        gen_random_seq, simulate_tandem_repeat, add_read_noise)

    rng = np.random.default_rng(5)
    UNIT = 120
    unit = gen_random_seq(rng, UNIT)
    sim = simulate_tandem_repeat(rng, unit, mult=24, div_rate=0.03,
                                 flank_len=3000)
    g = sim.flanked_tr
    tr_start, tr_end = 3000, 3000 + len(sim.tr)
    reads = {}
    for pi, left in enumerate([2800, 2400]):
        reads[f"pre{pi}"] = g[tr_start - left:tr_start + 10 * UNIT]
    start = tr_start + 80
    i = 0
    while start + 1800 < tr_end:
        reads[f"int{i:02d}"] = g[start:start + 1800]
        start += 400
        i += 1
    for si, right in enumerate([2800, 2400]):
        reads[f"suf{si}"] = g[tr_end - 10 * UNIT:tr_end + right]
    for bi in range(3):
        reads[f"bg{bi}"] = gen_random_seq(rng, 2500)
    reads = {r: add_read_noise(rng, s, 0.02) for r, s in reads.items()}

    cfg = CentroFlyeConfig(
        coverage=4,
        recruitment=RecruitmentConfig(threshold=int(UNIT * 0.25),
                                      batch_size=16),
        decomposition=UnitDecompositionConfig(min_record_len=600),
        kmer_recruitment=KmerRecruitmentConfig(
            k=13, min_distance=1, max_distance=6, min_coverage=2,
            bottom=0.0, top=1e9),
        placer=PlacerConfig(min_cloud_kmer_freq=2, min_kmer_mult=2,
                            min_unit=2, min_inters=5,
                            prefix_threshold=1500, small_threshold=900),
        consensus_unit=ConsensusUnitConfig(k=21),
        polisher=PolisherConfig(num_iters=1),
    )
    reads_fn = str(tmp_path / "reads.fasta")
    write_seqs(reads_fn, reads)

    outs = {}
    for tag, mesh in (("one", make_mesh(1)), ("eight", make_mesh(8))):
        outdir = str(tmp_path / tag)
        pipe = CenXPipeline(unit, cfg, outdir, mesh=mesh)
        if tag == "eight":
            assert pipe.mesh is not None and pipe.mesh.devices.size == 8
        else:
            assert pipe.mesh is None
        final = pipe.run(reads_fn)
        outs[tag] = (outdir, final)

    assert outs["one"][1] == outs["eight"][1]
    for art in ("centromeric_reads.fasta",
                "recruited_unique_kmers/unique_kmers_min_edge_cov_2.txt",
                "recruited_unique_kmers/unique_edges_min_edge_cov_2.txt",
                "tr_resolution/read_positions.csv",
                "final_assembly.fasta"):
        a = open(os.path.join(outs["one"][0], art)).read()
        b = open(os.path.join(outs["eight"][0], art)).read()
        assert a == b, f"artifact differs across device counts: {art}"
