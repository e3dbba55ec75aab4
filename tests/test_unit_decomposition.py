import numpy as np
import pytest

from centroflye_tpu.config import UnitDecompositionConfig
from centroflye_tpu.io.encoding import revcomp_str
from centroflye_tpu.pipeline.simulate import (
    gen_random_seq, simulate_tandem_repeat, add_read_noise,
)
from centroflye_tpu.stages.unit_decomposition import UnitDecomposer


UNIT_LEN = 400


@pytest.fixture
def unit(rng):
    return gen_random_seq(rng, UNIT_LEN)


def cfg(min_record_len=1000):
    return UnitDecompositionConfig(min_record_len=min_record_len)


def test_clean_tandem_boundaries(unit, rng):
    # noiseless read = 6 exact copies: boundaries must be exact multiples
    read = unit * 6
    dec = UnitDecomposer(unit, cfg()).decompose([("r0", read)])
    rec = dec.records["r0"]
    assert rec.strand == "+"
    assert rec.r_st == 0 and rec.r_en == len(read)
    assert rec.n_units == 6
    assert rec.bounds.tolist() == [i * UNIT_LEN for i in range(7)]
    assert rec.motif_alignments() == [unit] * 6


def test_noisy_tandem_instances(unit, rng):
    copies = [add_read_noise(rng, unit, 0.1) for _ in range(8)]
    read = "".join(copies)
    dec = UnitDecomposer(unit, cfg()).decompose([("r0", read)])
    rec = dec.records["r0"]
    assert rec.n_units == 8
    # each recovered boundary within drift tolerance of the true one
    true_bounds = np.cumsum([0] + [len(c) for c in copies])
    got = rec.bounds + rec.r_st
    assert len(got) == len(true_bounds)
    assert np.abs(got - true_bounds).max() < 0.15 * UNIT_LEN


def test_reverse_strand_canonicalization(unit, rng):
    read_f = "".join(add_read_noise(rng, unit, 0.08) for _ in range(5))
    read = revcomp_str(read_f)
    dec = UnitDecomposer(unit, cfg()).decompose([("r0", read)])
    rec = dec.records["r0"]
    assert rec.strand == "-"
    assert rec.n_units == 5
    # canonical seq must align to forward unit repeats: check seed overlap
    # between canonical instance 2 and the unit
    inst = rec.motif_alignments()[2]
    k = 15
    unit_kmers = {unit[i:i + k] for i in range(len(unit) - k + 1)}
    hits = sum(inst[i:i + k] in unit_kmers for i in range(len(inst) - k + 1))
    assert hits > 10


def test_flanked_read_interval(unit, rng):
    flank_l = gen_random_seq(rng, 3000)
    flank_r = gen_random_seq(rng, 2000)
    tr = "".join(add_read_noise(rng, unit, 0.1) for _ in range(6))
    read = flank_l + tr + flank_r
    dec = UnitDecomposer(unit, cfg()).decompose([("r0", read)])
    rec = dec.records["r0"]
    assert abs(rec.r_st - 3000) < 0.2 * UNIT_LEN
    assert abs(rec.r_en - (3000 + len(tr))) < 0.2 * UNIT_LEN
    assert 5 <= rec.n_units <= 7


def test_min_record_len_filter(unit, rng):
    short = unit * 2        # 800 bp < min_record_len=1000
    dec = UnitDecomposer(unit, cfg(min_record_len=1000)).decompose(
        [("r0", short)])
    assert "r0" not in dec.records
    assert "r0" in dec.discarded


def test_no_repeat_read(unit, rng):
    read = gen_random_seq(rng, 5000)
    dec = UnitDecomposer(unit, cfg()).decompose([("r0", read)])
    assert "r0" not in dec.records
    # a few chance seed hits may create tiny intervals, but no record


def test_classify_prefix_internal_suffix(unit, rng):
    # genome: big left flank + tandem + big right flank
    sim = simulate_tandem_repeat(rng, unit, mult=40, div_rate=0.02,
                                 flank_len=8000)
    g = sim.flanked_tr
    tr_start, tr_end = 8000, 8000 + len(sim.tr)
    # prefix read: enters repeat from the left flank, ends inside repeat
    prefix_read = g[tr_start - 6000:tr_start + 4000]
    # internal read: fully inside the repeat
    internal_read = g[tr_start + 2000:tr_start + 9000]
    # suffix read: starts inside repeat, exits into right flank
    suffix_read = g[tr_end - 4000:tr_end + 6000]
    reads = [("pre", prefix_read), ("int", internal_read),
             ("suf", suffix_read)]
    reads = [(r_id, add_read_noise(rng, s, 0.05)) for r_id, s in reads]
    dec = UnitDecomposer(unit, cfg()).decompose(reads)
    assert set(dec.records) == {"pre", "int", "suf"}
    pre, internal, suf = dec.classify(large_threshold=5000,
                                      small_threshold=1000)
    assert pre == ["pre"]
    assert internal == ["int"]
    assert suf == ["suf"]


def test_classify_reverse_strand_prefix(unit, rng):
    sim = simulate_tandem_repeat(rng, unit, mult=40, div_rate=0.02,
                                 flank_len=8000)
    g = sim.flanked_tr
    tr_start = 8000
    prefix_read = revcomp_str(
        add_read_noise(rng, g[tr_start - 6000:tr_start + 4000], 0.05))
    dec = UnitDecomposer(unit, cfg()).decompose([("pre", prefix_read)])
    assert dec.records["pre"].strand == "-"
    pre, internal, suf = dec.classify(large_threshold=5000)
    assert pre == ["pre"]


def test_get_efficiency(rng):
    """Efficiency diagnostic (reference ncrf_parser.py:147-164): the kept
    record's span over the total tandem-aligned length per read."""
    from centroflye_tpu.pipeline.simulate import gen_random_seq
    from centroflye_tpu.config import UnitDecompositionConfig
    from centroflye_tpu.stages.unit_decomposition import UnitDecomposer

    unit = gen_random_seq(rng, 120)
    reads = [("one", gen_random_seq(rng, 300) + unit * 8
              + gen_random_seq(rng, 300)),
             ("none", gen_random_seq(rng, 1500))]
    dec = UnitDecomposer(
        unit, UnitDecompositionConfig(min_record_len=500)).decompose(reads)
    eff, global_eff = dec.get_efficiency()
    assert set(eff) == set(dec.positions_all)
    assert 0.9 <= eff["one"] <= 1.0
    assert 0.9 <= global_eff <= 1.0


# --------------------------------------------------------------------------
# Decomposition robustness at REAL nanopore error rates (8-12%) with the
# real DXZ1 unit — the testable proxy for genuine-NCRF validation
# (reference ncrf_parser.py:28-59,120-145; rel2 reads are ~8-15% error).


def _dxz1():
    import os
    from centroflye_tpu.io import read_seq
    data = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "centroflye_tpu", "data")
    return read_seq(os.path.join(data, "DXZ1_rc.fasta"))


@pytest.mark.slow
@pytest.mark.parametrize("noise", [0.08, 0.12])
def test_unit_count_and_boundaries_at_ont_noise(noise):
    """Unit-aligned 8-copy windows of a simulated DXZ1 array: at 8-12%
    error the decomposer must still recover the right instance count on
    nearly every read, with boundary drift bounded by the indel noise
    (cumulative indel std at 16 kb and rate e is ~sqrt(16000*2e/3))."""
    unit = _dxz1()
    U = len(unit)
    rng = np.random.default_rng(int(noise * 1000))
    sim = simulate_tandem_repeat(rng, unit, mult=24, div_rate=0.002,
                                 flank_len=2000)
    g = sim.flanked_tr
    ts = 2000
    reads = []
    for j in range(0, 16):
        seq = g[ts + j * U:ts + (j + 8) * U]
        if j % 3 == 1:
            seq = revcomp_str(seq)
        reads.append((f"r{j:02d}", add_read_noise(rng, seq, noise)))
    dec = UnitDecomposer(
        unit, UnitDecompositionConfig(min_record_len=5000)).decompose(reads)
    assert len(dec.records) == len(reads)
    n_ok = 0
    drift_tol = 4 * np.sqrt(8 * U * 2 * noise / 3) + 0.1 * U
    for r_id, rec in dec.records.items():
        if rec.n_units == 8:
            n_ok += 1
            # expected boundaries at multiples of ~U (scaled by the
            # record's realized length — indels shrink/stretch globally)
            scale = (rec.r_en - rec.r_st) / (8 * U)
            exp = np.arange(9) * U * scale
            assert np.abs(rec.bounds - exp).max() < drift_tol, r_id
    assert n_ok >= int(0.85 * len(reads)), f"{n_ok}/{len(reads)}"


@pytest.mark.slow
@pytest.mark.parametrize("noise", [0.08, 0.12])
def test_classify_stability_at_ont_noise(noise):
    """classify() must keep prefix/internal/suffix assignments at real
    error rates (reference ncrf_parser.py:120-145)."""
    unit = _dxz1()
    U = len(unit)
    rng = np.random.default_rng(7 + int(noise * 100))
    sim = simulate_tandem_repeat(rng, unit, mult=20, div_rate=0.002,
                                 flank_len=9000)
    g = sim.flanked_tr
    ts, te = 9000, 9000 + len(sim.tr)
    reads = [
        ("pre0", g[ts - 7000:ts + 5 * U]),
        ("pre1", revcomp_str(g[ts - 6500:ts + 5 * U])),
        ("int0", g[ts + 2 * U:ts + 10 * U]),
        ("int1", revcomp_str(g[ts + 5 * U:ts + 13 * U])),
        ("suf0", g[te - 5 * U:te + 7000]),
        ("suf1", revcomp_str(g[te - 5 * U:te + 6500])),
    ]
    reads = [(r, add_read_noise(rng, s, noise)) for r, s in reads]
    dec = UnitDecomposer(
        unit, UnitDecompositionConfig(min_record_len=5000)).decompose(reads)
    assert set(dec.records) == {r for r, _ in reads}
    pre, internal, suf = dec.classify(large_threshold=5000,
                                      small_threshold=1000)
    assert sorted(pre) == ["pre0", "pre1"]
    assert sorted(internal) == ["int0", "int1"]
    assert sorted(suf) == ["suf0", "suf1"]


@pytest.mark.slow
def test_placement_agreement_decomposer_vs_pinned_report():
    """Downstream agreement at 8% noise: placements computed from the
    in-repo decomposition must equal placements computed from the same
    decomposition exported as an NCRF-like report and re-parsed through
    the NCRF-compat path (the pipeline's --ncrf parity entry). This is
    the round-trip robustness check the missing genuine-NCRF data would
    otherwise provide."""
    import os
    from centroflye_tpu.config import KmerRecruitmentConfig, PlacerConfig
    from centroflye_tpu.stages.ncrf_compat import (
        write_ncrf_like_report, parse_ncrf_report)
    from centroflye_tpu.stages.rare_kmers import get_rare_kmers
    from centroflye_tpu.stages.kmer_cloud import (
        build_read_clouds, filter_read_clouds, pad_clouds)
    from centroflye_tpu.stages.distance_graph import recruit_unique_kmers
    from centroflye_tpu.stages.read_placer import ReadPlacer

    unit = _dxz1()
    U = len(unit)
    # 6% error keeps correlated error k-mers (same deletion, same unit
    # offset, different reads) mostly out of the rare band at this small
    # array scale — at 8%+ they flood every cloud and the sweep at CPU
    # test speed takes tens of minutes (production-scale coverage
    # excludes them via the band top instead; decomposer robustness at
    # 8-12% is covered by the boundary/classify tests above)
    noise = 0.06
    rng = np.random.default_rng(23)
    sim = simulate_tandem_repeat(rng, unit, mult=20, div_rate=0.003,
                                 flank_len=7000)
    g = sim.flanked_tr
    ts, te = 7000, 7000 + len(sim.tr)
    reads = [(f"pre{j}", g[ts - 6000 - 300 * j:ts + 6 * U])
             for j in range(2)]
    # coverage ~16 (window 8 units, step half a unit): at 8% noise the
    # rare band floor bottom*cov*survival must clear ~3 or correlated
    # noise k-mers (two reads deleting the same base) flood the rare
    # set — the same reason the reference runs at coverage 32
    start, i = ts, 0
    while start + 8 * U < te:
        seq = g[start:start + 8 * U]
        if i % 3 == 1:
            seq = revcomp_str(seq)
        reads.append((f"int{i:02d}", seq))
        start += U // 2
        i += 1
    reads += [(f"suf{j}", g[te - 6 * U:te + 6000 - 300 * j])
              for j in range(2)]
    reads = [(r, add_read_noise(rng, s, noise)) for r, s in reads]

    dec = UnitDecomposer(
        unit, UnitDecompositionConfig(min_record_len=5000)).decompose(reads)
    report_fn = "/tmp/decomp_roundtrip_report.ncrf"
    write_ncrf_like_report(dec, unit, report_fn)
    dec2 = parse_ncrf_report(report_fn, min_record_len=5000)
    assert set(dec2.records) == set(dec.records)

    kcfg = KmerRecruitmentConfig(
        k=19, min_distance=1, max_distance=150, min_coverage=4,
        bottom=0.9, top=3.0, kmer_survival_rate=(1 - noise) ** 19)
    pcfg = PlacerConfig(prefix_threshold=4000)
    placements = {}
    for tag, d in (("direct", dec), ("roundtrip", dec2)):
        records = {r: d.records[r] for r in sorted(d.records)}
        seqs = [rec.seq for rec in records.values()]
        rare = get_rare_kmers(seqs, kcfg, 16)
        clouds = build_read_clouds(records, rare, kcfg.k)
        _, tensor, n_units, _ = pad_clouds(clouds, sorted(records))
        uniq, _ = recruit_unique_kmers(tensor, n_units, rare, kcfg)
        clouds_u = filter_read_clouds(
            build_read_clouds(records, uniq, kcfg.k), min_mult=2)
        placements[tag] = ReadPlacer(pcfg).run(d, clouds_u)
    assert placements["direct"] == placements["roundtrip"]
    placed = sum(1 for p in placements["direct"].values()
                 if p is not None)
    assert placed >= 0.8 * len(reads)
    os.remove(report_fn)


def test_clustered_noise_calibration():
    """The clustered ONT noise model must (a) deliver HIGHER k-mer
    survival than uniform noise at the same nominal rate (errors bunch
    up), (b) calibrate to an effective rate near half nominal, and (c)
    be deterministic given the rng."""
    from centroflye_tpu.pipeline.simulate import (
        add_read_noise_clustered, clustered_effective_error,
        gen_random_seq)
    import numpy as np
    eff = clustered_effective_error(0.10)
    assert 0.03 < eff < 0.07          # clustering spares k-mers
    rng1 = np.random.default_rng(5)
    rng2 = np.random.default_rng(5)
    clean = gen_random_seq(np.random.default_rng(1), 20000)
    a = add_read_noise_clustered(rng1, clean, 0.1)
    b = add_read_noise_clustered(rng2, clean, 0.1)
    assert a == b and a != clean
    # realized error mass is in the right ballpark of nominal
    from centroflye_tpu.ops.align_path import align_path
    d = align_path(clean, a, mode="NW").dist
    assert 0.04 * len(clean) < d < 0.13 * len(clean)
