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
