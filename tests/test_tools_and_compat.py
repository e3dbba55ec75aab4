"""Tests: bio utility parity helpers, NCRF compat parser, unit extraction."""

import numpy as np
import pytest

from centroflye_tpu.utils.bio import (
    hamming_distance, identity_shift, overlap_alignment, parse_cigar,
)
from centroflye_tpu.pipeline.simulate import gen_random_seq, add_read_noise


def test_hamming_distance_wildcards():
    assert hamming_distance("ACGT", "ACGA") == (1, 4)
    assert hamming_distance("AC?T", "ACGT", match_char={"?"}) == (0, 4)
    assert hamming_distance("ACG", "ACGTT") == (0, 3)


def test_identity_shift_finds_overlap(rng):
    s = gen_random_seq(rng, 120)
    s1 = s
    s2 = s[40:] + gen_random_seq(rng, 40)
    res = identity_shift(s1, s2, min_overlap=30)
    assert res["shift"] == 40
    assert res["id"] > 0.9


def test_overlap_alignment_score():
    # suffix of s1 overlaps prefix of s2 exactly
    score, a1, a2, start = overlap_alignment(
        "AAACGTACGT", "ACGTACGTTTT", mismatch=1, sigma=2)
    assert score >= 8
    assert a1.count("|") == 2 and a2.count("|") == 2


def test_parse_cigar_with_strings():
    parsed, counts, a1, a2 = parse_cigar("2=1D2=", "ACGT", "ACTGT")
    assert parsed == [(2, "="), (1, "D"), (2, "=")]
    assert a1 == "AC-GT"
    assert a2 == "ACTGT"


def test_ncrf_compat_roundtrip(tmp_path, rng):
    # our decomposition -> NCRF-like report -> parse -> same coordinates
    from centroflye_tpu.config import UnitDecompositionConfig
    from centroflye_tpu.stages.unit_decomposition import UnitDecomposer
    from centroflye_tpu.stages.ncrf_compat import (
        parse_ncrf_report, write_ncrf_like_report,
    )
    unit = gen_random_seq(rng, 200)
    read = gen_random_seq(rng, 500) + unit * 30 + gen_random_seq(rng, 500)
    dec = UnitDecomposer(
        unit, UnitDecompositionConfig(min_record_len=1000)).decompose(
        [("r0", read)])
    fn = str(tmp_path / "report.ncrf")
    write_ncrf_like_report(dec, unit, fn)
    parsed = parse_ncrf_report(fn, min_record_len=1000)
    rec_in = dec.records["r0"]
    rec_out = parsed.records["r0"]
    assert rec_out.r_st == rec_in.r_st
    assert rec_out.r_en == rec_in.r_en
    assert rec_out.seq == rec_in.seq
    assert rec_out.strand == "+"


def test_ncrf_parse_real_format(tmp_path):
    # hand-built NCRF record: 3 exact motif copies with one gap column
    motif = "ACGT"
    r_al = "ACGTACGGTACGT"
    m_al = "ACGTACG-TACGT"
    with open(tmp_path / "r.ncrf", "w") as f:
        f.write("# comment line\n")
        f.write(f"read1 20 13bp 2-15 {r_al}\n")
        f.write(f"{motif}+ 13bp score=99 {m_al}\n")
    dec = parse_ncrf = __import__(
        "centroflye_tpu.stages.ncrf_compat",
        fromlist=["parse_ncrf_report"]).parse_ncrf_report(
        str(tmp_path / "r.ncrf"), min_record_len=5)
    rec = dec.records["read1"]
    assert rec.seq == r_al
    assert rec.n_units == 3
    # unit boundaries: copies at 0-4, 4-9 (extra G), 9-13
    assert rec.bounds.tolist() == [0, 4, 9, 13]


def test_unit_extraction_recovers_period(rng):
    from centroflye_tpu.stages.unit_extraction import (
        extract_units_from_read, cluster_units,
    )
    unit = gen_random_seq(rng, 180)
    read = "".join(add_read_noise(rng, unit, 0.03) for _ in range(12))
    res = extract_units_from_read(read, bin_size=50)
    assert res.period_range is not None
    lo, hi = res.period_range
    assert lo <= 180 < hi + 50
    assert res.consensus is not None
    # consensus must be a rotation-ish of the unit: check shared k-mers
    k = 15
    unit_kmers = {unit[i:i + k] for i in range(len(unit) - k + 1)}
    hits = sum(res.consensus[i:i + k] in unit_kmers
               for i in range(len(res.consensus) - k + 1))
    assert hits > 0.5 * len(unit)

    consensi = cluster_units({"r0": res.consensus, "r1": res.consensus})
    assert len(consensi) == 1
