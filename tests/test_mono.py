"""Tests for the monomer (cen6 / centroFlyeMono) layer: monostrings, SD
parsing, error correction, de Bruijn graph + contigs, read mapping."""

from collections import Counter

import numpy as np
import pytest

from centroflye_tpu.mono.monostring import MonoString, GAP
from centroflye_tpu.mono.sd_parser import SDReport, get_stats
from centroflye_tpu.mono.error_correction import (
    filter_lowercaserich_reads, trim_read, cut_gaprich_reads,
    hamming_with_wildcard, correct_gaps, error_correction,
    min_cyclic_shift_arr,
)
from centroflye_tpu.mono.debruijn import (
    MonoDeBruijnGraph, get_all_kmers, get_frequent_kmers,
    rolling_kmer_hashes,
)


def ms_from(letters, n=6, name="r"):
    return MonoString.from_letters(name, letters, n_monomers=n)


def arr(letters, n=6):
    return ms_from(letters, n).syms


# ----------------------------- monostring ---------------------------------

def test_letters_roundtrip():
    s = "ABCab?F"
    m = ms_from(s)
    assert m.to_letters() == s
    assert m.is_gap().tolist() == [False] * 5 + [True, False]
    assert m.is_reverse().tolist() == [False, False, False, True, True,
                                       False, False]


def test_swapcase():
    m = ms_from("Aa?B")
    out = MonoString(name="x", syms=m.swapcase(), nucl=m.nucl,
                     n_monomers=6).to_letters()
    assert out == "aA?b"


def test_check_reverse_flips():
    # mostly lowercase -> flip: reverse order + swapcase
    m = ms_from("abcD")
    flipped = m.check_reverse()
    assert flipped.strand == "-"
    assert flipped.to_letters() == "dCBA"


def test_strip_and_split():
    m = ms_from("??AB?CDE??")
    s = m.strip()
    assert s.to_letters() == "AB?CDE"
    parts = s.split_on_gaps(min_length=3)
    assert [p.to_letters() for p in parts.values()] == ["CDE"]


def test_from_sd_records_gaps_and_reverse():
    # rows: big nucleotide gap inserts round(gap/mean_len) gap symbols;
    # unreliable rows become gaps
    m = MonoString.from_sd_records(
        name="r", monomers=np.array([0, 1, 2]),
        starts=np.array([0, 600, 800]), ends=np.array([170, 770, 970]),
        reliability=["+", "+", "+"], max_gap=100, mean_monomer_len=170.0,
        n_monomers=6)
    # gap of 430 nucleotides -> round(430/170) = 3 gap symbols
    assert m.to_letters() == "A???BC"
    assert m.nucl[0].tolist() == [0, 170]
    assert m.nucl[4].tolist() == [600, 770]


def test_sd_report_tsv(tmp_path):
    from centroflye_tpu.io import write_seqs
    monomers_fn = str(tmp_path / "monomers.fasta")
    write_seqs(monomers_fn, {"m0": "A" * 170, "m1": "C" * 170,
                             "m2": "G" * 170})
    tsv = tmp_path / "sd.tsv"
    rows = [
        ("read1", "m0", 0, 170, 100.0, "+"),
        ("read1", "m1", 171, 341, 99.0, "+"),
        ("read1", "m2'", 342, 512, 98.0, "+"),
        ("read2", "m1'", 0, 170, 97.0, "+"),
        ("read2", "m0'", 171, 341, 96.0, "+"),
    ]
    with open(tsv, "w") as f:
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")
    rep = SDReport.from_file(str(tsv), monomers_fn)
    assert rep.monostrings["read1"].to_letters() == "ABc"
    # read2 mostly reverse -> flipped to "AB" forward
    assert rep.monostrings["read2"].strand == "-"
    assert rep.monostrings["read2"].to_letters() == "AB"
    stats = get_stats(rep.monostrings)
    assert stats["ntranslations"] == 2


# --------------------------- error correction -----------------------------

def test_filter_lowercase():
    reads = {"good": ms_from("ABCDEF"), "bad": ms_from("abcDEF")}
    out = filter_lowercaserich_reads(reads, max_lowercase=0.1)
    assert set(out) == {"good"}


def test_trim_read_gap_ends():
    m = ms_from("?" * 20 + "ABCDEF" * 20 + "?" * 20)
    t = trim_read(m, max_gap=0.2, ma_window=10)
    letters = t.to_letters()
    assert letters.startswith("ABCDEF")
    assert "?" not in letters[:10] and "?" not in letters[-10:]


def test_cut_gaprich():
    good = ms_from("ABCDEF" * 30)
    gappy = ms_from("ABCDE" + "?" * 30 + "ABCDEF" * 25, name="x")
    out, cut_cnt, parts = cut_gaprich_reads(
        {"g": good, "x": gappy}, max_gap=0.05, min_length=10)
    assert ("g", 0) in out
    assert cut_cnt == 1
    assert any(k[0] == "x" for k in out if isinstance(k, tuple))


def test_hamming_wildcard():
    a = arr("AB?D")
    b = arr("ABCD")
    assert hamming_with_wildcard(a, b) == 0
    assert hamming_with_wildcard(arr("ABED"), b) == 1


def test_min_cyclic_shift_arr():
    a = np.array([2, 0, 1], np.int16)
    assert min_cyclic_shift_arr(a).tolist() == [0, 1, 2]


def test_correct_gaps_fills_hor():
    hor = "ABCDEF"
    reads = {f"r{i}": ms_from(hor * 10) for i in range(4)}
    gappy = ms_from(hor * 3 + "AB?DEF" + hor * 3)
    reads["g"] = gappy
    out = correct_gaps(reads, k=3, min_mult=20)
    assert "?" not in out["g"].to_letters()
    assert out["g"].to_letters() == hor * 7


# ------------------------------ de Bruijn ---------------------------------

def test_rolling_hashes_detect_equal_kmers():
    s = arr("ABCABCABC")
    H, valid = rolling_kmer_hashes(s, 3)
    assert valid.all()
    assert H[0] == H[3] == H[6]
    assert H[0] != H[1]


def test_rolling_hashes_gap_invalid():
    s = arr("AB?C")
    H, valid = rolling_kmer_hashes(s, 2)
    assert valid.tolist() == [True, False, False]


def test_get_all_kmers_counter():
    strings = {"a": arr("ABCAB"), "b": arr("BCA")}
    counts, locs = get_all_kmers(strings, 2)
    def key(l): return arr(l).tobytes()
    assert counts[key("AB")] == 2
    assert counts[key("BC")] == 2
    assert counts[key("CA")] == 2
    assert set(locs[key("AB")]) == {("a", 0), ("a", 3)}


def test_get_frequent_kmers_exact():
    strings = {"a": arr("ABCABCABC"), "b": arr("ABCX")}
    freq, pos = get_frequent_kmers(strings, k=3, min_mult=3)
    def key(l): return arr(l).tobytes()
    assert freq[key("ABC")] == 4
    assert key("BCA") not in freq or freq[key("BCA")] >= 3


def test_graph_contig_reconstructs_cycle():
    # tandem ABCDEF...: k=3 graph collapses to a single cycle
    hor = "ABCDEF"
    strings = {"r": arr(hor * 20)}
    freq, _ = get_frequent_kmers(strings, k=3, min_mult=5)
    db = MonoDeBruijnGraph(k=3)
    db.add_kmers(freq, coverage=freq)
    contigs, paths = db.get_contigs()
    assert len(contigs) == 1
    got = min_cyclic_shift_arr(contigs[0]).tolist()
    assert got == min_cyclic_shift_arr(arr(hor)).tolist()


def test_graph_map_reads_path():
    # a linear unique string maps back with a valid path
    s = "ABCDEFBDACEF"[:10]
    strings = {"g": arr(s * 1)}
    counts, _ = get_all_kmers(strings, 4)
    db = MonoDeBruijnGraph(k=4)
    db.add_kmers(counts, coverage=counts)
    db.collapse_nonbranching_paths()
    reads = {"q": ms_from(s)}
    mapping = db.map_reads(reads)
    assert mapping["q"] is not None
    _, _, valid, path = mapping["q"]
    assert valid
    # reconstructed path spells the original string
    assert db.get_path(path).tolist() == arr(s).tolist()
