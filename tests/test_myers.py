import numpy as np
import pytest

from centroflye_tpu.io import encode, encode_batch
from centroflye_tpu.ops.myers import (
    build_peq, myers_distance_batch, edit_distance_oracle, n_words,
)


def run_single(query, text, mode="HW", collect="best"):
    peq = build_peq(encode(query))
    # pad target length to a multiple of 128 to bucket JIT shapes
    L = max(128, -(-len(text) // 128) * 128)
    codes, lens = encode_batch([text], max_len=L)
    out = myers_distance_batch(
        peq, codes, lens, m=len(query), mode=mode, collect=collect)
    if collect == "all":
        return np.asarray(out["scores"][0])[: len(text)]
    return int(out["dist"][0]), int(out["end"][0])


def test_exact_match_hw():
    d, end = run_single("ACGT", "TTTACGTTTT")
    assert d == 0
    assert end == 6  # last char of the first exact occurrence


def test_exact_match_nw():
    d, _ = run_single("ACGT", "ACGT", mode="NW")
    assert d == 0
    d, _ = run_single("ACGT", "ACGG", mode="NW")
    assert d == 1


def test_shw_prefix():
    # query matches prefix with 0 errors; suffix of target is free
    d, end = run_single("ACGT", "ACGTTTTTTT", mode="SHW")
    assert d == 0 and end == 3
    # anchored start: match not at start costs leading gaps
    d, _ = run_single("ACGT", "GGACGT", mode="SHW")
    assert d == 2


@pytest.mark.parametrize("mode", ["HW", "SHW", "NW"])
def test_against_oracle_random(mode, rng, make_dna):
    # fixed m values bucket JIT shapes; n varies freely (padded inside)
    for trial, m in enumerate([13, 32, 57, 57, 13, 32, 57, 13]):
        n = int(rng.integers(1, 120))
        q, t = make_dna(m), make_dna(n)
        d, end = run_single(q, t, mode=mode)
        od, oend = edit_distance_oracle(q, t, mode=mode)
        assert d == od, (trial, q, t)
        if mode != "NW":
            assert end == oend, (trial, q, t)


def test_multiword_query(rng, make_dna):
    # queries spanning several 32-bit words, incl. exact word boundaries
    for m in [31, 32, 33, 63, 64, 65, 130]:
        q = make_dna(m)
        t = make_dna(200)
        d, end = run_single(q, t, mode="HW")
        od, oend = edit_distance_oracle(q, t, mode="HW")
        assert d == od and end == oend, m
        assert n_words(m) == (m + 31) // 32


def test_mutated_unit_distance(make_dna, make_mutant):
    unit = make_dna(200)
    noisy = make_mutant(unit, n_sub=5, n_ins=3, n_del=2)
    text = make_dna(100) + noisy + make_dna(100)
    d, _ = run_single(unit, text, mode="HW")
    assert 0 < d <= 10


def test_batch_mixed_lengths(make_dna):
    q = make_dna(40)
    texts = [make_dna(10), make_dna(77), q, make_dna(3)]
    peq = build_peq(encode(q))
    codes, lens = encode_batch(texts)
    out = myers_distance_batch(peq, codes, lens, m=len(q), mode="HW")
    for i, t in enumerate(texts):
        od, oend = edit_distance_oracle(q, t, mode="HW")
        assert int(out["dist"][i]) == od
        assert int(out["end"][i]) == oend


def test_collect_all_scores(make_dna):
    q = make_dna(20)
    t = make_dna(50)
    scores = run_single(q, t, collect="all")
    # column scores must each match the oracle bottom row
    from centroflye_tpu.io.encoding import encode as enc
    qc, tc = enc(q), enc(t)
    m = len(qc)
    prev = np.arange(m + 1)
    for j in range(len(t)):
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = 0
        for i in range(1, m + 1):
            sub = prev[i - 1] + (0 if qc[i - 1] == tc[j] else 1)
            cur[i] = min(sub, prev[i] + 1, cur[i - 1] + 1)
        assert scores[j] == cur[m]
        prev = cur


def test_per_row_queries_mixed_lengths(make_dna):
    # different queries AND different query lengths in one batch (the
    # monomer-decomposition use case: 18 monomers of ~171bp each)
    qs = [make_dna(30), make_dna(45), make_dna(44)]
    ts = [make_dna(80), make_dna(80), make_dna(80)]
    m = 45
    peqs = np.stack([build_peq(encode(q), m=m) for q in qs])
    ms = np.array([len(q) for q in qs], dtype=np.int32)
    codes, lens = encode_batch(ts)
    out = myers_distance_batch(peqs, codes, lens, m=m, mode="HW", ms=ms)
    for i, (q, t) in enumerate(zip(qs, ts)):
        od, oend = edit_distance_oracle(q, t, mode="HW")
        assert int(out["dist"][i]) == od and int(out["end"][i]) == oend


def test_n_in_text_mismatches_everything():
    d, _ = run_single("AAAA", "NNNNAAAANNN")
    assert d == 0
    d, _ = run_single("AAAA", "NNNN")
    assert d == 4
