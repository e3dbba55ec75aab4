import numpy as np
import pytest

from centroflye_tpu.ops.align_path import align_path, hw_locate
from centroflye_tpu.pipeline.simulate import gen_random_seq, add_read_noise
from centroflye_tpu.stages.consensus import polish_consensus, polish_round
from centroflye_tpu.stages.consensus_unit import (
    reconstruct_unit, count_kmers_total,
)
from centroflye_tpu.config import ConsensusUnitConfig


def test_align_path_identity(make_dna):
    s = make_dna(100)
    al = align_path(s, s, mode="NW")
    assert al.dist == 0
    assert al.a1 == al.a2 == s
    assert al.cigar == "100="


def test_align_path_known_edits():
    al = align_path("ACGTACGT", "ACGAACGT", mode="NW")
    assert al.dist == 1
    al = align_path("ACGT", "ACGGT", mode="NW")   # one deletion in query
    assert al.dist == 1
    assert len(al.a1) == len(al.a2) == 5


def test_align_path_hw_locates_infix(make_dna):
    unit = make_dna(60)
    target = make_dna(100) + unit + make_dna(100)
    al = align_path(unit, target, mode="HW")
    assert al.dist == 0
    assert al.t_start == 100 and al.t_end == 160
    d, st, en = hw_locate(unit, target)
    assert (d, st, en) == (0, 100, 160)


def test_align_path_matches_myers_distance(rng, make_dna):
    from centroflye_tpu.ops.myers import edit_distance_oracle
    for _ in range(5):
        q, t = make_dna(40), make_dna(70)
        for mode in ("NW", "HW"):
            al = align_path(q, t, mode=mode)
            want, _ = edit_distance_oracle(q, t, mode=mode)
            assert al.dist == want
            # aligned strings must reproduce the distance
            d = sum(1 for a, b in zip(al.a1, al.a2)
                    if a == "-" or b == "-" or a != b)
            assert d == al.dist if mode == "NW" else d >= al.dist


def test_polish_recovers_truth(rng):
    truth = gen_random_seq(rng, 300)
    reads = [add_read_noise(rng, truth, 0.08) for _ in range(20)]
    template = reads[0]
    polished = polish_consensus(template, reads, n_iters=3)
    final = polished[3]
    al = align_path(final, truth, mode="NW")
    assert al.dist <= 2, al.dist


def test_polish_deterministic(rng):
    truth = gen_random_seq(rng, 200)
    reads = [add_read_noise(rng, truth, 0.1) for _ in range(15)]
    a = polish_consensus(reads[0], reads, n_iters=2)
    b = polish_consensus(reads[0], reads, n_iters=2)
    assert a == b


def test_count_kmers_total(make_dna):
    from collections import Counter
    seqs = [make_dna(120), make_dna(80)]
    codes, counts = count_kmers_total(seqs, 9, batch_rows=1)
    from centroflye_tpu.io import kmer_strings
    got = dict(zip(kmer_strings(codes, 9), counts.tolist()))
    want = Counter()
    for s in seqs:
        want.update(s[i:i + 9] for i in range(len(s) - 9 + 1))
    assert got == dict(want)


def test_reconstruct_unit_from_tandem_reads(rng):
    unit = gen_random_seq(rng, 120)
    # reads: noisy tandem stretches; unit* must equal the true unit
    seqs = ["".join(add_read_noise(rng, unit, 0.03) for _ in range(10))
            for _ in range(12)]
    unit_star = reconstruct_unit(
        seqs, unit, ConsensusUnitConfig(k=21, top_factor=3))
    assert len(unit_star) > 0
    al = align_path(unit_star, unit, mode="NW")
    assert al.dist <= 2, (al.dist, len(unit_star))


def test_reconstruct_unit_rotation(rng):
    # reads built from a rotated unit; reconstruction must come back in the
    # input unit's phase
    unit = gen_random_seq(rng, 100)
    rot = unit[37:] + unit[:37]
    seqs = [rot * 8 for _ in range(6)]
    unit_star = reconstruct_unit(seqs, unit,
                                 ConsensusUnitConfig(k=21, top_factor=3))
    assert unit_star == unit or align_path(unit_star, unit,
                                           mode="NW").dist <= 1


def test_polish_round_vectorized_matches_char_walk(rng):
    """The run-length numpy voting fast path must be bit-identical to the
    per-aligned-char walk (including insertion-gap and deletion ties)."""
    from centroflye_tpu.stages.consensus import _polish_round_aligned

    for trial in range(8):
        truth = gen_random_seq(rng, 150 + 40 * trial)
        template = add_read_noise(rng, truth, 0.04)
        cov = int(rng.integers(1, 14))
        reads = [add_read_noise(rng, truth, 0.08) for _ in range(cov)]
        assert polish_round(template, reads) == \
            _polish_round_aligned(template, reads)


def test_polish_round_empty_and_n_bases(rng):
    from centroflye_tpu.stages.consensus import _polish_round_aligned

    assert polish_round("ACGT", []) == "ACGT"
    assert polish_round("", ["ACGT"]) == ""
    # non-ACGT template/read chars route through the exact Counter path
    truth = gen_random_seq(rng, 120)
    template = truth[:50] + "N" + truth[51:]
    reads = [add_read_noise(rng, truth, 0.05) for _ in range(5)]
    reads[0] = reads[0][:30] + "N" + reads[0][31:]
    assert polish_round(template, reads) == \
        _polish_round_aligned(template, reads)
