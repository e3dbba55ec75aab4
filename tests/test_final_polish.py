"""Final assembly-level polishing (the tandemQUAST --only-polish role,
reference centroFlye.py:252-272): injected assembly errors must be
corrected by re-voting from raw read spans, including errors at the
eltr stage's unit boundaries."""

import numpy as np

from centroflye_tpu.pipeline.simulate import (
    gen_random_seq, add_read_noise)
from centroflye_tpu.stages.final_polish import (
    polish_assembly_with_reads, spans_from_placements)


def _corrupt(rng, seq, n_errors):
    s = list(seq)
    for _ in range(n_errors):
        i = int(rng.integers(0, len(s)))
        op = int(rng.integers(0, 3))
        if op == 0:
            s[i] = "ACGT"[int(rng.integers(0, 4))]
        elif op == 1:
            s.insert(i, "ACGT"[int(rng.integers(0, 4))])
        else:
            del s[i]
    return "".join(s)


def test_polish_fixes_injected_errors(rng):
    truth = gen_random_seq(rng, 6000)
    corrupted = _corrupt(rng, truth, 25)
    assert corrupted != truth
    # reads: noisy overlapping spans of the TRUTH
    spans = []
    # several head reads (real data: multiple boundary-spanning prefix
    # reads) so the first window has full-containment coverage
    for _ in range(3):
        spans.append((add_read_noise(rng, truth[:1800], 0.02),
                      0.0, 1800 / len(truth)))
    for st in range(0, 5200, 120):
        en = min(len(truth), st + 1500)
        seq = add_read_noise(rng, truth[st:en], 0.02)
        spans.append((seq, st / len(truth), en / len(truth)))
    for st in (4500, 4600, 4700, 4800):
        spans.append((add_read_noise(rng, truth[st:], 0.02),
                      st / len(truth), 1.0))
    out = polish_assembly_with_reads(corrupted, spans, n_iters=2,
                                     window=1000)
    # ~25 injected errors must collapse to (near) zero; at this modest
    # full-containment coverage a single homopolymer-deletion vote can
    # legitimately survive, so allow a tiny residual
    from centroflye_tpu.ops.align_path import align_path
    assert align_path(out[2], truth, mode="NW").dist <= 2


def test_polish_alternating_phase_fixes_boundary_errors(rng):
    truth = gen_random_seq(rng, 4096)
    # errors exactly at the first iteration's window boundaries
    s = list(truth)
    for b in (1024, 2048, 3072):
        s[b] = "ACGT"[("ACGT".index(s[b]) + 1) % 4]
        del s[b - 1]
    corrupted = "".join(s)
    spans = []
    for _ in range(3):
        spans.append((add_read_noise(rng, truth[:1500], 0.02),
                      0.0, 1500 / len(truth)))
    for st in range(0, 3700, 120):
        en = min(len(truth), st + 1200)
        spans.append((add_read_noise(rng, truth[st:en], 0.02),
                      st / len(truth), en / len(truth)))
    for st in (2950, 3050, 3150, 3250):
        spans.append((add_read_noise(rng, truth[st:], 0.02),
                      st / len(truth), 1.0))
    # window must sit well below read length (1200) so enough reads
    # fully contain each window (production: 2kb windows vs 10kb+ reads)
    out = polish_assembly_with_reads(corrupted, spans, n_iters=2,
                                     window=512)
    from centroflye_tpu.ops.align_path import align_path
    assert align_path(out[2], truth, mode="NW").dist <= 1


def test_spans_from_placements(rng):
    class Rec:
        def __init__(self, seq, n_units):
            self.seq = seq
            self.n_units = n_units

    records = {"a": Rec("AAAA", 4), "b": Rec("CCCC", 6)}
    placements = {"a": 0, "b": 4, "c": None}
    spans = spans_from_placements(placements, records)
    got = {s[0]: (s[1], s[2]) for s in spans}
    assert got["AAAA"] == (0.0, 0.4)
    assert got["CCCC"] == (0.4, 1.0)


def test_partial_overlap_reads_vote_on_covered_columns(rng):
    """Reads that only PARTIALLY cover a window must still vote on the
    columns they cover (per-column coverage gating): with reads barely
    longer than the window, almost no window is fully contained in any
    read, yet errors must still be corrected. Full-containment-only
    voting (the round-2 behavior) leaves every window at its template
    here."""
    truth = gen_random_seq(rng, 8000)
    corrupted = _corrupt(rng, truth, 20)
    assert corrupted != truth
    spans = []
    # head/tail depth: assembly-edge columns need >= min_coverage too
    for _ in range(3):
        spans.append((add_read_noise(rng, truth[:2500], 0.02),
                      0.0, 2500 / len(truth)))
    for st in range(0, 6000, 400):
        en = min(len(truth), st + 2500)
        seq = add_read_noise(rng, truth[st:en], 0.02)
        spans.append((seq, st / len(truth), en / len(truth)))
    for st in (5500, 5600, 5800, 6000):
        spans.append((add_read_noise(rng, truth[st:], 0.02),
                      st / len(truth), 1.0))
    out = polish_assembly_with_reads(corrupted, spans, n_iters=2,
                                     window=2000, min_coverage=3)
    from centroflye_tpu.ops.align_path import align_path
    before = align_path(corrupted, truth, mode="NW").dist
    after = align_path(out[2], truth, mode="NW").dist
    # the conservative clip keeps template near read-boundary columns,
    # so demand a large reduction rather than perfection
    assert after <= max(2, before // 5), (before, after)
