import numpy as np
import pytest

from centroflye_tpu.config import RecruitmentConfig
from centroflye_tpu.pipeline.simulate import (
    simulate_tandem_repeat, simulate_reads, add_read_noise, gen_random_seq,
)
from centroflye_tpu.stages.recruitment import (
    RecruitmentEngine, segment_starts,
)


def test_segment_starts_cover_with_overlap():
    seg, ov = 1000, 300
    for rlen in [1, 999, 1000, 1001, 1700, 1701, 5000]:
        starts = segment_starts(rlen, seg, ov)
        assert starts[0] == 0
        # each consecutive pair overlaps by >= ov (or covers the end)
        for a, b in zip(starts, starts[1:]):
            assert b - a == seg - ov
        # full coverage
        assert starts[-1] + seg >= rlen


def test_recruitment_discriminates(rng):
    unit = gen_random_seq(rng, 300)
    sim = simulate_tandem_repeat(rng, unit, mult=20, div_rate=0.02,
                                 flank_len=2000)
    reads = simulate_reads(rng, sim.flanked_tr, n_reads=12,
                           read_len_mean=3000, read_len_std=500,
                           error_rate=0.08)
    # background reads: random sequence, must not be recruited
    bg = [("bg_%d" % i, gen_random_seq(rng, 3000)) for i in range(6)]

    threshold = int(len(unit) * 0.25)
    eng = RecruitmentEngine(
        unit, RecruitmentConfig(threshold=threshold, batch_size=8),
        seg_len=4096)
    inputs = [(r.r_id, r.seq) for r in reads] + bg
    results = {res.r_id: res for res in eng.run(inputs)}
    assert len(results) == len(inputs)

    for r in reads:
        # reads fully inside the repeat must be recruited (they contain
        # whole unit copies); flank-only reads must not
        contains_unit = (
            min(r.end, sim.flank_len + len(sim.tr)) - max(r.start,
                                                          sim.flank_len)
            >= 2 * len(unit))
        in_flank_only = r.end <= sim.flank_len or \
            r.start >= sim.flank_len + len(sim.tr)
        if contains_unit:
            assert results[r.r_id].recruited, r.r_id
        if in_flank_only:
            assert not results[r.r_id].recruited, r.r_id
    for r_id, _ in bg:
        assert not results[r_id].recruited


def test_recruitment_rc_strand(rng):
    from centroflye_tpu.io.encoding import revcomp_str
    unit = gen_random_seq(rng, 250)
    tr = unit * 5
    read_fwd = add_read_noise(rng, tr, 0.05)
    read_rc = revcomp_str(read_fwd)
    eng = RecruitmentEngine(
        unit, RecruitmentConfig(threshold=60, batch_size=4), seg_len=2048)
    res = {r.r_id: r for r in eng.run([("f", read_fwd), ("r", read_rc)])}
    assert res["f"].recruited and res["r"].recruited
    assert res["f"].dist_fwd <= 60
    assert res["r"].dist_rc <= 60


def test_recruitment_segmented_long_read(rng):
    # alignment sits near a segment boundary; overlap must catch it
    unit = gen_random_seq(rng, 200)
    eng = RecruitmentEngine(
        unit, RecruitmentConfig(threshold=50, batch_size=4), seg_len=1024)
    stride = eng.seg_len - eng.overlap
    # place the unit right at the first boundary
    read = (gen_random_seq(rng, stride - 100) + unit
            + gen_random_seq(rng, 2000))
    res = list(eng.run([("x", read)]))[0]
    assert res.recruited
    assert res.dist_fwd == 0


def test_recruit_file_cli(tmp_path, rng):
    from centroflye_tpu.io import write_seqs, read_seqs
    from centroflye_tpu.stages.recruitment import recruit_file
    unit = gen_random_seq(rng, 150)
    good = add_read_noise(rng, unit * 4, 0.05)
    bad = gen_random_seq(rng, 700)
    unit_fn = str(tmp_path / "unit.fasta")
    reads_fn = str(tmp_path / "reads.fasta")
    out_fn = str(tmp_path / "out.fasta")
    write_seqs(unit_fn, {"unit": unit})
    write_seqs(reads_fn, {"good": good, "bad": bad})
    n = recruit_file(unit_fn, reads_fn, out_fn, threshold=40,
                     batch_size=4, seg_len=1024)
    assert n == 1
    assert set(read_seqs(out_fn)) == {"good"}
