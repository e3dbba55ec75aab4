"""Sequence-parallel Myers (columns sharded over the mesh, carry handed
between devices with ppermute) must be bit-identical to the single-device
scan kernel. Runs on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from centroflye_tpu.io import encode, encode_batch
from centroflye_tpu.ops.myers import build_peq, myers_distance_batch
from centroflye_tpu.parallel.seq_parallel import (
    make_seq_mesh, myers_distance_seqparallel)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
    return make_seq_mesh()


@pytest.mark.parametrize("mode", ["HW", "SHW", "NW"])
def test_seqparallel_matches_single_device(mesh, rng, make_dna, mode):
    unit = make_dna(93)
    peq = build_peq(encode(unit))
    texts = [make_dna(int(rng.integers(40, 700))) for _ in range(16)]
    codes, lens = encode_batch(texts, max_len=704)

    ref = myers_distance_batch(peq, codes, lens, m=len(unit), mode=mode)
    out = myers_distance_seqparallel(
        peq, codes, lens, m=len(unit), mesh=mesh, mode=mode)
    assert np.array_equal(out["dist"], np.asarray(ref["dist"]))
    assert np.array_equal(out["end"], np.asarray(ref["end"]))


def test_seqparallel_real_unit_tandem_reads(mesh, rng, make_mutant):
    """Tandem-repeat reads vs the real DXZ1 unit: the production HW-mode
    recruitment decision must be unchanged when a read's columns span all
    8 devices."""
    import os
    from centroflye_tpu.io import read_seq

    data = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "centroflye_tpu", "data")
    unit = read_seq(os.path.join(data, "DXZ1_rc.fasta"))
    peq = build_peq(encode(unit))

    reads = []
    for i in range(4):
        tandem = make_mutant(unit * 3, n_sub=60, n_ins=20, n_del=20)
        reads.append(tandem)
    reads.append("ACGT" * 1500)                      # non-centromeric
    codes, lens = encode_batch(reads, max_len=6400)

    ref = myers_distance_batch(peq, codes, lens, m=len(unit), mode="HW")
    out = myers_distance_seqparallel(
        peq, codes, lens, m=len(unit), mesh=mesh, mode="HW", n_micro=5)
    assert np.array_equal(out["dist"], np.asarray(ref["dist"]))
    assert np.array_equal(out["end"], np.asarray(ref["end"]))


def test_seqparallel_pads_ragged_shapes(mesh, make_dna):
    """B and L that divide neither the device count nor the microbatch
    count exercise the padding path."""
    unit = make_dna(40)
    peq = build_peq(encode(unit))
    texts = [make_dna(n) for n in (13, 100, 257)]
    codes, lens = encode_batch(texts, max_len=257)

    ref = myers_distance_batch(peq, codes, lens, m=len(unit), mode="HW")
    out = myers_distance_seqparallel(
        peq, codes, lens, m=len(unit), mesh=mesh, mode="HW", n_micro=2)
    assert np.array_equal(out["dist"], np.asarray(ref["dist"]))
    assert np.array_equal(out["end"], np.asarray(ref["end"]))


def test_recruitment_engine_seqpar_tier_identity(rng, make_dna,
                                                 make_mutant):
    """PRODUCTION wiring: RecruitmentEngine routes reads >=
    config.seq_parallel_min_len through the sequence-parallel tier when a
    mesh is present; decisions and distances must be identical to the
    meshless host-segmented engine (device-count identity through the
    engine entry)."""
    from centroflye_tpu.config import RecruitmentConfig
    from centroflye_tpu.io.encoding import revcomp_str
    from centroflye_tpu.parallel.mesh import make_mesh
    from centroflye_tpu.stages.recruitment import RecruitmentEngine

    unit = make_dna(150)
    long_tandem = make_mutant(unit * 40, n_sub=120, n_ins=40, n_del=40)
    reads = [
        ("long_cen", long_tandem),                       # seq-par tier
        ("long_cen_rc", revcomp_str(long_tandem)),       # seq-par tier
        ("long_bg", make_dna(6200)),                     # seq-par tier
        ("short_cen", make_mutant(unit * 4, n_sub=12, n_ins=4, n_del=4)),
        ("short_bg", make_dna(900)),
        ("long_n", long_tandem[:3000] + "N" * 50 + long_tandem[3000:]),
    ]
    cfg = RecruitmentConfig(threshold=40, batch_size=16,
                            prefilter=False, seq_parallel_min_len=4096)
    results = {}
    for tag, mesh in (("mesh", make_mesh(8)), ("single", None)):
        eng = RecruitmentEngine(unit, cfg, seg_len=2048, mesh=mesh)
        results[tag] = [(r.r_id, r.dist_fwd, r.dist_rc, r.recruited)
                        for r in eng.run(reads)]
    assert results["mesh"] == results["single"]
    # the tier must actually engage: the engine with a mesh has a
    # nonzero seq-parallel threshold and the long reads exceed it
    eng = RecruitmentEngine(unit, cfg, seg_len=2048, mesh=make_mesh(8))
    assert eng.seqpar_min == 4096
    got = {r.r_id: r.recruited for r in eng.run(reads)}
    assert got["long_cen"] and got["long_cen_rc"] and got["short_cen"]
    assert not got["long_bg"] and not got["short_bg"]
