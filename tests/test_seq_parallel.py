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
