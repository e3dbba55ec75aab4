"""Pallas recruitment kernel (the consolidated v3 chunked-carry
generation) vs the scan kernel and the DP oracle (interpret mode on CPU;
the real-chip path is exercised by bench.py and
benchmarks/bench_myers_v3.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from centroflye_tpu.io import encode, encode_batch
from centroflye_tpu.ops.myers import (
    build_peq, myers_distance_batch, edit_distance_oracle,
)
from centroflye_tpu.ops.myers_pallas_v3 import (
    TILE_B, myers_hw_pallas_v3, myers_hw_pallas_v3_banded,
    recruit_distances_pallas,
)


def run_pallas(query, texts, L=256):
    peq = build_peq(encode(query))
    codes, lens = encode_batch(texts, max_len=L)
    B = len(texts)
    pad = (-B) % TILE_B
    if pad:
        codes = np.concatenate(
            [codes, np.full((pad, L), 4, np.int8)], axis=0)
        lens = np.concatenate([lens, np.zeros(pad, np.int32)])
    out = myers_hw_pallas_v3(
        jnp.asarray(peq), jnp.asarray(codes).T,
        jnp.asarray(lens).reshape(-1, 1), m=len(query))
    return (np.asarray(out["dist"])[:B], np.asarray(out["end"])[:B])


@pytest.mark.parametrize("m", [23, 64, 100])
def test_pallas_matches_oracle(m, rng, make_dna):
    q = make_dna(m)
    texts = [make_dna(int(rng.integers(10, 250))) for _ in range(8)]
    dist, end = run_pallas(q, texts)
    for i, t in enumerate(texts):
        od, oend = edit_distance_oracle(q, t, mode="HW")
        assert dist[i] == od, (m, i)
        assert end[i] == oend, (m, i)


@pytest.mark.slow
@pytest.mark.parametrize("m", [150, 203])
def test_pallas_matches_scan_kernel(rng, make_dna, m):
    q = make_dna(m)
    texts = [make_dna(int(rng.integers(100, 500))) for _ in range(16)]
    dist, end = run_pallas(q, texts, L=512)
    peq = build_peq(encode(q))
    codes, lens = encode_batch(texts, max_len=512)
    ref = myers_distance_batch(peq, codes, lens, m=len(q), mode="HW")
    assert np.array_equal(dist, np.asarray(ref["dist"]))
    assert np.array_equal(end, np.asarray(ref["end"]))


@pytest.mark.slow
def test_pallas_recruit_distances(make_dna, rng):
    from centroflye_tpu.io.encoding import revcomp, encode as enc
    from centroflye_tpu.pipeline.simulate import add_read_noise
    from centroflye_tpu.io.encoding import revcomp_str
    unit = make_dna(120)
    fwd_read = add_read_noise(rng, unit * 3, 0.05)
    rc_read = revcomp_str(fwd_read)
    bg = make_dna(400)
    codes, lens = encode_batch(
        [fwd_read, rc_read, bg] + [bg] * 5, max_len=512)
    peq_f = build_peq(enc(unit))
    peq_r = build_peq(revcomp(enc(unit)))
    df, dr = recruit_distances_pallas(peq_f, peq_r, codes, lens, m=120)
    df, dr = np.asarray(df), np.asarray(dr)
    assert df[0] < 30 and dr[1] < 30
    assert min(df[2], dr[2]) > 30
    assert df[0] == dr[1]  # strand symmetry


@pytest.mark.slow
@pytest.mark.parametrize("m,L,k", [(507, 1024, 90), (2055, 2048, 350)])
def test_pallas_v3_banded_matches_unbanded(rng, make_dna, m, L, k):
    """Threshold-k banded kernel: exact where dist <= k, sentinel (m, -1)
    elsewhere — the bounded-edlib contract of the reference recruiter
    (rr.cpp:74-79). Mix of in-band (noisy embedded unit) and out-of-band
    (random) lanes so both the tight and blown-up band regimes run."""
    q = make_dna(m)
    texts = []
    for b in range(24):
        if b % 3 == 0:
            t = list(q)
            for _ in range(int(rng.integers(0, k))):
                p = int(rng.integers(0, len(t)))
                t[p] = "ACGT"[int(rng.integers(0, 4))]
            texts.append(("".join(t) + make_dna(L))[:L])
        else:
            texts.append(make_dna(L))
    codes, lens = encode_batch(texts, max_len=L)
    pad = (-len(texts)) % TILE_B
    codes = np.concatenate([codes, np.full((pad, L), 4, np.int8)])
    lens = np.concatenate([lens, np.zeros(pad, np.int32)])
    ct = jnp.asarray(codes).T
    l2 = jnp.asarray(lens).reshape(-1, 1)
    ref = myers_hw_pallas_v3(jnp.asarray(build_peq(encode(q))), ct, l2, m=m)
    out = myers_hw_pallas_v3_banded(
        jnp.asarray(build_peq(encode(q))), ct, l2, m=m, k=k)
    rd = np.asarray(ref["dist"])
    bd = np.asarray(out["dist"])
    in_band = rd <= k
    assert np.array_equal(bd[in_band], rd[in_band])
    assert np.all(bd[~in_band] == m)
    re_ = np.asarray(ref["end"])
    be = np.asarray(out["end"])
    assert np.array_equal(be[in_band], re_[in_band])
    assert np.all(be[~in_band] == -1)
