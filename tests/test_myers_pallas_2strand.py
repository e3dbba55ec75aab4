"""Two-strand fused Pallas kernel (myers_pallas_v3.myers_hw_pallas_v3_2strand
— the production recruitment scorer: one pass shares text loads, masks and
loop overhead between strands)."""

import numpy as np
import pytest
import jax.numpy as jnp

from centroflye_tpu.io import encode, encode_batch
from centroflye_tpu.io.encoding import revcomp, revcomp_str
from centroflye_tpu.ops.myers import build_peq, edit_distance_oracle
from centroflye_tpu.ops.myers_pallas_v3 import myers_hw_pallas_v3_2strand


@pytest.mark.slow
def test_2strand_matches_oracle():
    rng = np.random.default_rng(4)
    q = "".join("ACGT"[i] for i in rng.integers(0, 4, 90))
    texts = ["".join("ACGT"[i] for i in rng.integers(0, 4, int(n)))
             for n in rng.integers(30, 250, size=128)]
    codes, lens = encode_batch(texts, max_len=256)
    pf = jnp.asarray(build_peq(encode(q)))
    pr = jnp.asarray(build_peq(revcomp(encode(q))))
    out = myers_hw_pallas_v3_2strand(
        pf, pr, jnp.asarray(codes).T,
        jnp.asarray(lens).reshape(-1, 1), m=90)
    qr = revcomp_str(q)
    for i, t in enumerate(texts):
        odf, oef = edit_distance_oracle(q, t, "HW")
        odr, oer = edit_distance_oracle(qr, t, "HW")
        assert int(out["dist_f"][i]) == odf, i
        assert int(out["end_f"][i]) == oef, i
        assert int(out["dist_r"][i]) == odr, i
        assert int(out["end_r"][i]) == oer, i


@pytest.mark.slow
def test_2strand_with_n_bases_and_empty_rows():
    rng = np.random.default_rng(9)
    q = "".join("ACGT"[i] for i in rng.integers(0, 4, 64))
    texts = [q + "NNNN" + q, "N" * 50, "", q]
    texts += ["".join("ACGT"[i] for i in rng.integers(0, 4, 100))
              for _ in range(124)]
    codes, lens = encode_batch(texts, max_len=256)
    pf = jnp.asarray(build_peq(encode(q)))
    pr = jnp.asarray(build_peq(revcomp(encode(q))))
    out = myers_hw_pallas_v3_2strand(
        pf, pr, jnp.asarray(codes).T,
        jnp.asarray(lens).reshape(-1, 1), m=64)
    for i, t in enumerate(texts[:4]):
        odf, _ = edit_distance_oracle(q, t, "HW")
        assert int(out["dist_f"][i]) == odf, (i, t[:20])
