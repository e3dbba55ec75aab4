"""Native library (libcfnative.so) parity tests: the C++ Myers engine must
agree with the Python DP oracle and the JAX kernel; the native reader must
agree with the Python FASTA/FASTQ parser. Skipped when the lib isn't built
(CI builds it via `make -C centroflye_tpu/native`)."""

import gzip
import os
import subprocess

import numpy as np
import pytest

from centroflye_tpu.io import encode, write_seqs
from centroflye_tpu.ops.myers import edit_distance_oracle
from centroflye_tpu.native import (
    load_native, native_available, native_edit_distance,
    native_edit_distance_batch, native_align_path, native_iter_seqs,
)

pytestmark = pytest.mark.skipif(
    load_native(build=True) is None, reason="native lib not built")


@pytest.mark.parametrize("mode", ["HW", "SHW", "NW"])
def test_native_distance_vs_oracle(mode, rng, make_dna):
    for _ in range(10):
        m = int(rng.integers(1, 150))
        n = int(rng.integers(1, 300))
        q, t = make_dna(m), make_dna(n)
        d, end = native_edit_distance(encode(q), encode(t), mode=mode)
        od, oend = edit_distance_oracle(q, t, mode=mode)
        assert d == od, (q, t)
        if mode != "NW":
            assert end == oend


def test_native_banded_early_out(make_dna):
    q = make_dna(100)
    t = make_dna(100)
    d_full, _ = native_edit_distance(encode(q), encode(t), mode="NW")
    d_band, _ = native_edit_distance(encode(q), encode(t), mode="NW",
                                     k=d_full)
    assert d_band == d_full
    d_cut, _ = native_edit_distance(encode(q), encode(t), mode="NW",
                                    k=d_full - 1)
    assert d_cut == -1


def test_native_batch(make_dna):
    q = make_dna(64)
    texts = [make_dna(n) for n in (30, 100, 64, 7)]
    L = max(len(t) for t in texts)
    mat = np.full((4, L), 4, dtype=np.int8)
    lens = np.zeros(4, np.int32)
    for i, t in enumerate(texts):
        mat[i, :len(t)] = encode(t)
        lens[i] = len(t)
    dists, ends = native_edit_distance_batch(encode(q), mat, lens, "HW")
    for i, t in enumerate(texts):
        od, oend = edit_distance_oracle(q, t, mode="HW")
        assert dists[i] == od and ends[i] == oend


def test_native_align_path_roundtrip(rng, make_dna):
    from centroflye_tpu.pipeline.simulate import add_read_noise
    for _ in range(5):
        t = make_dna(200)
        q = add_read_noise(rng, t, 0.1)
        d, cigar, t_st, t_en = native_align_path(encode(q), encode(t), "NW")
        od, _ = edit_distance_oracle(q, t, mode="NW")
        assert d == od
        assert t_st == 0 and t_en == 200
        # replay cigar: counts must cover both strings and distance
        qi = ti = dist = 0
        num = ""
        for ch in cigar:
            if ch.isdigit():
                num += ch
                continue
            n = int(num)
            num = ""
            if ch == "=":
                assert q[qi:qi + n] == t[ti:ti + n]
                qi += n
                ti += n
            elif ch == "X":
                dist += n
                qi += n
                ti += n
            elif ch == "I":
                dist += n
                qi += n
            elif ch == "D":
                dist += n
                ti += n
        assert qi == len(q) and ti == len(t)
        assert dist == d


def test_native_align_path_hw(make_dna):
    unit = make_dna(80)
    t = make_dna(50) + unit + make_dna(60)
    d, cigar, t_st, t_en = native_align_path(encode(unit), encode(t), "HW")
    assert d == 0
    assert (t_st, t_en) == (50, 130)
    assert cigar == "80="


def test_native_reader_fasta(tmp_path, make_dna):
    seqs = {"r1": make_dna(100), "r2": make_dna(333), "r3": "ACGTN"}
    fn = str(tmp_path / "x.fasta")
    write_seqs(fn, seqs)
    got = {r_id: codes for r_id, codes in native_iter_seqs(fn)}
    assert set(got) == set(seqs)
    for r_id, s in seqs.items():
        assert np.array_equal(got[r_id], encode(s))


def test_native_reader_fastq_gz(tmp_path, make_dna):
    s1, s2 = make_dna(80), make_dna(40)
    fn = str(tmp_path / "y.fastq.gz")
    with gzip.open(fn, "wt") as f:
        f.write(f"@a some desc\n{s1}\n+\n{'I' * len(s1)}\n")
        f.write(f"@b\n{s2}\n+\n{'I' * len(s2)}\n")
    got = dict(native_iter_seqs(fn))
    assert np.array_equal(got["a"], encode(s1))
    assert np.array_equal(got["b"], encode(s2))


def test_native_matches_jax_kernel(rng, make_dna):
    from centroflye_tpu.io import encode_batch
    from centroflye_tpu.ops.myers import build_peq, myers_distance_batch
    q = make_dna(137)
    texts = [make_dna(int(rng.integers(50, 400))) for _ in range(6)]
    codes, lens = encode_batch(texts, max_len=512)
    peq = build_peq(encode(q))
    out = myers_distance_batch(peq, codes, lens, m=len(q), mode="HW")
    dists, ends = native_edit_distance_batch(encode(q), np.asarray(codes),
                                             np.asarray(lens), "HW")
    assert np.array_equal(np.asarray(out["dist"]), dists)
    assert np.array_equal(np.asarray(out["end"]), ends)


def test_native_banded_hw_exact(rng, make_dna, make_mutant):
    """The banded (threshold-k) HW path must agree with the unbanded
    engine whenever the true distance is within k, including the end
    position (first best column), and report -1 otherwise."""
    for trial in range(25):
        m = int(rng.integers(10, 260))
        q = make_dna(m)
        if trial % 3 == 0:
            t = make_dna(60) + make_mutant(q, n_sub=m // 12,
                                           n_ins=2, n_del=2) + make_dna(60)
        else:
            t = make_dna(int(rng.integers(20, 600)))
        qc, tc = encode(q), encode(t)
        want, wend = native_edit_distance(qc, tc, mode="HW", k=-1)
        for k in (0, 3, want - 1, want, want + 5, m):
            if k < 0:
                continue
            d, e = native_edit_distance(qc, tc, mode="HW", k=k)
            if want <= k:
                assert (d, e) == (want, wend), (trial, k)
            else:
                assert d == -1, (trial, k, d, want)


def test_native_banded_nw_exact(rng, make_dna, make_mutant):
    """The banded (threshold-k) NW path must agree with the unbanded
    engine whenever the true distance is within k and report -1
    otherwise (nw_banded: sliding-diagonal block band; role of edlib's
    myersCalcEditDistanceNW, edlib.cpp:707-800)."""
    for trial in range(25):
        m = int(rng.integers(10, 400))
        q = make_dna(m)
        if trial % 2 == 0:
            t = make_mutant(q, n_sub=max(1, m // 15), n_ins=3, n_del=3)
        else:
            t = make_dna(int(rng.integers(5, 500)))
        qc, tc = encode(q), encode(t)
        want, _ = native_edit_distance(qc, tc, mode="NW", k=-1)
        for k in (0, 1, 3, want - 1, want, want + 7, m + 500):
            if k < 0:
                continue
            d, _ = native_edit_distance(qc, tc, mode="NW", k=k)
            if want <= k:
                assert d == want, (trial, k, d, want)
            else:
                assert d == -1, (trial, k, d, want)


def test_polisher_edit_distance_large(make_dna, make_mutant):
    """_edit_distance (polish convergence report) must handle
    megabase-scale near-identical pairs without a device-sized NW."""
    from centroflye_tpu.stages.polisher import _edit_distance
    a = make_dna(300_000)
    b = make_mutant(a, n_sub=40, n_ins=10, n_del=10)
    d = _edit_distance(a, b)
    assert 10 <= d <= 120


def test_native_banded_batch(rng, make_dna, make_mutant):
    q = make_dna(120)
    texts = [make_mutant(q * 2, n_sub=6) if i % 2 == 0
             else make_dna(500) for i in range(8)]
    from centroflye_tpu.io import encode_batch
    codes, lens = encode_batch(texts, max_len=512)
    d_full, e_full = native_edit_distance_batch(
        encode(q), np.asarray(codes), np.asarray(lens), "HW")
    k = 30
    d_band, e_band = native_edit_distance_batch(
        encode(q), np.asarray(codes), np.asarray(lens), "HW", k=k)
    for i in range(8):
        if d_full[i] <= k:
            assert (d_band[i], e_band[i]) == (d_full[i], e_full[i])
        else:
            assert d_band[i] == -1


def test_native_align_path_banded_exact_path(rng, make_dna, make_mutant):
    """The banded traceback (pass-1 distance + dist-wide band DP) must
    reproduce the full-matrix greedy path op-for-op: same CIGAR, same
    t_start/t_end — including SHW/HW infix anchoring and high-divergence
    pairs that stress the band edges."""

    def dp_path(q, t, mode):
        n, m = len(q), len(t)
        D = np.zeros((n + 1, m + 1), dtype=np.int32)
        D[:, 0] = np.arange(n + 1)
        D[0, :] = 0 if mode == "HW" else np.arange(m + 1)
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                c = 0 if q[i - 1] == t[j - 1] else 1
                D[i, j] = min(D[i - 1, j - 1] + c, D[i - 1, j] + 1,
                              D[i, j - 1] + 1)
        if mode == "NW":
            jj, dist = m, int(D[n, m])
        else:
            dist, jj = int(D[n].min()), int(D[n].argmin())
        ops = []
        i, j = n, jj
        while i > 0:
            if j == 0:
                ops.append("I")
                i -= 1
                continue
            c = 0 if q[i - 1] == t[j - 1] else 1
            if D[i - 1, j - 1] + c == D[i, j]:
                ops.append("=" if c == 0 else "X")
                i -= 1
                j -= 1
            elif D[i - 1, j] + 1 == D[i, j]:
                ops.append("I")
                i -= 1
            else:
                ops.append("D")
                j -= 1
        if mode == "NW":
            while j > 0:
                ops.append("D")
                j -= 1
        return dist, j, jj, "".join(reversed(ops))

    def expand(cig):
        out, num = [], ""
        for ch in cig:
            if ch.isdigit():
                num += ch
            else:
                out.append(int(num) * ch)
                num = ""
        return "".join(out)

    for trial in range(24):
        mode = ["NW", "SHW", "HW"][trial % 3]
        q = make_dna(int(rng.integers(8, 90)))
        nmut = max(1, len(q) // 10)
        if mode == "HW":
            t = (make_dna(int(rng.integers(0, 40)))
                 + make_mutant(q, n_sub=nmut, n_ins=nmut, n_del=nmut)
                 + make_dna(int(rng.integers(0, 40))))
        else:
            t = (make_mutant(q, n_sub=nmut, n_ins=nmut, n_del=nmut)
                 if rng.random() < 0.7
                 else make_dna(int(rng.integers(8, 120))))
        d, cigar, t_st, t_en = native_align_path(encode(q), encode(t), mode)
        od, ts, te, ops = dp_path(q, t, mode)
        if mode != "NW" and te == 0:
            continue  # empty-alignment convention differs; not a path case
        assert (d, t_st, t_en) == (od, ts, te), (trial, mode)
        assert expand(cigar) == ops, (trial, mode)


def test_native_encode_pack_row_matches_numpy(rng, make_dna):
    """cf_encode_pack_row (ASCII -> packed row, one scan) must agree with
    encode + pack_2bit on clean rows, flag non-ACGT rows, honor start
    offsets / odd lengths / lowercase, and zero-fill past the length."""
    from centroflye_tpu.native import get_encode_pack
    from centroflye_tpu.ops.fused_recruit import pack_2bit
    enc_pack = get_encode_pack()
    if enc_pack is None:
        import pytest
        pytest.skip("native lib not built")
    for trial in range(30):
        n = int(rng.integers(1, 600))
        seq = make_dna(n)
        if trial % 3 == 1:
            seq = seq.lower()
        start = int(rng.integers(0, n))
        ln = n - start
        segq = -(-max(ln, 8) // 8) * 2        # out row width, 8-base padded
        out = np.full((segq,), 0xAA, np.uint8)  # stale garbage
        flag = enc_pack(seq.encode("ascii"), start, ln,
                        out.ctypes.data, segq)
        assert flag == 0
        L8 = segq * 4
        codes = np.full((1, L8), 4, np.int8)
        codes[0, :ln] = encode(seq[start:])
        want, n_mask = pack_2bit(codes, np.array([ln], np.int32))
        assert n_mask is None
        assert np.array_equal(out, want[0]), trial
    # non-ACGT flag
    out = np.zeros(4, np.uint8)
    assert enc_pack(b"ACGNACGT", 0, 8, out.ctypes.data, 4) == 1
    assert enc_pack(b"ACGNACGT", 4, 4, out.ctypes.data, 4) == 0


def test_native_nw_banded_empty_sides():
    """nw_banded with an empty query/target: pure-indel answers, no OOB
    reads (ADVICE r4: qlen=0 used to return -1 or read score[-1])."""
    import numpy as np
    from centroflye_tpu.native import native_edit_distance
    empty = np.zeros(0, np.int8)
    seq = np.array([0, 1, 2, 3, 0, 1], np.int8)
    if native_edit_distance(empty, seq, mode="NW", k=10) is None:
        import pytest
        pytest.skip("native lib unavailable")
    d, _ = native_edit_distance(empty, seq, mode="NW", k=10)
    assert d == len(seq)
    d, _ = native_edit_distance(empty, seq, mode="NW", k=3)
    assert d == -1
    d, _ = native_edit_distance(seq, empty, mode="NW", k=10)
    assert d == len(seq)
    d, _ = native_edit_distance(empty, empty, mode="NW", k=0)
    assert d == 0
