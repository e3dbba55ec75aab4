from collections import Counter, defaultdict

import numpy as np

from centroflye_tpu.io import encode_batch, kmer_codes
from centroflye_tpu.io.encoding import encode, join_u64
from centroflye_tpu.ops.kmers import (
    pack_kmers, count_unique, count_read_kmer_stats, merge_count_tables,
    lookup_codes, table_to_numpy, SENTINEL,
)


def py_kmers(seq, k):
    return [seq[i:i + k] for i in range(len(seq) - k + 1)
            if "N" not in seq[i:i + k]]


def test_pack_kmers_matches_host(make_dna):
    seqs = [make_dna(50), make_dna(33), make_dna(21)]
    k = 19
    codes, lens = encode_batch(seqs)
    hi, lo, valid = pack_kmers(codes, lens, k=k)
    for b, s in enumerate(seqs):
        host_codes, host_valid = kmer_codes(encode(s), k=k)
        nwin_b = len(s) - k + 1
        dev = join_u64(np.asarray(hi[b][:nwin_b]), np.asarray(lo[b][:nwin_b]))
        assert (dev[host_valid] == host_codes[host_valid]).all()
        assert np.asarray(valid[b])[:nwin_b].tolist() == host_valid.tolist()
        # beyond-length windows invalid
        assert not np.asarray(valid[b])[nwin_b:].any()


def test_pack_kmers_with_n():
    codes, lens = encode_batch(["ACGNACGTA"])
    hi, lo, valid = pack_kmers(codes, lens, k=3)
    assert np.asarray(valid[0]).tolist() == [
        True, False, False, False, True, True, True]


def test_count_unique_matches_counter(make_dna):
    seqs = [make_dna(200) for _ in range(5)]
    k = 7
    codes, lens = encode_batch(seqs)
    hi, lo, _ = pack_kmers(codes, lens, k=k)
    uhi, ulo, cnt, n = count_unique(hi, lo, capacity=1024)
    expect = Counter()
    for s in seqs:
        expect.update(py_kmers(s, k))
    got_codes, got_counts = table_to_numpy(uhi, ulo, cnt, n)
    from centroflye_tpu.io import kmer_strings
    got = dict(zip(kmer_strings(got_codes, k), got_counts.tolist()))
    assert got == dict(expect)
    assert int(n) == len(expect)
    # sorted ascending, sentinel padded
    assert (np.diff(got_codes.astype(np.int64)) > 0).all()
    assert np.asarray(uhi)[int(n):].tolist() == [0xFFFFFFFF] * (1024 - int(n))


def test_count_unique_all_invalid():
    hi = np.full((4,), 0xFFFFFFFF, np.uint32)
    lo = np.full((4,), 0xFFFFFFFF, np.uint32)
    uhi, ulo, cnt, n = count_unique(hi, lo, capacity=8)
    assert int(n) == 0
    assert np.asarray(cnt).sum() == 0


def test_read_kmer_stats_oracle(rng, make_dna):
    # emulate the reference's get_kmer_freqs_from_ncrf_report semantics
    # (distance_based_kmer_recruitment.py:44-63), order-independent form
    base = make_dna(60)
    seqs = []
    for _ in range(6):
        # create reads sharing many k-mers, some repeated within a read
        s = base[:30] + base[:30] if rng.random() < 0.5 else base
        seqs.append(s)
    k = 9
    codes, lens = encode_batch(seqs)
    hi, lo, _ = pack_kmers(codes, lens, k=k)
    rid = np.broadcast_to(
        np.arange(len(seqs), dtype=np.int32)[:, None], hi.shape)
    uhi, ulo, n_reads, n_multi, n = count_read_kmer_stats(
        hi, lo, rid, capacity=512)

    reads_containing = defaultdict(set)
    reads_multi = defaultdict(set)
    for i, s in enumerate(seqs):
        c = Counter(py_kmers(s, k))
        for km, f in c.items():
            reads_containing[km].add(i)
            if f > 1:
                reads_multi[km].add(i)
    got_codes, _ = table_to_numpy(uhi, ulo, n_reads, n)
    from centroflye_tpu.io import kmer_strings
    strs = kmer_strings(got_codes, k)
    assert int(n) == len(reads_containing)
    for j, km in enumerate(strs):
        assert int(n_reads[j]) == len(reads_containing[km]), km
        assert int(n_multi[j]) == len(reads_multi[km]), km


def test_merge_tables(make_dna):
    k = 7
    s1, s2 = [make_dna(150)], [make_dna(150)]
    t = []
    for seqs in (s1, s2):
        codes, lens = encode_batch(seqs)
        hi, lo, _ = pack_kmers(codes, lens, k=k)
        t.append(count_unique(hi, lo, capacity=256))
    uhi, ulo, cnt, n = merge_count_tables(
        t[0][0], t[0][1], t[0][2], t[1][0], t[1][1], t[1][2], capacity=512)
    expect = Counter(py_kmers(s1[0], k)) + Counter(py_kmers(s2[0], k))
    got_codes, got_counts = table_to_numpy(uhi, ulo, cnt, n)
    from centroflye_tpu.io import kmer_strings
    got = dict(zip(kmer_strings(got_codes, k), got_counts.tolist()))
    assert got == dict(expect)


def test_lookup_codes(make_dna):
    k = 11
    seqs = [make_dna(300)]
    codes, lens = encode_batch(seqs)
    hi, lo, _ = pack_kmers(codes, lens, k=k)
    uhi, ulo, cnt, n = count_unique(hi, lo, capacity=512)
    # every inserted code must be found at the right slot
    found, idx = lookup_codes(uhi, ulo, hi.ravel(), lo.ravel())
    assert np.asarray(found).all()
    assert (np.asarray(uhi)[np.asarray(idx)] == np.asarray(hi.ravel())).all()
    # absent codes are not found
    absent_hi = np.zeros(4, np.uint32)
    absent_lo = np.full(4, 0x3, np.uint32)  # kmer "AAAAAAAAAT"-ish
    from centroflye_tpu.io import kmer_strings as ks
    all_codes, _ = table_to_numpy(uhi, ulo, cnt, n)
    target = join_u64(absent_hi, absent_lo)[0]
    if target not in set(all_codes.tolist()):
        f2, _ = lookup_codes(uhi, ulo, absent_hi, absent_lo)
        assert not np.asarray(f2)[0]
