"""Oracle tests: rare-kmer + cloud + distance-graph stages vs a pure-Python
mirror of the reference semantics (distance_based_kmer_recruitment.py,
read_kmer_cloud.py)."""

from collections import Counter, defaultdict

import numpy as np
import pytest

from centroflye_tpu.config import KmerRecruitmentConfig
from centroflye_tpu.io import kmer_strings
from centroflye_tpu.pipeline.simulate import (
    gen_random_seq, simulate_tandem_repeat, add_read_noise,
)
from centroflye_tpu.stages.rare_kmers import read_kmer_table, get_rare_kmers
from centroflye_tpu.stages.kmer_cloud import (
    build_read_clouds, filter_read_clouds, pad_clouds,
)
from centroflye_tpu.stages.distance_graph import (
    build_distance_table, filter_dist_tuples, recruit_unique_kmers,
)
from centroflye_tpu.stages.unit_decomposition import UnitDecomposer
from centroflye_tpu.config import UnitDecompositionConfig


# ------------------------- python oracles ---------------------------------

def oracle_kmer_freqs(seqs, k, max_nonuniq):
    """Reference get_kmer_freqs_from_ncrf_report (sequential form)."""
    non_unique = defaultdict(int)
    all_kmers = {}
    for s in seqs:
        read_freq = Counter(s[i:i + k] for i in range(len(s) - k + 1))
        for kmer, freq in read_freq.items():
            if freq > 1:
                non_unique[kmer] += 1
            if non_unique[kmer] <= max_nonuniq:
                all_kmers[kmer] = all_kmers.get(kmer, 0) + 1
            else:
                all_kmers.pop(kmer, None)
    return all_kmers


def oracle_rare(seqs, k, cfg, coverage):
    all_kmers = oracle_kmer_freqs(seqs, k, cfg.max_nonuniq)
    left = cfg.bottom * coverage * cfg.kmer_survival_rate
    right = cfg.top * coverage * cfg.kmer_survival_rate
    return {km for km, f in all_kmers.items() if left <= f <= right}


def oracle_dist_map(read_clouds_strs, min_d, max_d):
    """Reference get_kmer_dist_map: {(i_kmer, j_kmer, d): count} with
    string k-mers."""
    cnt = defaultdict(int)
    for clouds in read_clouds_strs:
        for d in range(min_d, max_d + 1):
            for t in range(len(clouds) - d):
                for a in clouds[t]:
                    for b in clouds[t + d]:
                        if a != b:
                            cnt[(a, b, d)] += 1
    return cnt


def oracle_filter(cnt, min_cov, rel=0.8):
    pair_tot = defaultdict(int)
    for (a, b, d), c in cnt.items():
        pair_tot[(a, b)] += c
    kept = {}
    sel_kmers = set()
    for (a, b, d), c in cnt.items():
        if c >= min_cov and c / pair_tot[(a, b)] >= rel:
            kept[(a, b, d)] = c
            sel_kmers.add(a)
            sel_kmers.add(b)
    return kept, sel_kmers


# ------------------------------ tests -------------------------------------

K = 13


def test_read_kmer_table_vs_oracle(rng):
    seqs = []
    base = gen_random_seq(rng, 400)
    for i in range(10):
        if i % 3 == 0:
            seqs.append(base[:150] + base[:150])   # in-read repeats
        else:
            seqs.append(add_read_noise(rng, base, 0.05))
    codes, n_reads, n_multi = read_kmer_table(seqs, K, batch_rows=3)
    strs = kmer_strings(codes, K)

    contain = defaultdict(int)
    multi = defaultdict(int)
    for s in seqs:
        c = Counter(s[i:i + K] for i in range(len(s) - K + 1))
        for km, f in c.items():
            contain[km] += 1
            if f > 1:
                multi[km] += 1
    assert len(strs) == len(contain)
    for km, nr, nm in zip(strs, n_reads, n_multi):
        assert contain[km] == nr
        assert multi[km] == nm


def test_rare_kmers_vs_oracle(rng):
    cfg = KmerRecruitmentConfig(k=K, max_nonuniq=2, bottom=0.9, top=3.0,
                                kmer_survival_rate=0.5)
    coverage = 8
    base = gen_random_seq(rng, 300)
    seqs = [add_read_noise(rng, base, 0.03) for _ in range(12)]
    seqs += [base[:100] * 3 for _ in range(4)]   # heavy in-read repeats
    rare = set(kmer_strings(
        get_rare_kmers(seqs, cfg, coverage, batch_rows=4), K))
    assert rare == oracle_rare(seqs, K, cfg, coverage)
    assert len(rare) > 0


def make_decomposition(rng, unit, n_reads=10, copies=12, noise=0.08):
    reads = []
    for i in range(n_reads):
        seq = "".join(add_read_noise(rng, unit, noise) for _ in range(copies))
        reads.append((f"r{i:03d}", seq))
    dec = UnitDecomposer(
        unit, UnitDecompositionConfig(min_record_len=500)).decompose(reads)
    return dec


def test_clouds_and_distance_graph_vs_oracle(rng):
    unit = gen_random_seq(rng, 100)
    dec = make_decomposition(rng, unit, n_reads=4, copies=6, noise=0.05)
    assert len(dec.records) == 4
    cfg = KmerRecruitmentConfig(
        k=K, min_distance=1, max_distance=3, min_coverage=3,
        bottom=0.0, top=100.0)  # wide rare band for test density
    seqs = [dec.records[r].seq for r in sorted(dec.records)]
    rare_codes = get_rare_kmers(seqs, cfg, coverage=1, batch_rows=4)
    rare_strs = kmer_strings(rare_codes, K)
    rare_set = set(rare_strs)
    idx2str = dict(enumerate(rare_strs))

    records = {r: dec.records[r] for r in sorted(dec.records)}
    clouds = build_read_clouds(records, rare_codes, K)

    # oracle clouds: per record instance, set of rare k-mers
    oracle_clouds = []
    for r in sorted(records):
        rec = records[r]
        per_read = []
        for inst in rec.motif_alignments():
            kms = {inst[i:i + K] for i in range(len(inst) - K + 1)}
            per_read.append(kms & rare_set)
        oracle_clouds.append(per_read)
        got = clouds[r]
        assert got.n_units == len(per_read)
        for c_idx, c_or in zip(got.clouds, per_read):
            assert {idx2str[i] for i in c_idx} == c_or

    r_ids, tensor, n_units, Kpad = pad_clouds(clouds, sorted(records))
    uhi, ulo, cnt, n = build_distance_table(
        tensor, n_units, cfg, capacity=1 << 19, entry_chunk=8)
    got_map = {}
    for t in range(n):
        i = int(uhi[t])
        j = int(ulo[t]) >> 8
        d = int(ulo[t]) & 0xFF
        got_map[(idx2str[i], idx2str[j], d)] = int(cnt[t])
    want_map = oracle_dist_map(oracle_clouds, cfg.min_distance,
                               cfg.max_distance)
    assert got_map == dict(want_map)

    edges = filter_dist_tuples(uhi, ulo, cnt, n, cfg)
    want_kept, want_kmers = oracle_filter(want_map, cfg.min_coverage,
                                          cfg.rel_threshold)
    got_kept = {(idx2str[int(a)], idx2str[int(b)], int(d)): int(f)
                for a, b, d, f in zip(edges.i, edges.j, edges.dist,
                                      edges.freq)}
    assert got_kept == want_kept
    got_kmers = {idx2str[int(i)] for i in edges.unique_kmer_indices}
    assert got_kmers == want_kmers


def test_distance_table_beyond_d_chunk(rng):
    """Regression: distances greater than the kernel's d_chunk (8) must be
    counted at their true offset. A previous version padded the cloud
    tensor with only d_chunk columns, so dynamic_slice clamped every
    distance > 8 back to offset 8 — wrong counts for all d in (8, max_d]."""
    R, T, Kc = 5, 24, 4
    n_kmers = 40
    tensor = np.full((R, T, Kc), -1, np.int32)
    n_units = np.zeros(R, np.int32)
    cloud_lists = []
    for r in range(R):
        nu = int(rng.integers(T - 4, T + 1))
        n_units[r] = nu
        per_read = []
        for t in range(nu):
            sz = int(rng.integers(0, Kc + 1))
            ids = rng.choice(n_kmers, size=sz, replace=False)
            tensor[r, t, :sz] = ids
            per_read.append(set(int(x) for x in ids))
        cloud_lists.append(per_read)
    cfg = KmerRecruitmentConfig(k=K, min_distance=1, max_distance=12,
                                min_coverage=1)
    uhi, ulo, cnt, n = build_distance_table(
        tensor, n_units, cfg, capacity=1 << 16, entry_chunk=4)
    got = {}
    for t in range(n):
        got[(int(uhi[t]), int(ulo[t]) >> 8, int(ulo[t]) & 0xFF)] = \
            int(cnt[t])
    want = oracle_dist_map(cloud_lists, 1, 12)
    assert got == dict(want)
    assert any(d > 8 for (_, _, d) in want), "test must exercise d > d_chunk"


def test_filter_clouds_multiplicity(rng):
    unit = gen_random_seq(rng, 200)
    dec = make_decomposition(rng, unit, n_reads=5, copies=8)
    cfg = KmerRecruitmentConfig(k=K, bottom=0.0, top=1e9)
    seqs = [dec.records[r].seq for r in sorted(dec.records)]
    rare_codes = get_rare_kmers(seqs, cfg, coverage=1, batch_rows=4)
    records = {r: dec.records[r] for r in sorted(dec.records)}
    clouds = build_read_clouds(records, rare_codes, K)
    filt = filter_read_clouds(clouds, min_mult=3)
    # oracle multiplicity
    mult = Counter()
    for rc in clouds.values():
        for c in rc.clouds:
            mult.update(c.tolist())
    for r, rc in filt.items():
        for c_new, c_old in zip(rc.clouds, clouds[r].clouds):
            want = {i for i in c_old.tolist() if mult[i] >= 3}
            assert set(c_new.tolist()) == want


def test_unique_kmers_from_simulated_tandem(rng):
    # end-to-end slice: mutated tandem repeat -> decomposition -> rare ->
    # distance graph -> unique k-mers must mark mutation-bearing positions
    unit = gen_random_seq(rng, 250)
    sim = simulate_tandem_repeat(rng, unit, mult=30, div_rate=0.01,
                                 flank_len=0)
    # perfect reads tiling the repeat (no noise: sharpest signal)
    reads = []
    for i in range(12):
        st = (i * 547) % (len(sim.tr) - 3000)
        reads.append((f"t{i}", sim.tr[st:st + 3000]))
    dec = UnitDecomposer(
        unit, UnitDecompositionConfig(min_record_len=500)).decompose(reads)
    cfg = KmerRecruitmentConfig(k=K, min_distance=1, max_distance=4,
                                min_coverage=2, bottom=0.0, top=1e9)
    records = {r: dec.records[r] for r in sorted(dec.records)}
    seqs = [rec.seq for rec in records.values()]
    rare = get_rare_kmers(seqs, cfg, coverage=1, batch_rows=4)
    clouds = build_read_clouds(records, rare, K)
    r_ids, tensor, n_units, _ = pad_clouds(clouds, sorted(records))
    uniq_codes, edges = recruit_unique_kmers(
        tensor, n_units, rare, cfg, capacity=1 << 20, entry_chunk=16)
    # unique k-mers must be a subset of rare and non-empty
    assert len(uniq_codes) > 0
    assert set(uniq_codes.tolist()) <= set(rare.tolist())


def test_multi_strip_sweep_and_device_filter(rng):
    """Regression for the strip-swept sweep: with a capacity far below the
    pair-observation bound the key space splits into several i-range
    strips (tile A-ranges straddle strip boundaries and must be counted
    exactly once); build_distance_table (host concat) and
    recruit_unique_kmers (per-strip ON-DEVICE filter) must both match the
    python oracle."""
    from centroflye_tpu.stages.distance_graph import _pair_obs_bound
    R, T, Kc = 6, 9, 23
    n_kmers = 300
    tensor = np.full((R, T, Kc), -1, np.int32)
    n_units = np.zeros(R, np.int32)
    cloud_lists = []
    for r in range(R):
        nu = int(rng.integers(T - 2, T + 1))
        n_units[r] = nu
        per_read = []
        for t in range(nu):
            sz = int(rng.integers(1, Kc + 1))
            ids = np.sort(rng.choice(n_kmers, size=sz, replace=False))
            tensor[r, t, :sz] = ids
            per_read.append(set(int(x) for x in ids))
        cloud_lists.append(per_read)
    cfg = KmerRecruitmentConfig(k=K, min_distance=1, max_distance=7,
                                min_coverage=2)
    bound = _pair_obs_bound(tensor, n_units, cfg)
    cap = 1 << 10
    assert bound // cap >= 3, "test must exercise >= 3 strips"
    uhi, ulo, cnt, n = build_distance_table(
        tensor, n_units, cfg, capacity=cap, entry_chunk=64, tile_a=4,
        tile_b=8)
    got = {}
    for q in range(n):
        got[(int(uhi[q]), int(ulo[q]) >> 8, int(ulo[q]) & 0xFF)] = \
            int(cnt[q])
    want = oracle_dist_map(cloud_lists, 1, 7)
    assert got == dict(want)
    # strips arrive in ascending i order -> globally sorted table
    keys = [(int(uhi[q]), int(ulo[q])) for q in range(n)]
    assert keys == sorted(keys)

    rare_fake = np.arange(n_kmers, dtype=np.uint64)
    uniq, edges = recruit_unique_kmers(
        tensor, n_units, rare_fake, cfg, capacity=cap, entry_chunk=64)
    want_kept, want_kmers = oracle_filter(want, cfg.min_coverage,
                                          cfg.rel_threshold)
    got_kept = {(int(a), int(b), int(d)): int(f)
                for a, b, d, f in zip(edges.i, edges.j, edges.dist,
                                      edges.freq)}
    assert got_kept == want_kept
    assert set(int(i) for i in edges.unique_kmer_indices) == want_kmers
    assert np.array_equal(uniq, np.sort(np.array(list(want_kmers),
                                                 dtype=np.uint64)))

    # dedup_hint shrinks the STRIP COUNT only — results are identical
    # (skewed strips may overflow their capacity; the check-and-double
    # fallback must absorb that exactly)
    uniq_h, edges_h = recruit_unique_kmers(
        tensor, n_units, rare_fake, cfg, capacity=cap, entry_chunk=64,
        dedup_hint=8)
    assert np.array_equal(uniq_h, uniq)
    got_h = {(int(a), int(b), int(d)): int(f)
             for a, b, d, f in zip(edges_h.i, edges_h.j, edges_h.dist,
                                   edges_h.freq)}
    assert got_h == want_kept

    # return_edges=False must still deliver the exact unique-k-mer set
    # (device endpoint flags), with the edge arrays empty
    uniq_ne, edges_ne = recruit_unique_kmers(
        tensor, n_units, rare_fake, cfg, capacity=cap, entry_chunk=64,
        return_edges=False)
    assert np.array_equal(uniq_ne, uniq)
    assert np.array_equal(edges_ne.unique_kmer_indices,
                          edges.unique_kmer_indices)
    assert edges_ne.i.size == 0 and edges_ne.freq.size == 0

    # overflow-split path: max_capacity at the strip capacity with an
    # oversized dedup_hint forces strips whose distinct-key count
    # exceeds the cap — the sweep must split them and retry, never
    # growing a device table past max_capacity, with identical results
    uniq_s, edges_s = recruit_unique_kmers(
        tensor, n_units, rare_fake, cfg, capacity=cap, entry_chunk=64,
        dedup_hint=1 << 12, max_capacity=cap)
    assert np.array_equal(uniq_s, uniq)
    got_s = {(int(a), int(b), int(d)): int(f)
             for a, b, d, f in zip(edges_s.i, edges_s.j, edges_s.dist,
                                   edges_s.freq)}
    assert got_s == want_kept


def test_adaptive_striping_high_dedup(rng):
    """Adaptive striping: when many reads share clouds (every key
    observed ~R times), the first strip's calibration must coalesce the
    remaining uniform ranges — with results identical to the
    non-adaptive sweep and to dedup_hint-driven striping."""
    R, T, Kc = 12, 8, 16
    n_kmers = 400
    # all reads see the SAME per-position clouds -> dedup factor ~= R
    per_pos = [np.sort(rng.choice(n_kmers, size=Kc, replace=False))
               for _ in range(T)]
    tensor = np.stack([np.stack(per_pos)] * R).astype(np.int32)
    n_units = np.full(R, T, np.int32)
    cfg = KmerRecruitmentConfig(k=K, min_distance=1, max_distance=5,
                                min_coverage=3)
    rare_fake = np.arange(n_kmers, dtype=np.uint64)
    cap = 1 << 9
    uniq_a, edges_a = recruit_unique_kmers(
        tensor, n_units, rare_fake, cfg, capacity=cap, entry_chunk=128)
    from centroflye_tpu.stages.distance_graph import _strip_sweep
    # non-adaptive: same capacity, uniform grid all the way
    strips_na = sum(1 for _ in _strip_sweep(
        tensor, n_units, cfg, capacity=cap, entry_chunk=128,
        adaptive=False))
    strips_a = sum(1 for _ in _strip_sweep(
        tensor, n_units, cfg, capacity=cap, entry_chunk=128,
        adaptive=True))
    assert strips_a < strips_na, (strips_a, strips_na)
    uniq_na, edges_na = recruit_unique_kmers(
        tensor, n_units, rare_fake, cfg, capacity=cap, entry_chunk=128,
        dedup_hint=1)
    assert np.array_equal(uniq_a, uniq_na)
    got_a = {(int(a), int(b), int(d)): int(f)
             for a, b, d, f in zip(edges_a.i, edges_a.j, edges_a.dist,
                                   edges_a.freq)}
    got_na = {(int(a), int(b), int(d)): int(f)
              for a, b, d, f in zip(edges_na.i, edges_na.j,
                                    edges_na.dist, edges_na.freq)}
    assert got_a == got_na


def test_raw_vs_table_strip_paths(rng):
    """The raw sorted-pair fast path (strip fits one chunk: counts =
    run lengths, no count table) must produce identical unique k-mers
    and edges to the table path, including with the truncated-edge
    fallback forced."""
    R, T, Kc = 14, 7, 10
    n_kmers = 250
    per_pos = [np.sort(rng.choice(n_kmers, size=Kc, replace=False))
               for _ in range(T)]
    tensor = np.stack([np.stack(per_pos)] * R).astype(np.int32)
    mask = rng.random(tensor.shape) < 0.25
    tensor[mask] = -1
    tensor = np.sort(tensor, axis=2)[:, :, ::-1]
    tensor = np.ascontiguousarray(tensor[:, :, ::-1])
    n_units = np.full(R, T, np.int32)
    cfg = KmerRecruitmentConfig(k=K, min_distance=1, max_distance=5,
                                min_coverage=3)
    rare_fake = np.arange(n_kmers, dtype=np.uint64)

    def run(**kw):
        u, e = recruit_unique_kmers(
            tensor, n_units, rare_fake, cfg, capacity=1 << 11, **kw)
        d = {(int(a), int(b), int(dd)): int(f) for a, b, dd, f in
             zip(e.i, e.j, e.dist, e.freq)}
        return set(int(x) for x in u), d

    # big chunk: every strip takes the raw path
    u_raw, e_raw = run(entry_chunk=1 << 16)
    # tiny chunk: every strip takes the table path
    u_tab, e_tab = run(entry_chunk=64)
    assert u_raw == u_tab
    assert e_raw == e_tab
    # raw path with forced truncation fallback
    u_fb, e_fb = run(entry_chunk=1 << 16, out_small=4)
    assert u_fb == u_raw and e_fb == e_raw


def test_edge_compaction_fallback(rng):
    """When a strip keeps more edges than the fast-path bound, the
    background materializer must fall back to the exact full-capacity
    compaction — identical results, nothing truncated."""
    R, T, Kc = 10, 6, 12
    n_kmers = 200
    per_pos = [np.sort(rng.choice(n_kmers, size=Kc, replace=False))
               for _ in range(T)]
    tensor = np.stack([np.stack(per_pos)] * R).astype(np.int32)
    n_units = np.full(R, T, np.int32)
    cfg = KmerRecruitmentConfig(k=K, min_distance=1, max_distance=4,
                                min_coverage=3)
    rare_fake = np.arange(n_kmers, dtype=np.uint64)
    uniq_ref, edges_ref = recruit_unique_kmers(
        tensor, n_units, rare_fake, cfg, capacity=1 << 10,
        entry_chunk=128)
    assert len(edges_ref.i) > 8
    uniq_fb, edges_fb = recruit_unique_kmers(
        tensor, n_units, rare_fake, cfg, capacity=1 << 10,
        entry_chunk=128, out_small=4)     # force the fallback
    assert np.array_equal(uniq_fb, uniq_ref)
    ref = {(int(a), int(b), int(d)): int(f) for a, b, d, f in
           zip(edges_ref.i, edges_ref.j, edges_ref.dist, edges_ref.freq)}
    fb = {(int(a), int(b), int(d)): int(f) for a, b, d, f in
          zip(edges_fb.i, edges_fb.j, edges_fb.dist, edges_fb.freq)}
    assert fb == ref


def test_distance_table_uncanonical_rows(rng):
    """Cloud rows that arrive unsorted and with -1 holes in the middle
    must count identically to canonical (sorted, valid-front) rows: the
    sweep canonicalizes internally (the exact ragged enumeration and the
    strip segments both index contiguous valid prefixes of sorted rows).
    Also forces multiple strips so segment bounds are exercised."""
    R, T, Kc = 8, 14, 5
    n_kmers = 60
    tensor = np.full((R, T, Kc), -1, np.int32)
    n_units = np.zeros(R, np.int32)
    cloud_lists = []
    for r in range(R):
        nu = int(rng.integers(4, T + 1))
        n_units[r] = nu
        per_read = []
        for t in range(nu):
            sz = int(rng.integers(0, Kc + 1))
            ids = rng.choice(n_kmers, size=sz, replace=False)
            # scatter the values over random slots: holes in the middle
            slots = rng.choice(Kc, size=sz, replace=False)
            tensor[r, t, np.sort(slots)] = ids          # unsorted values
            per_read.append(set(int(x) for x in ids))
        cloud_lists.append(per_read)
    cfg = KmerRecruitmentConfig(k=K, min_distance=1, max_distance=9,
                                min_coverage=1)
    want = oracle_dist_map(cloud_lists, 1, 9)
    for cap in (1 << 16, 1 << 7):       # single-strip and multi-strip
        uhi, ulo, cnt, n = build_distance_table(
            tensor, n_units, cfg, capacity=cap, entry_chunk=32)
        got = {}
        for t in range(n):
            got[(int(uhi[t]), int(ulo[t]) >> 8, int(ulo[t]) & 0xFF)] = \
                int(cnt[t])
        assert got == dict(want), f"capacity={cap}"


def test_auto_min_coverage_steps_down(rng):
    """Coverage-adaptive edge cutoff: a sparse world whose true pair
    counts sit at 2-3 starves min_coverage=4 entirely; auto mode must
    step the cutoff down and return EXACTLY the edge set of a direct
    min_coverage=2 run (the d-consistency test is cutoff-independent, so
    post-thresholding the floor sweep is exact)."""
    R, T, Kc = 6, 8, 3
    n_kmers = 64
    tensor = np.full((R, T, Kc), -1, np.int32)
    n_units = np.zeros(R, np.int32)
    # 3 reads each over the same two "array windows": each (unit t,
    # kmer) pair recurs in 3 reads -> pair counts exactly 3 (< 4)
    for r in range(R):
        n_units[r] = T
        for t in range(T):
            base = (t + (r // 3) * T) % (n_kmers // 2)
            tensor[r, t, 0] = 2 * base
            tensor[r, t, 1] = 2 * base + 1
    rare_fake = np.arange(n_kmers, dtype=np.uint64)
    cfg4 = KmerRecruitmentConfig(k=K, min_distance=1, max_distance=4,
                                 min_coverage=4)
    uniq4, edges4 = recruit_unique_kmers(
        tensor, n_units, rare_fake, cfg4, capacity=1 << 14,
        entry_chunk=64)
    assert len(uniq4) == 0 and edges4.min_coverage_used == 4

    cfg_auto = KmerRecruitmentConfig(
        k=K, min_distance=1, max_distance=4, min_coverage=4,
        auto_min_coverage=True)
    uniq_a, edges_a = recruit_unique_kmers(
        tensor, n_units, rare_fake, cfg_auto, capacity=1 << 14,
        entry_chunk=64)
    cfg2 = KmerRecruitmentConfig(k=K, min_distance=1, max_distance=4,
                                 min_coverage=2)
    uniq2, edges2 = recruit_unique_kmers(
        tensor, n_units, rare_fake, cfg2, capacity=1 << 14,
        entry_chunk=64)
    assert edges_a.min_coverage_used < 4
    assert np.array_equal(uniq_a, uniq2)
    got_a = {(int(a), int(b), int(d)): int(f)
             for a, b, d, f in zip(edges_a.i, edges_a.j, edges_a.dist,
                                   edges_a.freq)}
    got_2 = {(int(a), int(b), int(d)): int(f)
             for a, b, d, f in zip(edges2.i, edges2.j, edges2.dist,
                                   edges2.freq)}
    assert got_a == got_2 and len(got_a) > 0


def test_auto_min_coverage_keeps_reference_cutoff_when_healthy(rng):
    """At healthy counts (>= 4) the adaptive mode must CHOOSE the
    reference cutoff and match the fixed run bit-for-bit."""
    R, T, Kc = 10, 6, 3
    n_kmers = 40
    tensor = np.full((R, T, Kc), -1, np.int32)
    n_units = np.zeros(R, np.int32)
    for r in range(R):                 # 10 identical reads: counts = 10
        n_units[r] = T
        for t in range(T):
            tensor[r, t, 0] = 2 * t
            tensor[r, t, 1] = 2 * t + 1
    rare_fake = np.arange(n_kmers, dtype=np.uint64)
    cfg4 = KmerRecruitmentConfig(k=K, min_distance=1, max_distance=3,
                                 min_coverage=4)
    uniq4, edges4 = recruit_unique_kmers(
        tensor, n_units, rare_fake, cfg4, capacity=1 << 14,
        entry_chunk=64)
    cfg_auto = KmerRecruitmentConfig(
        k=K, min_distance=1, max_distance=3, min_coverage=4,
        auto_min_coverage=True)
    uniq_a, edges_a = recruit_unique_kmers(
        tensor, n_units, rare_fake, cfg_auto, capacity=1 << 14,
        entry_chunk=64)
    assert edges_a.min_coverage_used == 4
    assert np.array_equal(uniq_a, uniq4)
    got_a = {(int(a), int(b), int(d)): int(f)
             for a, b, d, f in zip(edges_a.i, edges_a.j, edges_a.dist,
                                   edges_a.freq)}
    got_4 = {(int(a), int(b), int(d)): int(f)
             for a, b, d, f in zip(edges4.i, edges4.j, edges4.dist,
                                   edges4.freq)}
    assert got_a == got_4 and len(got_a) > 0
