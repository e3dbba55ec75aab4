"""Distance-graph recruitment of unique k-mers (the reference's 9h stage).

Reference behavior (distance_based_kmer_recruitment.py:85-149): for every
unit-distance d in [min_d, max_d] and every read, count ordered co-occurrences
of rare-k-mer pairs (i in cloud t, j in cloud t+d, i != j) into a sparse
(kmer x kmer x dist) structure of Python dicts — the 9h/800GB RAM blow-up.
filter_dist_tuples then keeps an edge (i, j, d) iff count >= min_coverage AND
that d carries >= rel_threshold (0.8) of all distance-counts for (i, j);
endpoint k-mers of surviving edges are the unique k-mers.

TPU design: a pair observation is a single sortable key
    hi = i (k-mer index),  lo = (j << 8) | d     (j < 2^24, d < 2^8)
so the whole tensor is a sorted fixed-capacity (hi, lo) -> count table built
with ops/kmers.count_unique and merged associatively across key chunks and
across devices (the merge is a concat + 2-key resort + run compaction: exact,
deterministic, no hash collisions).

Pair generation is RAGGED-AWARE: clouds average far fewer k-mers than the
padded width (measured ~67 of K=245 at 400-unit scale — a dense
cloud x cloud broadcast wastes >90% of the sort volume on pad keys, and pad
keys cost exactly as much as real keys once they enter the sort). The host
enumerates, per distance d, the (tile-of-cloud-t, tile-of-cloud-(t+d))
work items actually populated — sizes are known on the host for free —
and the device kernel gathers tile pairs from a flat cloud array and
emits a (W, tile_a, tile_b) key block per chunk. Work scales with true
pair observations (x a small tile-rounding factor), not with R*T*K^2.
Worklist chunks have ONE static shape, so the whole sweep is one compile;
chunks shard over the mesh data axis (parallel/mesh.make_pair_table_step)
with all_gather+fold merges over ICI. The final filter is a segmented
reduction over (i, j) groups of the sorted table.

At production scale the distinct-key count exceeds any single on-device
table (measured >2^27 distinct at a 400-unit array with 62k rare k-mers —
a doubling accumulator OOMs HBM exactly like the reference's dicts OOM'd
800GB of RAM). The sweep therefore STRIPES the key space by i-range.
Strip membership is exact by construction: cloud rows are sorted, so a
strip's elements within a row form one contiguous segment (bounds read
off host value-threshold counts); A-tiles slice that segment, B-tiles
the full partner cloud, and no tile is emitted to more than one strip.
Every strip accumulates its own bounded table, and `recruit_unique_kmers`
filters each strip ON DEVICE — groups (i, j) never straddle a strip, so
the distance-consistency filter is strip-local and exact, and only the
surviving edges (a few MB) ever reach the host. Memory is O(strip), the
full table is never materialized, and strips are embarrassingly parallel
across chips.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from centroflye_tpu.config import KmerRecruitmentConfig
from centroflye_tpu.ops.kmers import (
    count_unique, merge_count_tables, SENTINEL,
)

_SENT = 0xFFFFFFFF
logger = logging.getLogger("centroflye_tpu")


def _next_pow2(x: int) -> int:
    return 1 << max(0, int(np.ceil(np.log2(max(int(x), 1)))))


@functools.partial(jax.jit, static_argnames=("tile_a", "tile_b",
                                              "capacity"))
def _pairs_from_tiles(flat: jnp.ndarray, base_a: jnp.ndarray,
                      base_b: jnp.ndarray, dvals: jnp.ndarray,
                      strip_lo, strip_hi,
                      *, tile_a: int, tile_b: int, capacity: int):
    """Count (i, j, d) keys for one worklist chunk of tile pairs.

    flat: flattened cloud tensor (R*T*Kp + tile_b,) int32, -1 padded, the
    trailing tile_b entries all -1 (the sentinel tile that padded
    worklist entries point at). base_a/base_b: (W,) int32 flat offsets of
    the A (strip segment, tile_a wide) and B (full cloud, tile_b wide)
    tiles; dvals: (W,) int32 unit distance per entry. Keys are masked to
    i in [strip_lo, strip_hi) (traced scalars: one compile serves every
    strip) — for A-tiles sliced from a sorted row's strip segment this
    only trims the segment's ragged tail. Returns a sorted
    fixed-capacity key->count table (uhi, ulo, counts, n)."""
    offs_a = jnp.arange(tile_a, dtype=jnp.int32)
    offs_b = jnp.arange(tile_b, dtype=jnp.int32)
    a = flat[base_a[:, None] + offs_a[None, :]][:, :, None]  # (W, Ga, 1)
    b = flat[base_b[:, None] + offs_b[None, :]][:, None, :]  # (W, 1, Gb)
    dv = dvals[:, None, None].astype(jnp.uint32)
    valid = (a >= 0) & (b >= 0) & (a != b) & \
        (a >= strip_lo) & (a < strip_hi)
    hi = jnp.where(valid, a.astype(jnp.uint32), jnp.uint32(_SENT))
    lo = jnp.where(
        valid, (b.astype(jnp.uint32) << jnp.uint32(8)) | dv,
        jnp.uint32(_SENT))
    hi, lo = jnp.broadcast_arrays(hi, lo)
    return count_unique(hi.ravel(), lo.ravel(), capacity=capacity)


def _strip_worklist(seg_lo: np.ndarray, seg_len: np.ndarray,
                    nt_b: np.ndarray, n_units: np.ndarray, d: int,
                    T: int, Kp: int, tile_a: int, tile_b: int):
    """Worklist of populated (A-segment-tile, B-cloud-tile) pairs at unit
    distance d for one strip.

    seg_lo/seg_len: (R, T) start offset and length of each cloud row's
    contiguous strip segment (rows are sorted, so a strip's elements form
    one slice — computed on the host from value-threshold counts).
    nt_b: (R, T) full-cloud B tile counts (ceil(size/tile_b)). Returns
    (base_a, base_b) int32 flat offsets, or None if empty. Pure
    vectorized numpy; strip membership is exact by construction, so no
    cross-strip duplication of work."""
    if d >= T:
        return None
    na = (-(-seg_len[:, :T - d] // tile_a)).astype(np.int64)
    nb = nt_b[:, d:].astype(np.int64)
    ok = (np.arange(T - d, dtype=np.int64)[None, :] + d
          ) < n_units[:, None]
    cnt = np.where(ok, na * nb, 0).ravel()       # per (r, t) tile pairs
    tot = int(cnt.sum())
    if tot == 0:
        return None
    nz = np.flatnonzero(cnt)
    reps = cnt[nz]
    src = np.repeat(nz, reps)                    # flat (r, t) per entry
    off = np.cumsum(reps) - reps
    rank = np.arange(tot, dtype=np.int64) - np.repeat(off, reps)
    nb_e = nb.ravel()[src]
    ia = rank // nb_e
    ib = rank - ia * nb_e
    r = src // (T - d)
    t = src - r * (T - d)
    base_a = (r * T + t) * Kp + seg_lo[:, :T - d].ravel()[src] \
        + ia * tile_a
    base_b = (r * T + t + d) * Kp + ib * tile_b
    return base_a.astype(np.int32), base_b.astype(np.int32)


def estimate_pair_capacity(clouds_tensor: np.ndarray,
                           n_units: np.ndarray,
                           config: KmerRecruitmentConfig,
                           *, cap: int = 1 << 26) -> int:
    """Static table capacity from cloud-size statistics: the distinct
    (i, j, d) key count is bounded by the total pair-observation count
    sum_r sum_d sum_t |cloud_t||cloud_{t+d}|, computable from the cloud
    sizes alone. Pre-sizing from this bound gives one compile per shape —
    no recompile-on-doubling at production scale."""
    total = _pair_obs_bound(clouds_tensor, n_units, config)
    return 1 << max(16, int(np.ceil(np.log2(max(min(total, cap), 2)))))


def _strip_sweep(
    clouds_tensor: np.ndarray,        # (R, T, K) int32, -1 padded
    n_units: np.ndarray,              # (R,) int32
    config: KmerRecruitmentConfig,
    *,
    capacity: Optional[int] = None,
    tile_a: int = 8,
    tile_b: int = 32,
    entry_chunk: Optional[int] = None,
    element_budget: int = 64 << 20,
    strip_capacity: int = 1 << 25,
    mesh=None,
):
    """Yield one sorted (i, j, d) -> count device table per i-range strip,
    strips in ascending i order (so concatenating valid prefixes yields
    the globally sorted table).

    The key space is striped by i so each strip's table is bounded. Strip
    membership is exact by construction: cloud rows are sorted, so a
    strip's elements within a row form one contiguous segment whose
    bounds the host reads off value-threshold counts — A-tiles slice the
    segment (tile_a wide), B-tiles the full partner cloud (tile_b wide),
    and no tile is ever emitted to more than one strip (value-range
    routing would re-emit wide-spread tiles to ~every strip at production
    scale). Chunks stream through fixed device shapes and merge into an
    on-device accumulator — only the run-count scalar syncs to host per
    merge. Doubling on overflow is the fallback; the pair-observation
    bound sizes strips so it rarely fires."""
    R, T, K = clouds_tensor.shape
    # key packing is (i) x ((j << 8) | d) and the filter regroups by
    # (i << 24) | j — both alias silently if these bounds are exceeded
    if config.max_distance >= 256:
        raise ValueError(
            f"max_distance {config.max_distance} >= 256 overflows the "
            "8-bit distance field of the packed key")
    max_idx = int(clouds_tensor.max()) if clouds_tensor.size else 0
    if max_idx >= 1 << 24:
        raise ValueError(
            "rare k-mer index >= 2^24 overflows the packed pair key")
    bound = _pair_obs_bound(clouds_tensor, n_units, config)
    if capacity is None:
        capacity = 1 << max(
            16, int(np.ceil(np.log2(max(min(bound, strip_capacity), 2)))))
    n_strips = max(1, -(-bound // max(capacity, 1)))
    strip_w = max(1, -(-(max_idx + 1) // n_strips))
    n_strips = max(1, -(-(max_idx + 1) // strip_w))

    n_dev = 1
    if mesh is not None and mesh.devices.size > 1:
        n_dev = int(mesh.devices.size)
    if entry_chunk is None:
        entry_chunk = max(1, element_budget // (tile_a * tile_b))
    entry_chunk = -(-entry_chunk // n_dev) * n_dev
    # tail chunks use a 16x smaller shape: per-strip remainders would
    # otherwise pad up to a full chunk each (S strips x chunk wasted keys)
    tail_chunk = max(n_dev, entry_chunk // 16)

    # flat cloud layout: tile_a of slack beyond the tile_b-aligned width
    # so A-tiles starting at any segment offset stay inside their own
    # row; one trailing all(-1) sentinel tile absorbs worklist padding
    Kp = -(-max(K, 1) // tile_b) * tile_b + tile_a
    flat_host = np.full((R, T, Kp), -1, np.int32)
    flat_host[:, :, :K] = clouds_tensor
    flat_host = np.concatenate(
        [flat_host.ravel(), np.full(max(tile_a, tile_b), -1, np.int32)])
    sent_base = R * T * Kp
    if int(np.int64(R) * T * Kp) + max(tile_a, tile_b) >= 1 << 31:
        raise ValueError("flat cloud tensor exceeds int32 addressing")

    if n_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        flat_dev = jax.device_put(flat_host, NamedSharding(mesh, P()))
    else:
        flat_dev = jax.device_put(flat_host)

    # per-cloud sizes / B tile counts, masked to live unit instances
    sizes = (clouds_tensor >= 0).sum(axis=2).astype(np.int64)  # (R, T)
    live = np.arange(T, dtype=np.int64)[None, :] < \
        np.asarray(n_units, np.int64)[:, None]
    sizes = np.where(live, sizes, 0)
    nt_b = -(-sizes // tile_b)
    d_hi = min(config.max_distance, T - 1)

    # per-strip contiguous segments of each sorted row: element counts
    # below each strip boundary (vectorized value-threshold count; rows
    # are sorted ascending with -1 padding at the back... -1 sorts as
    # "invalid", counted via the >= 0 mask)
    if n_strips > 1:
        bounds = np.arange(1, n_strips, dtype=np.int64) * strip_w
        vals = clouds_tensor.astype(np.int64)
        vmask = vals >= 0
        below = np.stack(
            [((vals < v) & vmask).sum(axis=2) for v in bounds],
            axis=2)                               # (R, T, S-1)
        zeros = np.zeros_like(sizes)[:, :, None]
        seg_los = np.concatenate([zeros, below], axis=2)      # (R, T, S)
        seg_his = np.concatenate([below, sizes[:, :, None]], axis=2)
    else:
        seg_los = np.zeros_like(sizes)[:, :, None]
        seg_his = sizes[:, :, None]

    sharded_steps = {}

    def run_chunk(a, b, dv, s_lo, s_hi):
        """One worklist chunk -> (table, cap). The chunk table is sized to
        the chunk's key volume (not the strip capacity): when the table
        has a slot per emitted key, overflow is impossible and NO host
        sync happens — the result streams into the merge forest with the
        transfer still in flight."""
        nonlocal capacity
        keys = len(a) * tile_a * tile_b
        cap = min(_next_pow2(keys), capacity)
        while True:
            if n_dev > 1:
                from centroflye_tpu.parallel.mesh import (
                    make_pair_table_step)
                key = (len(a), cap)
                if key not in sharded_steps:
                    sharded_steps[key] = make_pair_table_step(
                        mesh, tile_a=tile_a, tile_b=tile_b, capacity=cap)
                uhi, ulo, cnt, n = sharded_steps[key](
                    flat_dev, a, b, dv, jnp.int32(s_lo), jnp.int32(s_hi))
            else:
                uhi, ulo, cnt, n = _pairs_from_tiles(
                    flat_dev, a, b, dv, jnp.int32(s_lo), jnp.int32(s_hi),
                    tile_a=tile_a, tile_b=tile_b, capacity=cap)
            if cap >= keys or int(n) <= cap:
                return (uhi, ulo, cnt), cap
            cap *= 2
            if cap > capacity:
                capacity = cap

    logger.info(
        "distance sweep: %d strip(s), tiles (%d, %d), capacity %d, "
        "pair-obs bound %d", n_strips, tile_a, tile_b, capacity, bound)
    yielded = False
    for s in range(n_strips):
        t_strip = time.perf_counter()
        s_lo = s * strip_w
        s_hi = (s + 1) * strip_w if n_strips > 1 else max(max_idx + 1, 1)
        seg_lo = seg_los[:, :, s]
        seg_len = seg_his[:, :, s] - seg_lo
        wls = []
        for d in range(config.min_distance, d_hi + 1):
            wl = _strip_worklist(seg_lo, seg_len, nt_b, n_units, d,
                                 T, Kp, tile_a, tile_b)
            if wl is None:
                continue
            wls.append(wl + (np.full(len(wl[0]), d, np.int32),))
        if not wls:
            continue
        a = np.concatenate([w[0] for w in wls])
        b = np.concatenate([w[1] for w in wls])
        dv = np.concatenate([w[2] for w in wls])

        # binary-counter merge forest: chunk tables enter at their own
        # (power-of-two) capacity and same-sized tables merge pairwise
        # upward, so total merge cost is O(keys * log levels) — NOT
        # O(chunks * strip_capacity) as a single running accumulator
        # would cost. Sub-capacity merges cannot overflow (out capacity
        # = sum of input capacities), so they need NO host sync; only
        # capacity-saturated merges check-and-double.
        forest: Dict[int, tuple] = {}

        def merge_pair(ta, cap_a, tb, cap_b):
            nonlocal capacity
            out = min(_next_pow2(cap_a + cap_b), capacity)
            while True:
                m = merge_count_tables(ta[0], ta[1], ta[2],
                                       tb[0], tb[1], tb[2], capacity=out)
                if out >= cap_a + cap_b or int(m[3]) <= out:
                    return (m[0], m[1], m[2]), out
                out *= 2
                if out > capacity:
                    capacity = out

        def insert(t, cap):
            while cap in forest:
                other = forest.pop(cap)
                t, cap = merge_pair(other, cap, t, cap)
            forest[cap] = t

        pos = 0
        while pos < len(a):
            size = entry_chunk if len(a) - pos >= entry_chunk else \
                tail_chunk
            ca, cb, cd = (a[pos:pos + size], b[pos:pos + size],
                          dv[pos:pos + size])
            pos += size
            if len(ca) < size:
                padn = size - len(ca)
                ca = np.concatenate(
                    [ca, np.full(padn, sent_base, np.int32)])
                cb = np.concatenate(
                    [cb, np.full(padn, sent_base, np.int32)])
                cd = np.concatenate([cd, np.zeros(padn, np.int32)])
            t, cap = run_chunk(ca, cb, cd, s_lo, s_hi)
            insert(t, cap)

        # fold surviving forest levels (ascending) into one table
        acc, acc_cap, n = None, 0, 0
        for cap in sorted(forest):
            if acc is None:
                acc, acc_cap = forest[cap], cap
            else:
                acc, acc_cap = merge_pair(acc, acc_cap, forest[cap], cap)
        if acc is not None:
            n = int(jnp.sum((acc[0] != jnp.uint32(_SENT))
                            .astype(jnp.int32)))
        logger.info(
            "distance strip %d/%d [%d, %d): %d entries, %d distinct, "
            "%.1fs", s + 1, n_strips, s_lo, s_hi, len(a), n,
            time.perf_counter() - t_strip)
        if acc is not None and n:
            yielded = True
            yield acc[0], acc[1], acc[2], n, acc_cap
    if not yielded:
        e = jnp.full(capacity, _SENT, jnp.uint32)
        yield e, e, jnp.zeros(capacity, jnp.int32), 0, capacity


def _pair_obs_bound(clouds_tensor, n_units, config) -> int:
    sizes = (clouds_tensor >= 0).sum(axis=2).astype(np.int64)   # (R, T)
    pos = np.arange(sizes.shape[1])[None, :]
    sizes = np.where(pos < np.asarray(n_units)[:, None], sizes, 0)
    total = 0
    for d in range(config.min_distance, config.max_distance + 1):
        if d >= sizes.shape[1]:
            break
        total += int((sizes[:, :-d] * sizes[:, d:]).sum())
    return total


def build_distance_table(
    clouds_tensor: np.ndarray,        # (R, T, K) int32, -1 padded
    n_units: np.ndarray,              # (R,) int32
    config: KmerRecruitmentConfig,
    *,
    capacity: Optional[int] = None,
    tile_a: int = 8,
    tile_b: int = 32,
    entry_chunk: Optional[int] = None,
    element_budget: int = 64 << 20,
    strip_capacity: int = 1 << 25,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Full (i, j, d) -> count table over all reads and distances,
    MATERIALIZED to host numpy (use recruit_unique_kmers for the
    production path — it filters each strip on device and never
    materializes the table).

    Returns (uhi, ulo, counts, n) sorted by (i, j, d), arrays of length
    n; decode with i = uhi, j = ulo >> 8, d = ulo & 0xFF.
    """
    parts = []
    total = 0
    for uhi, ulo, cnt, n, _cap in _strip_sweep(
            clouds_tensor, n_units, config, capacity=capacity,
            tile_a=tile_a, tile_b=tile_b,
            entry_chunk=entry_chunk, element_budget=element_budget,
            strip_capacity=strip_capacity, mesh=mesh):
        if n:
            parts.append((np.asarray(uhi[:n]), np.asarray(ulo[:n]),
                          np.asarray(cnt[:n])))
            total += n
    if not parts:
        e = np.empty(0, np.uint32)
        return e, e.copy(), np.empty(0, np.int32), 0
    return (np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]), total)


@dataclasses.dataclass
class DistanceEdges:
    """Surviving distance-consistent edges + their endpoint k-mer indices."""

    # parallel arrays of surviving edges
    dist: np.ndarray      # int32
    i: np.ndarray         # int64 k-mer index
    j: np.ndarray         # int64 k-mer index
    freq: np.ndarray      # int64
    unique_kmer_indices: np.ndarray   # sorted int64


def filter_dist_tuples(
    uhi: np.ndarray, ulo: np.ndarray, counts: np.ndarray, n: int,
    config: KmerRecruitmentConfig,
) -> DistanceEdges:
    """Distance-consistency filter (reference
    distance_based_kmer_recruitment.py:131-149): keep (i, j, d) iff
    count >= min_coverage and count / sum_d'(count(i, j, d')) >= 0.8."""
    if n == 0:
        e = np.empty(0, np.int64)
        return DistanceEdges(dist=np.empty(0, np.int32), i=e, j=e.copy(),
                             freq=e.copy(), unique_kmer_indices=e.copy())
    i_all = uhi[:n].astype(np.int64)
    j_all = (ulo[:n] >> np.uint32(8)).astype(np.int64)
    d_all = (ulo[:n] & np.uint32(0xFF)).astype(np.int64)
    c_all = counts[:n].astype(np.int64)
    # group by (i, j): table sorted by (i, j, d) so groups are contiguous
    pair_key = (i_all << np.int64(24)) | j_all
    starts = np.concatenate([[True], pair_key[1:] != pair_key[:-1]])
    group = np.cumsum(starts) - 1
    all_occ = np.zeros(group[-1] + 1 if n else 0, np.int64)
    np.add.at(all_occ, group, c_all)
    keep = (c_all >= config.min_coverage) & \
        (c_all / np.maximum(all_occ[group], 1) >= config.rel_threshold)
    sel_i = i_all[keep]
    sel_j = j_all[keep]
    uniq = np.unique(np.concatenate([sel_i, sel_j])) if keep.any() \
        else np.empty(0, np.int64)
    return DistanceEdges(
        dist=d_all[keep].astype(np.int32), i=sel_i, j=sel_j,
        freq=c_all[keep], unique_kmer_indices=uniq)


@functools.partial(jax.jit, static_argnames=("use_frac", "out_capacity"))
def _filter_table_device(uhi, ulo, cnt, min_cov, num, den, rel,
                         *, use_frac: bool, out_capacity: int):
    """Distance-consistency filter of one sorted strip table, ON DEVICE
    (reference distance_based_kmer_recruitment.py:131-149): keep (i, j, d)
    iff count >= min_coverage and count / sum_d'(count(i, j, d')) >=
    rel_threshold. Groups (i, j) are contiguous (table sorted by (i,j,d))
    and never straddle a strip (strips partition by i), so the filter is
    strip-local and exact. When rel_threshold equals a small exact
    fraction num/den (e.g. the default 0.8 = 4/5), the ratio test is the
    integer cross-multiplication count*den >= all_occ*num — no float
    rounding at the boundary. Returns compacted (i, j, d, freq) edge
    arrays + the surviving-edge count."""
    capacity = uhi.shape[0]
    valid = uhi != SENTINEL
    j = ulo >> jnp.uint32(8)
    gstart = jnp.concatenate([
        jnp.ones((1,), jnp.bool_),
        (uhi[1:] != uhi[:-1]) | (j[1:] != j[:-1])]) & valid
    gid = jnp.maximum(jnp.cumsum(gstart.astype(jnp.int32)) - 1, 0)
    cnt_v = jnp.where(valid, cnt, 0)
    all_occ = jax.ops.segment_sum(
        cnt_v, gid, num_segments=capacity)[gid]
    if use_frac:
        ok_rel = cnt_v * den >= all_occ * num
    else:
        ok_rel = cnt_v.astype(jnp.float32) >= \
            rel * all_occ.astype(jnp.float32)
    keep = valid & (cnt_v >= min_cov) & ok_rel
    n_keep = jnp.sum(keep.astype(jnp.int32))
    pos = jnp.argsort(~keep, stable=True).astype(jnp.int32)
    if pos.shape[0] < out_capacity:
        pos = jnp.concatenate(
            [pos, jnp.zeros((out_capacity - pos.shape[0],), jnp.int32)])
    else:
        pos = pos[:out_capacity]
    is_e = jnp.arange(out_capacity, dtype=jnp.int32) < n_keep
    out_i = jnp.where(is_e, uhi[pos], jnp.uint32(_SENT))
    out_j = jnp.where(is_e, j[pos], jnp.uint32(_SENT))
    out_d = jnp.where(is_e, ulo[pos] & jnp.uint32(0xFF), jnp.uint32(0))
    out_c = jnp.where(is_e, cnt[pos], 0)
    return out_i, out_j, out_d, out_c, n_keep


def _rel_fraction(rel: float):
    """(num, den, exact) — an exact small-fraction representation of the
    rel threshold when one exists (the default 0.8 -> 4/5)."""
    from fractions import Fraction
    fr = Fraction(rel).limit_denominator(64)
    return fr.numerator, fr.denominator, float(fr) == float(rel)


def recruit_unique_kmers(
    clouds_tensor: np.ndarray,
    n_units: np.ndarray,
    rare_codes: np.ndarray,
    config: KmerRecruitmentConfig,
    *,
    capacity: Optional[int] = None,
    entry_chunk: Optional[int] = None,
    edge_capacity: int = 1 << 18,
    mesh=None,
) -> Tuple[np.ndarray, DistanceEdges]:
    """End-to-end: strip-swept distance table -> per-strip ON-DEVICE
    filter -> unique k-mer codes (sorted uint64) + surviving edges.
    The (i, j, d) count table is never materialized to the host — only
    the surviving edges cross the link (a few MB at production scale vs
    GBs for the table)."""
    if len(rare_codes) >= 1 << 24:
        raise ValueError(
            "rare k-mer table >= 2^24 entries overflows the packed pair key")
    num, den, exact = _rel_fraction(config.rel_threshold)
    parts = []
    for uhi, ulo, cnt, n, _cap in _strip_sweep(
            clouds_tensor, n_units, config,
            capacity=capacity, entry_chunk=entry_chunk, mesh=mesh):
        if n == 0:
            continue
        out_cap = edge_capacity
        while True:
            oi, oj, od, oc, n_keep = _filter_table_device(
                uhi, ulo, cnt, jnp.int32(config.min_coverage),
                jnp.int32(num), jnp.int32(den),
                jnp.float32(config.rel_threshold),
                use_frac=exact, out_capacity=out_cap)
            n_keep = int(n_keep)
            if n_keep <= out_cap:
                break
            out_cap *= 2
        if n_keep:
            parts.append((np.asarray(oi[:n_keep]).astype(np.int64),
                          np.asarray(oj[:n_keep]).astype(np.int64),
                          np.asarray(od[:n_keep]).astype(np.int64),
                          np.asarray(oc[:n_keep]).astype(np.int64)))
    if not parts:
        e = np.empty(0, np.int64)
        edges = DistanceEdges(dist=np.empty(0, np.int32), i=e, j=e.copy(),
                              freq=e.copy(), unique_kmer_indices=e.copy())
        return rare_codes[edges.unique_kmer_indices], edges
    sel_i = np.concatenate([p[0] for p in parts])
    sel_j = np.concatenate([p[1] for p in parts])
    sel_d = np.concatenate([p[2] for p in parts])
    sel_c = np.concatenate([p[3] for p in parts])
    uniq = np.unique(np.concatenate([sel_i, sel_j]))
    edges = DistanceEdges(dist=sel_d.astype(np.int32), i=sel_i, j=sel_j,
                          freq=sel_c, unique_kmer_indices=uniq)
    unique_codes = rare_codes[edges.unique_kmer_indices]
    return np.sort(unique_codes), edges
