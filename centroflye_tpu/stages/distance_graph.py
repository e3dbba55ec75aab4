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
with ops/kmers.count_unique and merged associatively across read batches and
across devices (the merge is a concat + 2-key resort + segment-sum: exact,
deterministic, no hash collisions). Pair generation is a dense broadcast over
the padded cloud tensor (R, T, K): for each d, keys = clouds[:, :-d, :, None]
x clouds[:, d:, None, :] — all MXU/VPU-friendly regular work. The final
filter is a segmented reduction over (i, j) groups of the sorted table.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from centroflye_tpu.config import KmerRecruitmentConfig
from centroflye_tpu.ops.kmers import (
    count_unique, merge_count_tables, SENTINEL,
)

_SENT = 0xFFFFFFFF


@functools.partial(jax.jit, static_argnames=("n_d", "capacity", "max_d"))
def _pairs_at_distances(clouds: jnp.ndarray, n_units: jnp.ndarray,
                        d0: jnp.ndarray,
                        *, n_d: int, capacity: int, max_d: int):
    """Count (i, j, d) keys for distances d0..d0+n_d-1 over a padded cloud
    tensor in ONE kernel + ONE sort (fewer table merges: the merge cadence,
    not pair generation, dominates wall-clock).

    clouds: (R, T, K) int32 indices, -1 padded. Returns a sorted
    fixed-capacity key->count table (uhi, ulo, counts, n).
    """
    R, T, K = clouds.shape
    # d0 is a traced scalar so ONE compiled shape serves all distance
    # chunks (remote compiles are expensive); distances beyond max_d are
    # masked out. Padding must cover the largest slice start d0+i <= max_d:
    # dynamic_slice clamps out-of-range starts, so an undersized pad would
    # silently alias every distance chunk onto the pad-width offset (all
    # distances > pad width would read the wrong columns).
    pad = jnp.full((R, max(max_d, n_d), K), -1, jnp.int32)
    padded = jnp.concatenate([clouds, pad], axis=1)   # (R, T+max_d, K)
    pos = jnp.arange(T, dtype=jnp.int32)[None, None, :, None, None]
    nu = n_units[:, None, None, None, None]
    a = clouds[:, None, :, :, None]                   # (R, 1, T, K, 1)
    b = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(padded, d0 + i, T, axis=1)
         for i in range(n_d)], axis=1)                # (R, D, T, K)
    b = b[:, :, :, None, :]                           # (R, D, T, 1, K)
    ds = (d0 + jnp.arange(n_d, dtype=jnp.int32)
          )[None, :, None, None, None]
    valid = (a >= 0) & (b >= 0) & (a != b) & (pos + ds < nu) & \
        (ds <= max_d)
    hi = jnp.where(valid, a.astype(jnp.uint32) + jnp.uint32(0),
                   jnp.uint32(_SENT))
    lo = jnp.where(
        valid,
        (b.astype(jnp.uint32) << jnp.uint32(8)) | ds.astype(jnp.uint32),
        jnp.uint32(_SENT))
    hi, lo = jnp.broadcast_arrays(hi, lo)
    return count_unique(hi.ravel(), lo.ravel(), capacity=capacity)


def estimate_pair_capacity(clouds_tensor: np.ndarray,
                           n_units: np.ndarray,
                           config: KmerRecruitmentConfig,
                           *, cap: int = 1 << 24) -> int:
    """Static table capacity from cloud-size statistics: the distinct
    (i, j, d) key count is bounded by the total pair-observation count
    sum_r sum_d sum_t |cloud_t||cloud_{t+d}|, computable from the cloud
    sizes alone. Pre-sizing from this bound gives one compile per shape —
    no recompile-on-doubling at production scale."""
    sizes = (clouds_tensor >= 0).sum(axis=2).astype(np.int64)   # (R, T)
    pos = np.arange(sizes.shape[1])[None, :]
    sizes = np.where(pos < np.asarray(n_units)[:, None], sizes, 0)
    total = 0
    for d in range(config.min_distance, config.max_distance + 1):
        if d >= sizes.shape[1]:
            break
        total += int((sizes[:, :-d] * sizes[:, d:]).sum())
    return 1 << max(16, int(np.ceil(np.log2(max(min(total, cap), 2)))))


def build_distance_table(
    clouds_tensor: np.ndarray,        # (R, T, K) int32, -1 padded
    n_units: np.ndarray,              # (R,) int32
    config: KmerRecruitmentConfig,
    *,
    capacity: Optional[int] = None,
    batch_rows: Optional[int] = None,
    d_chunk: int = 8,
    element_budget: int = 256 << 20,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Full (i, j, d) -> count table over all reads and distances.

    Returns (uhi, ulo, counts, n) sorted by (i, j, d); decode with
    i = uhi, j = ulo >> 8, d = ulo & 0xFF.

    capacity defaults to the pair-observation bound
    (estimate_pair_capacity: a true upper bound on distinct keys, so no
    recompiles) and still grows automatically (powers of two) if given
    too small explicitly. batch_rows defaults to fitting
    ``element_budget`` raw pair keys per kernel call (R * n_d * T * K^2
    elements). With a `mesh`, batch rows shard over the data axis and
    per-shard tables merge over ICI (parallel/mesh.make_pair_table_step)
    — bit-identical to the single-device path.
    """
    R, T, K = clouds_tensor.shape
    # key packing is (i) x ((j << 8) | d) and the filter regroups by
    # (i << 24) | j — both alias silently if these bounds are exceeded
    if config.max_distance >= 256:
        raise ValueError(
            f"max_distance {config.max_distance} >= 256 overflows the "
            "8-bit distance field of the packed key")
    if clouds_tensor.size and int(clouds_tensor.max()) >= 1 << 24:
        raise ValueError(
            "rare k-mer index >= 2^24 overflows the packed pair key")
    if capacity is None:
        capacity = estimate_pair_capacity(clouds_tensor, n_units, config)
    if batch_rows is None:
        per_row = max(1, d_chunk * T * K * K)
        batch_rows = max(1, min(R, element_budget // per_row))

    n_dev = 1
    sharded_step = None
    if mesh is not None and mesh.devices.size > 1:
        from centroflye_tpu.parallel.mesh import make_pair_table_step
        n_dev = int(mesh.devices.size)
        batch_rows = -(-batch_rows // n_dev) * n_dev
    acc = None

    def emit(batch, nu, d0, cap):
        nonlocal sharded_step
        while True:
            if n_dev > 1:
                from centroflye_tpu.parallel.mesh import (
                    make_pair_table_step, pad_rows)
                if sharded_step is None:
                    sharded_step = make_pair_table_step(
                        mesh, n_d=d_chunk, capacity=cap,
                        max_d=config.max_distance)
                batch_p = pad_rows(batch, n_dev, -1)
                nu_p = pad_rows(nu, n_dev, 0)
                uhi, ulo, cnt, n = sharded_step(batch_p, nu_p,
                                                jnp.int32(d0))
            else:
                uhi, ulo, cnt, n = _pairs_at_distances(
                    batch, nu, jnp.int32(d0), n_d=d_chunk, capacity=cap,
                    max_d=config.max_distance)
            if int(n) <= cap:
                return uhi, ulo, cnt, int(n), cap
            cap *= 2
            sharded_step = None

    # distances >= T have no (t, t+d) pairs at all — don't launch their
    # chunks (the production max_distance=150 usually exceeds the unit
    # count of most reads)
    d_hi = min(config.max_distance, max(T - 1, config.min_distance))
    for r0 in range(0, max(R, 1), batch_rows):
        batch = clouds_tensor[r0:r0 + batch_rows]
        nu = n_units[r0:r0 + batch_rows]
        if batch.shape[0] == 0:
            continue
        if batch.shape[0] < batch_rows and R > batch_rows:
            # pad the trailing short batch to the full batch shape: -1
            # clouds generate no keys, and one shape means one compile
            # (remote compiles cost ~30-90s each through the dev tunnel)
            short = batch.shape[0]
            batch = np.concatenate(
                [batch, np.full((batch_rows - short, T, K), -1,
                                np.int32)])
            nu = np.concatenate(
                [nu, np.zeros(batch_rows - short, np.int32)])
        for d0 in range(config.min_distance, d_hi + 1, d_chunk):
            uhi, ulo, cnt, n, capacity = emit(batch, nu, d0, capacity)
            if n == 0:
                continue
            # the accumulator stays ON DEVICE across the whole sweep —
            # only the run-count scalar syncs per merge. Materializing it
            # per merge would move ~3*capacity*4B each way per chunk
            # (hundreds of MB through a thin host link at production
            # scale), dwarfing the sort time.
            if acc is None:
                acc = (uhi, ulo, cnt, n)
            else:
                while True:
                    muhi, mulo, mcnt, mn = merge_count_tables(
                        acc[0], acc[1], acc[2], uhi, ulo, cnt,
                        capacity=capacity)
                    if int(mn) <= capacity:
                        break
                    capacity *= 2
                acc = (muhi, mulo, mcnt, int(mn))
    if acc is None:
        e = np.full(capacity, _SENT, np.uint32)
        return e, e.copy(), np.zeros(capacity, np.int32), 0
    return (np.asarray(acc[0]), np.asarray(acc[1]), np.asarray(acc[2]),
            int(acc[3]))


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


def recruit_unique_kmers(
    clouds_tensor: np.ndarray,
    n_units: np.ndarray,
    rare_codes: np.ndarray,
    config: KmerRecruitmentConfig,
    *,
    capacity: Optional[int] = None,
    batch_rows: Optional[int] = None,
    mesh=None,
) -> Tuple[np.ndarray, DistanceEdges]:
    """End-to-end: distance table -> filter -> unique k-mer codes (sorted
    uint64) + surviving edges."""
    if len(rare_codes) >= 1 << 24:
        raise ValueError(
            "rare k-mer table >= 2^24 entries overflows the packed pair key")
    uhi, ulo, cnt, n = build_distance_table(
        clouds_tensor, n_units, config,
        capacity=capacity, batch_rows=batch_rows, mesh=mesh)
    edges = filter_dist_tuples(uhi, ulo, cnt, n, config)
    unique_codes = rare_codes[edges.unique_kmer_indices]
    return np.sort(unique_codes), edges
