"""Rare k-mer recruitment (stage 1 of unique-k-mer selection).

Reference behavior (distance_based_kmer_recruitment.py:39-82): count k=19-mers
over each read's tandem alignment; a k-mer is discarded once it occurs more
than once within a read in more than max_nonuniq=3 reads; surviving k-mers
keep frequency = number of reads containing them; "rare" k-mers are those
with frequency in [bottom*coverage*survival_rate, top*coverage*survival_rate].

The reference's sequential dict accumulation is order-independent in its
final result (a k-mer survives iff |{reads with in-read freq > 1}| <=
max_nonuniq, with frequency |{reads containing it}|), which is exactly what
ops/kmers.count_read_kmer_stats computes by sort/segment-reduce — so this
stage is a batched device computation with an associative cross-batch merge
(and a psum-style cross-device merge in the sharded path).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from centroflye_tpu.config import KmerRecruitmentConfig
from centroflye_tpu.io.encoding import encode_batch, join_u64
from centroflye_tpu.ops.kmers import (
    pack_kmers, count_read_kmer_stats, merge_count_tables, table_to_numpy,
    SENTINEL,
)


def _iter_batches(seqs: Sequence[str], batch_rows: int, pad_to: int):
    """Fixed-shape batches: rows always batch_rows (empty-padded), columns
    always the GLOBAL max length rounded to pad_to — one shape for the
    whole sweep, one (remote) compile. Short rows cost only masked-out
    windows on device; a per-batch shape would cost a fresh compile."""
    L = max((len(s) for s in seqs), default=1)
    L = max(pad_to, -(-L // pad_to) * pad_to)
    for i in range(0, len(seqs), batch_rows):
        chunk = list(seqs[i:i + batch_rows])
        if len(chunk) < batch_rows and len(seqs) > batch_rows:
            chunk += [""] * (batch_rows - len(chunk))
        codes, lens = encode_batch(chunk, max_len=L)
        yield i, codes, lens


@jax.jit
def _stack2(a, b):
    return jnp.stack([a.astype(jnp.int32), b.astype(jnp.int32)], axis=1)


def read_kmer_table(
    seqs: Sequence[str],
    k: int,
    *,
    batch_rows: int = 64,
    capacity: int | None = None,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(codes uint64, n_reads, n_multi) over all sequences: for each distinct
    k-mer, the number of sequences containing it and the number containing it
    more than once. Device-computed per batch, merged associatively; with a
    `mesh` (jax.sharding.Mesh), batch rows shard over the data axis and the
    per-shard tables merge with all_gather + fold over ICI
    (parallel/mesh.make_stats_count_step) — results are bit-identical to
    the single-device path."""
    if not len(seqs):
        return (np.empty(0, np.uint64), np.empty(0, np.int64),
                np.empty(0, np.int64))
    total_windows = sum(max(0, len(s) - k + 1) for s in seqs)
    if capacity is None:
        # distinct k-mers are far fewer than total windows at production
        # scale (reads resample the same genome); start at a bounded
        # estimate and let the doubling fallback below correct upward
        capacity = 1 << max(
            8, int(np.ceil(np.log2(max(min(total_windows, 1 << 24), 2)))))

    step = None
    n_dev = 1
    if mesh is not None and mesh.devices.size > 1:
        from centroflye_tpu.parallel.mesh import make_stats_count_step
        step = make_stats_count_step(mesh, k, capacity)
        n_dev = int(mesh.devices.size)
        batch_rows = -(-batch_rows // n_dev) * n_dev

    acc = None  # (uhi, ulo, counts2, n)
    for row0, codes, lens in _iter_batches(seqs, batch_rows, 256):
        rid_rows = (np.arange(codes.shape[0], dtype=np.int32)[:, None]
                    + row0)
        while True:
            if step is not None:
                from centroflye_tpu.parallel.mesh import pad_rows
                codes_p = pad_rows(codes, n_dev, 4)
                lens_p = pad_rows(lens, n_dev, 0)
                rid_p = pad_rows(rid_rows, n_dev, 0)
                uhi, ulo, cnt2, n = step(codes_p, lens_p, rid_p)
            else:
                hi, lo, _ = pack_kmers(codes, lens, k=k)
                rid = np.broadcast_to(rid_rows, hi.shape)
                uhi, ulo, n_reads, n_multi, n = count_read_kmer_stats(
                    hi, lo, np.ascontiguousarray(rid), capacity=capacity)
                cnt2 = _stack2(n_reads, n_multi)
            if int(n) <= capacity:
                break
            capacity *= 2
            if step is not None:
                from centroflye_tpu.parallel.mesh import (
                    make_stats_count_step)
                step = make_stats_count_step(mesh, k, capacity)
        # the accumulator stays ON DEVICE across the sweep — only the
        # run-count scalar syncs per merge (materializing capacity-sized
        # tables per batch moves ~100MB each way through the host link)
        if acc is None:
            acc = (uhi, ulo, cnt2, int(n))
        else:
            while True:
                muhi, mulo, mcnt, mn = merge_count_tables(
                    acc[0], acc[1], acc[2], uhi, ulo, cnt2,
                    capacity=capacity)
                if int(mn) <= capacity:
                    break
                capacity *= 2
            acc = (muhi, mulo, mcnt, int(mn))

    uhi, ulo, cnt, n = acc
    codes_u64, counts = table_to_numpy(uhi, ulo, cnt, n)
    return codes_u64, counts[:, 0].astype(np.int64), \
        counts[:, 1].astype(np.int64)


def get_rare_kmers(
    seqs: Sequence[str],
    config: KmerRecruitmentConfig,
    coverage: int,
    *,
    batch_rows: int = 64,
    mesh=None,
) -> np.ndarray:
    """Sorted uint64 codes of rare k-mers (reference
    distance_based_kmer_recruitment.py:66-82 semantics, including the float
    band [bottom*coverage*survival, top*coverage*survival])."""
    codes, n_reads, n_multi = read_kmer_table(
        seqs, config.k, batch_rows=batch_rows, mesh=mesh)
    survive = n_multi <= config.max_nonuniq
    left = config.bottom * coverage * config.kmer_survival_rate
    right = config.top * coverage * config.kmer_survival_rate
    rare = survive & (n_reads >= left) & (n_reads <= right)
    return codes[rare]
