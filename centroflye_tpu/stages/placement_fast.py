"""Array-native greedy read placement (the production path).

Semantics are exactly the reference's greedy loop (reference
read_placer.py:42-94 + cloud_contig.py:85-95): one read placed per
iteration, winner = lexicographic max of ((score0, score1), position,
-r_id) over valid candidates, where
  score1[r, o] = number of processed (kmer, cc_pos) "frequent pairs"
                 matched by read r's cloud at t = cc_pos - o,
  score0[r, o] = number of distinct t with at least one match,
valid(score) = score0 >= min_unit and score1 >= min_inters and
score1 >= min_prop * score0. The processed-pair stream starts with the
snapshot {(kmer, pos): kmer globally frequent, pos in kmer_positions[kmer]}
(reference read_placer.py:54-58 — note: all positions of the k-mer, not
just positions where it is frequent) and is extended each iteration by the
placed read's newly-position-frequent pairs (cloud_contig.py:26-41); a pair
can legitimately appear in both, and then counts twice — a reference quirk
preserved for parity.

TPU-first design instead of the reference's dict-of-Counters scan:
- scores live in dense (R, P) int32 arrays; the initial bulk scoring is
  the bitmap popcount correlation kernel on device
  (ops/scoring.placement_scores) over k-mer-set bitmaps;
- per-iteration increments touch only the handful of (read, offset, unit)
  cells reached by the newly frequent pairs; score0's distinct-t condition
  is tracked with a lazy per-cell match-count cache;
- the winner argmax is O(R) per iteration through per-row best caches
  (scores only ever increase, so a row's cached best stays exact until
  the row is touched), or a jitted full (R, P) hierarchical argmax on
  device (`device_steps=True`) for chips where submission latency is
  cheap.

The dict implementation (stages/read_placer.ReadPlacer.add_reads) is kept
as the cross-checking oracle, the reference's own slow/fast verification
pattern (cloud_contig.py:146-155).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from centroflye_tpu.config import PlacerConfig
from centroflye_tpu.stages.cloud_contig import CloudContig
from centroflye_tpu.stages.kmer_cloud import ReadClouds

_NEG = np.int64(-1)


def _initial_pair_sets(contig: CloudContig) -> Dict[int, np.ndarray]:
    """pos -> sorted array of globally-frequent k-mers occurring at pos
    (the reference's initial freq_kmers snapshot, read_placer.py:54-58)."""
    per_pos: Dict[int, List[int]] = {}
    for kmer in contig.freq_kmers:
        for pos in contig.kmer_positions[kmer]:
            per_pos.setdefault(pos, []).append(kmer)
    return {pos: np.array(sorted(ks), dtype=np.int64)
            for pos, ks in per_pos.items()}


def _intersect_count(sorted_a: np.ndarray, sorted_b: np.ndarray) -> int:
    """|a & b| for sorted unique int arrays."""
    if len(sorted_a) == 0 or len(sorted_b) == 0:
        return 0
    if len(sorted_a) > len(sorted_b):
        sorted_a, sorted_b = sorted_b, sorted_a
    idx = np.searchsorted(sorted_b, sorted_a)
    idx = np.minimum(idx, len(sorted_b) - 1)
    return int(np.count_nonzero(sorted_b[idx] == sorted_a))


class FastPlacer:
    """One add_reads phase (internal or suffix reads) of the greedy loop."""

    def __init__(self, contig: CloudContig, reads: Sequence[str],
                 reads_clouds: Dict[str, ReadClouds],
                 config: PlacerConfig,
                 use_device_init: bool = True):
        self.contig = contig
        self.config = config
        self.ids: List[str] = list(reads)
        self.clouds = {r: reads_clouds[r] for r in self.ids}
        R = len(self.ids)
        # tie-break rank: smaller r_id (lexicographic) wins at equal
        # (score, position)
        order = sorted(range(R), key=lambda i: self.ids[i])
        self.lex_rank = np.empty(R, np.int64)
        for rank, i in enumerate(order):
            self.lex_rank[i] = rank

        self.T = max((self.clouds[r].n_units for r in self.ids), default=0)
        n_kmers = 0
        for r in self.ids:
            for c in self.clouds[r].clouds:
                if len(c):
                    n_kmers = max(n_kmers, int(c.max()) + 1)
        for kmer in contig.kmer_positions:
            n_kmers = max(n_kmers, int(kmer) + 1)
        self.n_kmers = n_kmers

        # inverted occurrence index: kmer -> (read row, unit t), sorted by
        # kmer for vectorized lookup
        occ_k: List[np.ndarray] = []
        occ_r: List[np.ndarray] = []
        occ_t: List[np.ndarray] = []
        for ri, r in enumerate(self.ids):
            for t, c in enumerate(self.clouds[r].clouds):
                if len(c):
                    occ_k.append(c.astype(np.int64))
                    occ_r.append(np.full(len(c), ri, np.int32))
                    occ_t.append(np.full(len(c), t, np.int32))
        if occ_k:
            k = np.concatenate(occ_k)
            srt = np.argsort(k, kind="stable")
            self.occ_kmer = k[srt]
            self.occ_read = np.concatenate(occ_r)[srt]
            self.occ_t = np.concatenate(occ_t)[srt]
        else:
            self.occ_kmer = np.empty(0, np.int64)
            self.occ_read = np.empty(0, np.int32)
            self.occ_t = np.empty(0, np.int32)

        self.P = int(contig.max_pos) + self.T + 2
        self.S0 = np.zeros((R, self.P), np.int32)
        self.S1 = np.zeros((R, self.P), np.int32)
        self.placed = np.zeros(R, bool)
        # lazy per-cell match-count cache for score0's distinct-t rule:
        # key (r, o, t) -> processed-pair hits; cells absent from the
        # cache fall back to the initial-snapshot intersection count
        self._cnt: Dict[int, int] = {}
        self._init_sets = _initial_pair_sets(contig)

        self._row_best_key = np.full(R, _NEG, np.int64)
        self._row_best_pos = np.full(R, -1, np.int64)

        self._score_init(use_device_init)
        self._rebuild_row_best(np.arange(R))

    # -- initial bulk scoring --------------------------------------------

    def _score_init(self, use_device: bool):
        R = len(self.ids)
        if R == 0:
            return
        if not self._init_sets:
            return
        max_pos = max(self._init_sets.keys())
        if use_device:
            self._score_init_device(max_pos)
        else:
            self._score_init_host(max_pos)

    def _score_init_host(self, max_pos: int):
        """Numpy mirror of the device bitmap scorer (oracle path)."""
        for ri, r in enumerate(self.ids):
            rc = self.clouds[r]
            for t, cloud in enumerate(rc.clouds):
                if not len(cloud):
                    continue
                c_sorted = np.sort(cloud.astype(np.int64))
                for pos, init_set in self._init_sets.items():
                    o = pos - t
                    if o < 0 or o >= self.P:
                        continue
                    n = _intersect_count(c_sorted, init_set)
                    if n:
                        self.S1[ri, o] += n
                        self.S0[ri, o] += 1

    def _score_init_device(self, max_pos: int):
        """Bulk (R, P) scoring on device: bitmap popcount correlation
        (ops/scoring.placement_scores) against the initial-snapshot
        bitmap; chunked over reads to bound the (R, T, W) bitmap size."""
        from centroflye_tpu.ops.scoring import (
            clouds_to_bitmaps, placement_scores)
        R = len(self.ids)
        W = max(1, -(-self.n_kmers // 32))
        P_bm = min(self.P, max_pos + 1)
        contig_bm = np.zeros((P_bm, W), np.uint32)
        for pos, ks in self._init_sets.items():
            if pos >= P_bm:
                continue
            # bitwise_or.at, not fancy-index |=: several k-mers share a
            # word and duplicate indices must all land
            np.bitwise_or.at(
                contig_bm[pos], ks // 32,
                (np.uint32(1) << (ks % 32).astype(np.uint32)
                 ).astype(np.uint32))
        # chunk reads so R_chunk * T * W uint32 stays ~64 MB
        chunk = max(1, (64 << 20) // max(1, 4 * self.T * W))
        K = max((len(c) for r in self.ids
                 for c in self.clouds[r].clouds), default=0)
        K = max(K, 1)
        tensor = np.full((R, self.T, K), -1, np.int32)
        for ri, r in enumerate(self.ids):
            for t, c in enumerate(self.clouds[r].clouds):
                tensor[ri, t, :len(c)] = c
        for r0 in range(0, R, chunk):
            bm = clouds_to_bitmaps(tensor[r0:r0 + chunk], self.n_kmers)
            s0, s1 = placement_scores(bm, contig_bm)
            self.S0[r0:r0 + chunk, :P_bm] = np.asarray(s0)
            self.S1[r0:r0 + chunk, :P_bm] = np.asarray(s1)

    # -- row-best cache ---------------------------------------------------

    def _valid_key(self, s0: np.ndarray, s1: np.ndarray) -> np.ndarray:
        """(score0, score1) packed as an int64 sort key; -1 = invalid."""
        cfg = self.config
        # s1 >= 1 mirrors the dict version's candidate domain: a score
        # entry exists only where at least one pair ever matched
        valid = (s1 >= 1) & (s0 >= cfg.min_unit) & \
            (s1 >= cfg.min_inters) & (s1 >= cfg.min_prop * s0)
        key = (s0.astype(np.int64) << np.int64(32)) | s1.astype(np.int64)
        return np.where(valid, key, _NEG)

    def _rebuild_row_best(self, rows: np.ndarray):
        for ri in np.unique(rows):
            key = self._valid_key(self.S0[ri], self.S1[ri])
            m = key.max() if key.size else _NEG
            if m < 0:
                self._row_best_key[ri] = _NEG
                self._row_best_pos[ri] = -1
            else:
                self._row_best_key[ri] = m
                self._row_best_pos[ri] = \
                    int(np.nonzero(key == m)[0][-1])   # rightmost best

    def _grow_P(self, needed: int):
        newP = max(needed + 1, self.P * 2)
        padded0 = np.zeros((self.S0.shape[0], newP), np.int32)
        padded1 = np.zeros((self.S0.shape[0], newP), np.int32)
        padded0[:, :self.P] = self.S0
        padded1[:, :self.P] = self.S1
        self.S0, self.S1, self.P = padded0, padded1, newP

    # -- incremental updates ---------------------------------------------

    def _base_cnt(self, ri: int, o: int, t: int) -> int:
        """Initial-snapshot match count of cell (read, offset, unit)."""
        init = self._init_sets.get(o + t)
        if init is None:
            return 0
        cloud = self.clouds[self.ids[ri]].clouds[t]
        return _intersect_count(np.sort(cloud.astype(np.int64)), init)

    def apply_pairs(self, pairs: Sequence[Tuple[int, int]]):
        """Process newly frequent (kmer, cc_pos) pairs; returns touched
        read rows."""
        touched = []
        for kmer, cc_pos in pairs:
            lo = np.searchsorted(self.occ_kmer, kmer, side="left")
            hi = np.searchsorted(self.occ_kmer, kmer, side="right")
            for idx in range(lo, hi):
                ri = int(self.occ_read[idx])
                t = int(self.occ_t[idx])
                o = cc_pos - t
                if o < 0:
                    continue
                if o >= self.P:
                    self._grow_P(o)
                ck = ((np.int64(ri) << np.int64(40))
                      | (np.int64(o) << np.int64(20)) | np.int64(t))
                cur = self._cnt.get(int(ck))
                if cur is None:
                    cur = self._base_cnt(ri, o, t)
                self._cnt[int(ck)] = cur + 1
                self.S1[ri, o] += 1
                if cur == 0:
                    self.S0[ri, o] += 1
                touched.append((ri, o))
        rows = []
        for ri, o in touched:
            key = self._valid_key(self.S0[ri, o:o + 1],
                                  self.S1[ri, o:o + 1])[0]
            if key > self._row_best_key[ri] or \
                    (key == self._row_best_key[ri] and key >= 0
                     and o > self._row_best_pos[ri]):
                self._row_best_key[ri] = key
                self._row_best_pos[ri] = o
            rows.append(ri)
        return rows

    # -- winner selection -------------------------------------------------

    def best_candidate(self) -> Optional[Tuple[str, int, Tuple[int, int]]]:
        """Lexicographic max of (score, position, -r_id) over unplaced
        reads; None when no valid candidate remains."""
        key = np.where(self.placed, _NEG, self._row_best_key)
        m = key.max() if key.size else _NEG
        if m < 0:
            return None
        rows = np.nonzero(key == m)[0]
        pos = self._row_best_pos[rows]
        best_pos = pos.max()
        rows = rows[pos == best_pos]
        ri = rows[np.argmin(self.lex_rank[rows])]
        s0 = int(m >> np.int64(32))
        s1 = int(m & np.int64(0xFFFFFFFF))
        return self.ids[int(ri)], int(best_pos), (s0, s1)

    def mark_placed(self, r_id: str):
        self.placed[self.ids.index(r_id)] = True

    # -- the greedy loop --------------------------------------------------

    def run(self) -> Tuple[Dict[str, Optional[int]],
                           Dict[str, Tuple[int, int]]]:
        placements: Dict[str, Optional[int]] = {}
        scores: Dict[str, Tuple[int, int]] = {}
        while not bool(self.placed.all()):
            best = self.best_candidate()
            if best is None:
                for ri, r in enumerate(self.ids):
                    if not self.placed[ri]:
                        placements[r] = None
                return placements, scores
            r_id, pos, sc = best
            placements[r_id] = pos
            scores[r_id] = sc
            self.mark_placed(r_id)
            new_freq = self.contig.add_read(self.clouds[r_id], position=pos)
            self.apply_pairs(new_freq)
        return placements, scores
