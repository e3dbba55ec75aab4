"""Monomer decomposition of reads (in-repo StringDecomposer replacement).

The reference depends on the external StringDecomposer submodule to
translate each centromeric read into a sequence of monomer alignments
(~9h on 50 threads for cen6, reference README.md:184-196; output TSV parsed
by sd_parser.py:158-192). Here decomposition is a batched device
computation: all reads advance in LOCKSTEP through a chain of anchored
alignments — each step aligns every monomer (both strands, 2n queries with
per-row Peq tables and per-row lengths) against each active read's current
window with the Myers kernel in SHW mode (anchored start, free end), picks
the best-scoring monomer, emits the call, and advances to the alignment end.
The first step uses HW mode (free start) to lock onto the monomer phase.

Output rows are (monomer_sym, r_st, r_en, reliability) per read — exactly
the information content of the SD TSV, feeding SDReport.from_decomposition.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from centroflye_tpu.io.encoding import encode, revcomp, PAD
from centroflye_tpu.ops.myers import build_peq, myers_distance_batch


@dataclasses.dataclass
class MonomerDecomposerConfig:
    # reliability: best distance <= max_divergence * monomer_len -> '+'
    max_divergence: float = 0.45
    # lockstep batch of reads
    batch_reads: int = 32
    # window slack beyond the longest monomer
    slack: int = 64


class MonomerDecomposer:
    def __init__(self, monomers: Dict[str, str],
                 config: MonomerDecomposerConfig | None = None,
                 mesh=None):
        """mesh: optional jax.sharding.Mesh — the lockstep alignment
        batches (read x monomer rows) shard over its data axis
        (parallel/mesh.make_perrow_myers_step); results are bit-identical
        to the single-device path."""
        self.config = config or MonomerDecomposerConfig()
        self.mesh = mesh if (mesh is not None
                             and mesh.devices.size > 1) else None
        self._mesh_steps = {}
        self.names = list(monomers.keys())
        self.n = len(self.names)
        seqs = list(monomers.values())
        self.max_m = max(len(s) for s in seqs)
        self.mean_len = float(np.mean([len(s) for s in seqs]))
        # queries: n forward + n reverse-complement monomers
        peqs = []
        ms = []
        for s in seqs:
            peqs.append(build_peq(encode(s), m=self.max_m))
            ms.append(len(s))
        for s in seqs:
            peqs.append(build_peq(revcomp(encode(s)), m=self.max_m))
            ms.append(len(s))
        self.peqs = np.stack(peqs)          # (2n, 5, W)
        self.ms = np.array(ms, np.int32)    # (2n,)
        self.window = self.max_m + self.config.slack

    def _device_batch(self, windows: np.ndarray, lens: np.ndarray,
                      mode: str, collect: str = "best"):
        """Run the (R*Q)-row lockstep alignment batch, sharded over the
        mesh data axis when one is present (read rows padded to a device
        multiple; padding rows have zero length, so their results are
        inert and sliced away)."""
        R = windows.shape[0]
        Q = 2 * self.n
        Rp = R
        if self.mesh is not None:
            n_dev = int(self.mesh.devices.size)
            Rp = -(-R // n_dev) * n_dev
            if Rp != R:
                windows = np.concatenate(
                    [windows,
                     np.full((Rp - R, windows.shape[1]), PAD, np.int8)])
                lens = np.concatenate(
                    [lens, np.zeros(Rp - R, np.int32)])
        texts = np.repeat(windows, Q, axis=0)            # (Rp*Q, window)
        tlens = np.repeat(lens, Q)
        peqs = np.tile(self.peqs, (Rp, 1, 1))
        ms = np.tile(self.ms, Rp)
        if self.mesh is not None:
            key = (mode, collect)
            step = self._mesh_steps.get(key)
            if step is None:
                from centroflye_tpu.parallel.mesh import (
                    make_perrow_myers_step)
                step = make_perrow_myers_step(
                    self.mesh, self.max_m, mode, collect)
                self._mesh_steps[key] = step
            out = step(peqs, texts, tlens, ms)
        else:
            out = myers_distance_batch(
                peqs, texts, tlens, m=self.max_m, mode=mode, ms=ms,
                collect=collect)
        return out, R, Q

    def _step(self, windows: np.ndarray, lens: np.ndarray, mode: str):
        """One lockstep alignment step: windows (R, window) int8 ->
        per-read best (query_index, dist, end)."""
        out, R, Q = self._device_batch(windows, lens, mode)
        dist = np.asarray(out["dist"])[:R * Q].reshape(R, Q)
        end = np.asarray(out["end"])[:R * Q].reshape(R, Q)
        # normalized distance for fair comparison across monomer lengths
        norm = dist / np.maximum(self.ms[None, :], 1)
        best_q = np.argmin(norm, axis=1)
        rows = np.arange(R)
        return best_q, dist[rows, best_q], end[rows, best_q]

    def _first_step(self, windows: np.ndarray, lens: np.ndarray,
                    tol: float = 0.05):
        """Phase-locking step: HW (free start) but choosing the EARLIEST
        near-optimal alignment end, not the global best — otherwise a
        slightly noisier first monomer instance would be skipped in favor
        of a cleaner later one."""
        out, R, Q = self._device_batch(windows, lens, "HW", collect="all")
        scores = np.asarray(out["scores"])[:R * Q].reshape(R, Q, -1)
        norm = scores / np.maximum(self.ms[None, :, None], 1)
        best_q = np.zeros(R, np.int64)
        best_d = np.zeros(R, np.int64)
        best_e = np.full(R, -1, np.int64)
        for r in range(R):
            L = int(lens[r])
            if L == 0:
                continue
            col_min = norm[r, :, :L].min(axis=0)
            global_min = float(col_min.min())
            near = col_min <= global_min + tol
            # earliest LOCAL minimum among near-optimal columns (a column on
            # a still-descending slope is not an alignment end)
            left_ok = np.empty(L, bool)
            left_ok[0] = True
            left_ok[1:] = col_min[1:] <= col_min[:-1]
            right_ok = np.empty(L, bool)
            right_ok[-1] = True
            right_ok[:-1] = col_min[:-1] <= col_min[1:]
            candidates = np.nonzero(near & left_ok & right_ok)[0]
            if len(candidates) == 0:
                candidates = np.nonzero(near)[0]
            j = int(candidates[0])
            q = int(np.argmin(norm[r, :, j]))
            best_q[r] = q
            best_d[r] = int(scores[r, q, j])
            best_e[r] = j
        return best_q, best_d, best_e

    def decompose(self, reads: Iterable[Tuple[str, str]]
                  ) -> Dict[str, List[Tuple[int, int, int, str]]]:
        """Returns {r_id: [(sym, r_st, r_en, reliability), ...]} with sym in
        [0, n) forward / [n, 2n) reverse."""
        out: Dict[str, List[Tuple[int, int, int, str]]] = {}
        reads = list(reads)
        B = self.config.batch_reads
        for b0 in range(0, len(reads), B):
            chunk = reads[b0:b0 + B]
            out.update(self._decompose_batch(chunk))
        return out

    def _decompose_batch(self, chunk):
        cfg = self.config
        Wlen = self.window
        codes = [encode(seq) for _, seq in chunk]
        r_lens = np.array([len(c) for c in codes], np.int32)
        R = len(chunk)
        pos = np.zeros(R, np.int64)
        rows: List[List[Tuple[int, int, int, str]]] = [[] for _ in range(R)]
        first = True
        # min remaining bases to bother aligning another monomer
        min_tail = int(self.mean_len * 0.5)
        while True:
            active = (pos + min_tail <= r_lens)
            if not active.any():
                break
            windows = np.full((R, Wlen), PAD, np.int8)
            wlens = np.zeros(R, np.int32)
            for r in np.nonzero(active)[0]:
                seg = codes[r][pos[r]:pos[r] + Wlen]
                windows[r, :len(seg)] = seg
                wlens[r] = len(seg)
            if first:
                mode = "HW"
                best_q, dist, end = self._first_step(windows, wlens)
            else:
                mode = "SHW"
                best_q, dist, end = self._step(windows, wlens, mode)
            first = False
            for r in np.nonzero(active)[0]:
                q = int(best_q[r])
                d = int(dist[r])
                e = int(end[r])
                mlen = int(self.ms[q])
                if e < 0:
                    # no alignment progress: emit a gap step
                    rows[r].append((q, int(pos[r]),
                                    int(pos[r]) + mlen, "-"))
                    pos[r] += mlen
                    continue
                if mode == "HW":
                    # free start: locate the instance start by its end
                    r_en = int(pos[r]) + e + 1
                    r_st = max(int(pos[r]), r_en - mlen)
                else:
                    r_st = int(pos[r])
                    r_en = int(pos[r]) + e + 1
                reliable = d <= cfg.max_divergence * mlen
                rows[r].append((q, r_st, r_en, "+" if reliable else "-"))
                pos[r] = r_en
        return {chunk[r][0]: rows[r] for r in range(R)}


def decompose_to_monostrings(monomers: Dict[str, str],
                             reads: Iterable[Tuple[str, str]],
                             config: MonomerDecomposerConfig | None = None,
                             max_gap: int = 100, mesh=None):
    """reads -> SDReport (monoreads) without the external tool."""
    from centroflye_tpu.mono.sd_parser import SDReport

    dec = MonomerDecomposer(monomers, config, mesh=mesh)
    records = dec.decompose(reads)
    return SDReport.from_decomposition(
        records, dec.names, max_gap=max_gap,
        mean_monomer_len=dec.mean_len)
