"""ELTR polisher: unit-space read placement -> polished nucleotide assembly.

Reference behavior (eltr_polisher.py:33-165): for every placed read and unit
index i, the read's unit instance covers global unit position pos+i (interior
units only, unless the read touches a contig end); per global position all
covering read-unit sequences are exported with the median-length one as
template, polished by 4 iterations of an external `flye --polish-target`
subprocess per position (hot loop #6), then per-iteration position sequences
are concatenated, successive iterations compared with edlib (plain and
homopolymer-compressed), and final_sequence_{i}.fasta (+_hpc_) written.

Here the per-position polishing is the in-repo deterministic consensus
(stages/consensus.polish_consensus) — no subprocesses — and the iteration
comparison uses the batched Myers kernel. Artifact names/formats match the
reference so downstream tooling can be pointed at either.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from centroflye_tpu.config import PolisherConfig
from centroflye_tpu.io import write_seqs
from centroflye_tpu.io.encoding import compress_homopolymer


def median_high(values: Sequence[int]) -> int:
    """statistics.median_high equivalent (reference eltr_polisher.py:83)."""
    s = sorted(values)
    return s[len(s) // 2]


def map_pos2read(
    placements: Dict[str, Optional[int]],
    unit_instances: Dict[str, List[str]],
    min_pos: int = 0,
    max_pos: float = math.inf,
) -> Dict[int, List[Tuple[str, int]]]:
    """Global unit position -> [(r_id, instance_index)] using interior units
    only, except for reads touching the contig ends
    (reference eltr_polisher.py:53-66)."""
    if max_pos == math.inf:
        max_pos = 0
        for r_id, pos in placements.items():
            if pos is None:
                continue
            max_pos = max(max_pos, pos + len(unit_instances[r_id]))
    pos2read: Dict[int, List[Tuple[str, int]]] = {}
    for r_id, pos in placements.items():
        if pos is None or pos > max_pos:
            continue
        ma = unit_instances[r_id]
        if pos == min_pos or pos + len(ma) == max_pos:
            positions = range(len(ma))
        else:
            positions = range(1, len(ma) - 1)
        for i in positions:
            if min_pos <= pos + i <= max_pos:
                pos2read.setdefault(pos + i, []).append((r_id, i))
    return pos2read


@dataclasses.dataclass
class PolishOutput:
    final_sequences: Dict[int, str]        # iteration -> assembly
    comparison: List[Tuple[int, int, int, int]]  # (i, i+1, dist, hpc_dist)


class EltrPolisher:
    def __init__(self, config: PolisherConfig | None = None):
        self.config = config or PolisherConfig()

    def polish_positions(
        self,
        pos2read: Dict[int, List[Tuple[str, int]]],
        unit_instances: Dict[str, List[str]],
    ) -> Dict[int, Dict[int, str]]:
        """Per-position consensus: {global_pos: {iteration: sequence}}.
        Template selection = median-high length, smallest tagged id among
        reads of that length (reference eltr_polisher.py:77-92)."""
        from centroflye_tpu.stages.consensus import polish_consensus

        out: Dict[int, Dict[int, str]] = {}
        for pos, cover in pos2read.items():
            seqs: Dict[str, str] = {}
            for (r_id, p) in cover:
                seqs[f"gen_pos={pos}|r_id={r_id}|r_pos={p}"] = \
                    unit_instances[r_id][p].upper()
            lens = [len(s) for s in seqs.values()]
            med = median_high(lens)
            template = None
            for tag in sorted(seqs):
                if len(seqs[tag]) == med:
                    template = seqs[tag]
                    break
            assert template is not None
            out[pos] = polish_consensus(template, list(seqs.values()),
                                        n_iters=self.config.num_iters)
        return out

    def run(
        self,
        placements: Dict[str, Optional[int]],
        unit_instances: Dict[str, List[str]],
        outdir: Optional[str] = None,
    ) -> PolishOutput:
        cfg = self.config
        pos2read = map_pos2read(placements, unit_instances,
                                min_pos=cfg.min_pos, max_pos=cfg.max_pos)
        per_pos = self.polish_positions(pos2read, unit_instances)
        if not per_pos:
            return PolishOutput(final_sequences={}, comparison=[])
        min_p, max_p = min(per_pos), max(per_pos)
        final: Dict[int, str] = {}
        for it in range(1, cfg.num_iters + 1):
            parts = []
            for pos in range(min_p, max_p + 1):
                if pos in per_pos:
                    parts.append(per_pos[pos][it])
            final[it] = "".join(parts)

        comparison = []
        for it in range(1, cfg.num_iters):
            a, b = final[it], final[it + 1]
            d = _edit_distance(a, b)
            dh = _edit_distance(compress_homopolymer(a),
                                compress_homopolymer(b))
            comparison.append((it, it + 1, d, dh))

        if outdir is not None:
            os.makedirs(outdir, exist_ok=True)
            for it, seq in final.items():
                write_seqs(os.path.join(outdir, f"final_sequence_{it}.fasta"),
                           {f"polished_repeat_{it}": seq})
                write_seqs(
                    os.path.join(outdir, f"final_sequence_hpc_{it}.fasta"),
                    {f"polished_repeat_{it}": compress_homopolymer(seq)})
            with open(os.path.join(outdir, "report.txt"), "w") as f:
                for (i, j, d, dh) in comparison:
                    print(f"Alignment polishing seq {i} vs {j}:", file=f)
                    print({"editDistance": d}, file=f)
                    print(f"Alignment homopolymer compressed polishing "
                          f"seq {i} vs {j}:", file=f)
                    print({"editDistance": dh}, file=f)
        return PolishOutput(final_sequences=final, comparison=comparison)


_DEVICE_NW_MAX = 1 << 20


def _edit_distance(a: str, b: str) -> int:
    """Global edit distance for the polish convergence report (reference
    eltr_polisher.py:133-146 compares successive iterations with edlib).

    Successive polish iterations are near-identical megabase strings, so
    the production path is the native C++ banded NW with a doubling
    threshold: O(n * k_true) work instead of the full O(n * m) DP —
    megabases compare in seconds. The device Myers kernel remains for
    short inputs and native-less environments; a full-matrix device NW
    on multi-Mbp inputs is the wrong tool (O(m/64 * n) scan — observed
    to take down the device worker at 3.1 Mbp), so oversize inputs
    without native fall back to a windowed upper bound (exact unless an
    alignment's net indel drift crosses a window boundary; convergence
    reporting only needs the trend to zero)."""
    if not a or not b:
        return max(len(a), len(b))
    from centroflye_tpu.io.encoding import encode
    q, t = (a, b) if len(a) <= len(b) else (b, a)
    try:
        from centroflye_tpu.native import (
            native_available, native_edit_distance)
        has_native = native_available()
    except ImportError:
        has_native = False
    if has_native:
        qc, tc = encode(q), encode(t)
        k = max(1024, 2 * (len(t) - len(q)))
        while True:
            d, _ = native_edit_distance(qc, tc, mode="NW", k=k)
            if d >= 0:
                return d
            if k >= max(len(q), len(t)):
                return max(len(q), len(t))
            k *= 4
    if len(q) > _DEVICE_NW_MAX:
        w = _DEVICE_NW_MAX // 2
        return sum(_device_nw(q[i:i + w], t[i:i + w])
                   for i in range(0, max(len(q), len(t)), w))
    return _device_nw(q, t)


def _device_nw(q: str, t: str) -> int:
    if not q or not t:
        return max(len(q), len(t))
    from centroflye_tpu.io.encoding import encode, encode_batch
    from centroflye_tpu.ops.myers import build_peq, myers_distance_batch
    if len(q) > len(t):
        q, t = t, q
    peq = build_peq(encode(q))
    codes, lens = encode_batch([t])
    out = myers_distance_batch(peq, codes, lens, m=len(q), mode="NW")
    return int(out["dist"][0])
