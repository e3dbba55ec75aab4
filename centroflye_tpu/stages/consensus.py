"""Template-based consensus polishing (in-repo replacement for Flye
`--polish-target`).

The reference launches one external `flye --polish-target` subprocess per
unit position / pseudounit (reference eltr_polisher.py:99-114,
debruijn_graph.py:627-635) — thousands of process spawns. Here the polisher
is in-repo and deterministic: each read segment is aligned to the template
(ops/align_path), votes are piled per template column (base / deletion) and
per inter-column gap (inserted strings), and the majority rewrite becomes the
next template, iterated `n_iters` times. Ties break lexicographically
(deletion sorts before bases), so outputs are reproducible bit-for-bit.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Sequence

from centroflye_tpu.ops.align_path import align_path


def _majority(counter: Counter, default: str) -> str:
    if not counter:
        return default
    # max count; ties -> lexicographically smallest key ('' and '-' first)
    best = max(counter.items(), key=lambda kv: (kv[1], ), default=None)
    top = best[1]
    cands = sorted(k for k, v in counter.items() if v == top)
    return cands[0]


def _batch_alignments(template: str, reads: Sequence[str]):
    """All read-vs-template NW alignments as (a1, a2) pairs: one threaded
    native batch call (cf_align_path_batch) when available, else the
    per-pair path. Results are identical — the batch API runs the same
    cf_align_path per pair."""
    try:
        from centroflye_tpu.native import native_align_path_batch
        from centroflye_tpu.io.encoding import encode
        from centroflye_tpu.utils.bio import parse_cigar
        res = native_align_path_batch(
            [encode(r) for r in reads], encode(template), mode="NW")
    except ImportError:
        res = None
    if res is not None and all(r[0] >= 0 for r in res):
        out = []
        for read, (dist, cigar, t_start, t_end) in zip(reads, res):
            _, _, a1, a2 = parse_cigar(cigar, read,
                                       template[t_start:t_end])
            out.append((a1, a2))
        return out
    return [(al.a1, al.a2) for al in
            (align_path(r, template, mode="NW") for r in reads)]


def polish_round(template: str, reads: Sequence[str]) -> str:
    """One voting round: align every read to the template and rewrite each
    column by majority."""
    n = len(template)
    base_votes: List[Counter] = [Counter() for _ in range(n)]
    ins_votes: List[Counter] = [Counter() for _ in range(n + 1)]
    for a1, a2 in _batch_alignments(template, reads):
        t_pos = 0
        pending_ins: List[str] = []
        for qc, tc in zip(a1, a2):
            if tc == "-":
                pending_ins.append(qc)
                continue
            ins_votes[t_pos][("".join(pending_ins))] += 1
            pending_ins = []
            base_votes[t_pos][qc if qc != "-" else "-"] += 1
            t_pos += 1
        ins_votes[n]["".join(pending_ins)] += 1
    out: List[str] = []
    for j in range(n):
        ins = _majority(ins_votes[j], "")
        if ins:
            out.append(ins)
        base = _majority(base_votes[j], template[j])
        if base != "-":
            out.append(base)
    tail = _majority(ins_votes[n], "")
    if tail:
        out.append(tail)
    return "".join(out)


def polish_consensus(template: str, reads: Sequence[str],
                     n_iters: int = 2) -> Dict[int, str]:
    """Iterated polishing; returns {iteration (1-based): polished sequence}
    (mirroring the per-iteration artifacts polished_{i}.fasta the reference
    polisher reads back, eltr_polisher.py:116-131)."""
    out: Dict[int, str] = {}
    cur = template
    for i in range(1, n_iters + 1):
        if reads:
            cur = polish_round(cur, reads)
        out[i] = cur
    return out
