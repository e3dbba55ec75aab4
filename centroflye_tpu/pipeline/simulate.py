"""Synthetic tandem-repeat + noisy-read simulation (seedable, host-side).

Equivalent of the reference's only test-fixture generator
(reference scripts/simulate_tandem_repeat.py:15-55): a unit is repeated
`mult` times, binomially-many positions across copies are substituted, and
the repeat is flanked by random sequence. On top of that (the reference
defers to external SimLoRD; reference scripts/read.py parses its metadata)
this module also samples long noisy reads from the simulated genome so the
whole pipeline can be exercised end-to-end without external tools.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional

import numpy as np

BASES = "ACGT"


def gen_random_seq(rng: np.random.Generator, length: int) -> str:
    return "".join(BASES[i] for i in rng.integers(0, 4, size=length))


@dataclasses.dataclass
class TandemRepeatSim:
    unit: str
    tr: str                       # the pure tandem repeat
    left_flanked_tr: str          # left flank + tr
    flanked_tr: str               # left flank + tr + right flank
    all_muts: Dict[int, List]     # unit copy index -> [(pos, new_base)]
    flank_len: int


def simulate_tandem_repeat(
    rng: np.random.Generator,
    unit: str,
    mult: int,
    div_rate: float,
    flank_len: int = 200000,
) -> TandemRepeatSim:
    """Mutate `mult` copies of `unit` at an average `div_rate` per base and
    flank with random sequence (reference simulate_tandem_repeat.py:15-34:
    binomial total mutation count, copies drawn uniformly, distinct positions
    per copy, substitutions only)."""
    n_mut = int(rng.binomial(n=len(unit) * mult, p=div_rate))
    copy_of_mut = rng.integers(0, mult, size=n_mut)
    units = [unit] * mult
    all_muts: Dict[int, List] = {}
    for copy_idx in sorted(set(copy_of_mut.tolist())):
        n = int((copy_of_mut == copy_idx).sum())
        n = min(n, len(unit))
        positions = rng.choice(len(unit), size=n, replace=False)
        new_unit = list(unit)
        muts = []
        for pos in positions:
            pos = int(pos)
            choices = [b for b in BASES if b != new_unit[pos]]
            new_unit[pos] = choices[int(rng.integers(0, 3))]
            muts.append((pos, new_unit[pos]))
        units[copy_idx] = "".join(new_unit)
        all_muts[copy_idx] = muts
    tr = "".join(units)
    left = gen_random_seq(rng, flank_len)
    right = gen_random_seq(rng, flank_len)
    return TandemRepeatSim(
        unit=unit, tr=tr, left_flanked_tr=left + tr,
        flanked_tr=left + tr + right, all_muts=all_muts,
        flank_len=flank_len)


def add_read_noise(rng: np.random.Generator, seq: str,
                   error_rate: float) -> str:
    """Apply uniform substitution/insertion/deletion noise (each 1/3 of
    error_rate), the standard long-read error model."""
    if error_rate <= 0:
        return seq
    out = []
    third = error_rate / 3
    rs = rng.random(len(seq))
    for i, ch in enumerate(seq):
        r = rs[i]
        if r < third:
            continue                                   # deletion
        if r < 2 * third:
            out.append(BASES[int(rng.integers(0, 4))])  # insertion (before)
            out.append(ch)
            continue
        if r < error_rate:
            choices = [b for b in BASES if b != ch]
            out.append(choices[int(rng.integers(0, 3))])  # substitution
            continue
        out.append(ch)
    return "".join(out)


@dataclasses.dataclass
class SimulatedRead:
    r_id: str
    seq: str
    start: int        # true start in the genome (forward coords)
    end: int          # true end (exclusive)
    strand: str       # '+' or '-'


def simulate_reads(
    rng: np.random.Generator,
    genome: str,
    n_reads: int,
    read_len_mean: int,
    read_len_std: int,
    error_rate: float,
    min_len: int = 500,
    both_strands: bool = True,
) -> List[SimulatedRead]:
    """Sample noisy reads uniformly from `genome`. Deterministic given rng."""
    from centroflye_tpu.io.encoding import revcomp_str

    reads = []
    for i in range(n_reads):
        rlen = max(min_len, int(rng.normal(read_len_mean, read_len_std)))
        rlen = min(rlen, len(genome))
        start = int(rng.integers(0, len(genome) - rlen + 1))
        raw = genome[start:start + rlen]
        strand = "-" if (both_strands and rng.random() < 0.5) else "+"
        if strand == "-":
            raw = revcomp_str(raw)
        noisy = add_read_noise(rng, raw, error_rate)
        reads.append(SimulatedRead(
            r_id=f"sim_read_{i:05d}_{strand}",
            seq=noisy, start=start, end=start + rlen, strand=strand))
    return reads


def simulate_tiling_reads(
    rng: np.random.Generator,
    genome: str,
    read_len: int,
    stride: int,
    error_rate: float,
    both_strands: bool = True,
) -> List[SimulatedRead]:
    """Deterministically tile the genome with overlapping noisy reads —
    guarantees coverage of every position (useful for assembly tests where
    uniform sampling might leave gaps)."""
    from centroflye_tpu.io.encoding import revcomp_str

    reads = []
    i = 0
    for start in range(0, max(1, len(genome) - read_len + 1), stride):
        raw = genome[start:start + read_len]
        strand = "-" if (both_strands and rng.random() < 0.5) else "+"
        oriented = revcomp_str(raw) if strand == "-" else raw
        noisy = add_read_noise(rng, oriented, error_rate)
        reads.append(SimulatedRead(
            r_id=f"tile_read_{i:05d}_{strand}",
            seq=noisy, start=start, end=start + len(raw), strand=strand))
        i += 1
    return reads


def write_simulation(sim: TandemRepeatSim, output_dir: str) -> None:
    """Write the reference-compatible artifact set
    (reference simulate_tandem_repeat.py:37-55)."""
    from centroflye_tpu.io import write_seqs

    os.makedirs(output_dir, exist_ok=True)
    write_seqs(os.path.join(output_dir, "tandem_repeat.fasta"),
               {"sim_tr": sim.tr})
    write_seqs(os.path.join(output_dir, "left_flanked_tandem_repeat.fasta"),
               {"left_flanked_sim_tr": sim.left_flanked_tr})
    write_seqs(os.path.join(output_dir, "flanked_tandem_repeat.fasta"),
               {"flanked_sim_tr": sim.flanked_tr})
    with open(os.path.join(output_dir, "all_muts.json"), "w") as f:
        muts = {str(k): [[int(p), b] for p, b in v]
                for k, v in sim.all_muts.items()}
        json.dump(muts, f)
    with open(os.path.join(output_dir, "simulation.log"), "w") as f:
        total = sum(len(v) for v in sim.all_muts.values())
        print(f"full_tr_len = {len(sim.tr)}", file=f)
        print(f"total_n_mut = {total}", file=f)
        for pos, muts_ in sim.all_muts.items():
            print(f"{pos} : {len(muts_)}", file=f)


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        description="Simulate a tandem repeat (+ optionally noisy reads)")
    parser.add_argument("--unit", help="unit FASTA; default random")
    parser.add_argument("--unit-len", type=int, default=200)
    parser.add_argument("--multiplicity", type=int, required=True)
    parser.add_argument("--div-rate", type=float, required=True)
    parser.add_argument("--flank-len", type=int, default=200000)
    parser.add_argument("-o", "--output", required=True)
    parser.add_argument("--seed", type=int)
    parser.add_argument("--n-reads", type=int, default=0,
                        help="also simulate this many noisy reads")
    parser.add_argument("--read-len-mean", type=int, default=50000)
    parser.add_argument("--read-len-std", type=int, default=15000)
    parser.add_argument("--error-rate", type=float, default=0.1)
    args = parser.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    if args.unit:
        from centroflye_tpu.io import read_seq
        unit = read_seq(args.unit)
    else:
        unit = gen_random_seq(rng, args.unit_len)
    sim = simulate_tandem_repeat(rng, unit, args.multiplicity, args.div_rate,
                                 flank_len=args.flank_len)
    write_simulation(sim, args.output)
    if args.n_reads:
        from centroflye_tpu.io import write_seqs
        reads = simulate_reads(rng, sim.flanked_tr, args.n_reads,
                               args.read_len_mean, args.read_len_std,
                               args.error_rate)
        write_seqs(os.path.join(args.output, "reads.fasta"),
                   {r.r_id: r.seq for r in reads})


if __name__ == "__main__":
    main()


def parse_sim_read_id(r_id: str) -> Optional[Dict[str, object]]:
    """Parse this simulator's read ids ("sim_read_<idx>_<strand>" /
    "tile_read_<idx>_<strand>") into metadata — the role of the reference's
    scripts/read.py SimLoRD-metadata parser for our own simulator."""
    parts = r_id.split("_")
    if len(parts) != 4 or parts[1] != "read":
        return None
    try:
        return {"kind": parts[0], "index": int(parts[2]),
                "strand": parts[3]}
    except ValueError:
        return None
