"""Haystack soak: stream >= 1M reads through recruitment in one process.

The reference's recruitment stage streams the WHOLE rel2 release — 11.1M
reads / 150 GB — through 50 `rr` processes in ~1 h with <50 MB RSS each
(reference README.md:103-106, run_read_recruitment.sh:35-44). The
committed throughput evidence so far capped at 8,192-read synthetic
haystacks (bench.py); this soak measures SUSTAINED single-process
behavior at the million-read scale: wall-clock reads/s over the full
stream and RSS flatness (a growing RSS would rule out the 11M-read
envelope regardless of throughput).

World: ~1M reads, rel2-like length mix (lognormal ~11 kb median with a
15% ultra-long component, mean ~14 kb), 2% centromeric (noisy DXZ1
slices, both strands), the rest random background — written as one
multi-GB FASTA, then recruited by `recruit_file` (the rr-equivalent
production entry point) at threshold 350.

Run: python benchmarks/soak_recruitment.py [n_reads] [out_json]
Writes benchmarks/soak_recruitment.json.
"""

import json
import os
import resource
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from centroflye_tpu.io import read_seq
from centroflye_tpu.io.encoding import revcomp_str
from centroflye_tpu.pipeline import simulate as sm

BASES = np.frombuffer(b"ACGT", np.uint8)


def fast_random_seq(rng, n):
    return BASES[rng.integers(0, 4, size=n)].tobytes().decode("ascii")


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    t_all = time.time()
    unit = read_seq(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "centroflye_tpu", "data", "DXZ1_rc.fasta"))
    rng = np.random.default_rng(99)

    # centromeric source: one noisy 60-unit array (slices re-noised per
    # read would cost a Python pass per read; one noisy array with
    # per-read strand flips exercises the same kernel path)
    sim = sm.simulate_tandem_repeat(rng, unit, 60, 0.003, flank_len=30_000)
    cen_src = sm.add_read_noise(rng, sim.flanked_tr, 0.055)

    fasta = "/tmp/soak_reads.fasta"
    meta_fn = fasta + ".meta.json"
    if os.path.exists(fasta) and os.path.exists(meta_fn):
        meta = json.load(open(meta_fn))
        if meta.get("n_reads") == n_reads:
            print(f"reusing existing corpus {fasta}", flush=True)
            return run_recruit(fasta, meta, unit, t_all)
    print(f"writing {n_reads:,} reads to {fasta} ...", flush=True)
    ul = rng.random(n_reads) < 0.15
    lens = np.where(ul,
                    rng.lognormal(np.log(40_000), 0.5, n_reads),
                    rng.lognormal(np.log(11_000), 0.6, n_reads))
    lens = np.clip(lens, 500, 120_000).astype(np.int64)
    is_cen = rng.random(n_reads) < 0.02
    cen_starts = rng.integers(0, max(len(cen_src) - 130_000, 1),
                              size=n_reads)
    total_bp = 0
    n_cen = 0
    t0 = time.time()
    with open(fasta, "w") as f:
        buf = []
        for i in range(n_reads):
            L = int(lens[i])
            if is_cen[i]:
                s = int(cen_starts[i])
                seq = cen_src[s:s + L]
                if rng.random() < 0.5:
                    seq = revcomp_str(seq)
                rid = f"cen{i:07d}"
                n_cen += 1
            else:
                seq = fast_random_seq(rng, L)
                rid = f"bg{i:07d}"
            buf.append(f">{rid}\n{seq}\n")
            total_bp += len(seq)
            if len(buf) >= 2000:
                f.write("".join(buf))
                buf = []
        f.write("".join(buf))
    gen_s = time.time() - t0
    gb = total_bp / 1e9
    print(f"wrote {gb:.1f} Gbp ({n_cen} centromeric) in {gen_s:.0f}s",
          flush=True)
    meta = {"n_reads": n_reads, "total_bp": total_bp, "n_cen": n_cen}
    with open(meta_fn, "w") as f:
        json.dump(meta, f)
    return run_recruit(fasta, meta, unit, t_all)


def run_recruit(fasta, meta, unit, t_all):
    n_reads = meta["n_reads"]
    total_bp = meta["total_bp"]
    n_cen = meta["n_cen"]
    gb = total_bp / 1e9

    # RSS sampler thread
    rss_samples = []
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            with open("/proc/self/status") as st:
                for line in st:
                    if line.startswith("VmRSS"):
                        rss_samples.append(
                            (time.time(), int(line.split()[1]) // 1024))
                        break
            stop.wait(3.0)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()

    from centroflye_tpu.stages.recruitment import recruit_file
    from centroflye_tpu.io import write_seqs
    unit_fn = "/tmp/soak_unit.fasta"
    write_seqs(unit_fn, {"DXZ1": unit})
    out_fn = "/tmp/soak_recruited.fasta"
    if os.path.exists(out_fn):
        os.unlink(out_fn)
    print("recruiting ...", flush=True)
    t0 = time.time()
    n_rec = recruit_file(unit_fn, fasta, out_fn, threshold=350)
    rec_s = time.time() - t0
    stop.set()
    th.join(timeout=5)

    rss = [r for _, r in rss_samples]
    q = max(1, len(rss) // 4)
    first_q = sum(rss[:q]) / q
    q2 = sum(rss[q:2 * q]) / q
    q3 = sum(rss[2 * q:3 * q]) / q
    last_q = sum(rss[-q:]) / q
    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20)
    out = {
        "n_reads": n_reads,
        "total_gbp": round(gb, 2),
        "n_centromeric": n_cen,
        "n_recruited": n_rec,
        "recruit_wall_s": round(rec_s, 1),
        "reads_per_s": round(n_reads / rec_s, 1),
        "mbp_per_s": round(total_bp / rec_s / 1e6, 1),
        "rss_mb_quarters": [round(first_q, 1), round(q2, 1),
                            round(q3, 1), round(last_q, 1)],
        "rss_mb_peak": round(peak * 1024, 1),
        # flat = the second half of the stream adds little (the first
        # half pays one-time XLA executable/compile-cache growth across
        # the long-read segment-shape variety)
        "rss_flat": bool(last_q <= 1.1 * q2 + 150),
        "implied_rel2_hours": round(11.1e6 / (n_reads / rec_s) / 3600, 2),
        "reference_envelope": "11.1M reads / ~1 h / 50 threads / <50 MB "
                              "per process (README.md:103-106)",
    }
    print(json.dumps(out, indent=2), flush=True)
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "soak_recruitment.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=2)
    print(f"-> {dst}  (total wall {time.time() - t_all:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
