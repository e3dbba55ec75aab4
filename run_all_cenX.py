#!/usr/bin/env python
"""End-to-end cenX runner (role of the reference run_all_cenX.sh:7-22:
build native tool -> recruit -> assemble). Usage:
    python run_all_cenX.py <reads.fasta[.gz]> <outdir> [coverage]
"""
import os
import subprocess
import sys


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(1)
    reads, outdir = sys.argv[1], sys.argv[2]
    coverage = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    # build the native runtime if the toolchain is present (optional)
    subprocess.run(["make", "-C",
                    os.path.join(here, "centroflye_tpu", "native")],
                   check=False, capture_output=True)
    from centroflye_tpu.config import CentroFlyeConfig
    from centroflye_tpu.io import read_seq
    from centroflye_tpu.pipeline.cenx import CenXPipeline

    unit = read_seq(os.path.join(here, "centroflye_tpu", "data",
                                 "DXZ1_rc.fasta"))
    pipe = CenXPipeline(unit, CentroFlyeConfig(coverage=coverage), outdir)
    final = pipe.run(reads)
    print(f"final assembly: {len(final)} bp -> "
          f"{os.path.join(outdir, 'final_assembly.fasta')}")


if __name__ == "__main__":
    main()
