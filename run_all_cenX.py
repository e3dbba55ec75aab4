#!/usr/bin/env python
"""End-to-end cenX runner (role of the reference run_all_cenX.sh:7-22:
build native tool -> recruit -> assemble). Usage:
    python run_all_cenX.py <reads.fasta[.gz]> <outdir> [coverage]
                           [--distributed]

--distributed: multi-process pod-slice mode — every host runs this same
command (jax.distributed handshake via the standard cluster env); reads
are sharded round-robin over processes for recruitment and process 0
runs the remaining stages on the merged artifact.
"""
import os
import subprocess
import sys


def main():
    args = [a for a in sys.argv[1:] if a != "--distributed"]
    distributed = "--distributed" in sys.argv[1:]
    if len(args) < 2:
        print(__doc__)
        sys.exit(1)
    reads, outdir = args[0], args[1]
    coverage = int(args[2]) if len(args) > 2 else 32
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    # build the native runtime if the toolchain is present (optional)
    subprocess.run(["make", "-C",
                    os.path.join(here, "centroflye_tpu", "native")],
                   check=False, capture_output=True)
    from centroflye_tpu.config import CentroFlyeConfig
    from centroflye_tpu.io import read_seq
    from centroflye_tpu.pipeline.cenx import CenXPipeline

    if distributed:
        from centroflye_tpu.parallel.distributed import init_distributed
        distributed = init_distributed()

    unit = read_seq(os.path.join(here, "centroflye_tpu", "data",
                                 "DXZ1_rc.fasta"))
    pipe = CenXPipeline(unit, CentroFlyeConfig(coverage=coverage), outdir,
                        distributed=distributed)
    final = pipe.run(reads)
    if final:
        print(f"final assembly: {len(final)} bp -> "
              f"{os.path.join(outdir, 'final_assembly.fasta')}")


if __name__ == "__main__":
    main()
