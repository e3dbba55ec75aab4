"""centroflye_tpu — a TPU-native centromere assembly engine.

A from-scratch reimplementation of the centroFlye method (Bzikadze & Pevzner,
Nat. Biotech. 2020; reference implementation seryrzu/centroFlye) designed for
TPU hardware: JAX/XLA/Pallas compute kernels, pjit/shard_map data parallelism
over device meshes, and a small C++ native runtime for streaming sequence IO
and exact-parity alignment checks.

Subpackages
-----------
- ``io``        sequence IO (FASTA/FASTQ(.gz)), 2-bit encodings, artifact store
- ``ops``       device compute primitives (Myers edit distance, k-mer ops,
                placement scoring) with Pallas TPU kernels
- ``stages``    the cenX pipeline stages (recruitment, unit decomposition,
                rare/unique k-mer recruitment, read placement, consensus,
                polishing)
- ``mono``      the centroFlyeMono (cen6) monomer-alphabet pipeline
- ``parallel``  mesh construction + sharded multi-chip execution
- ``pipeline``  end-to-end drivers and the tandem-repeat simulator
- ``native``    ctypes bindings to the C++ runtime (libcfnative)
"""

__version__ = "0.1.0"

from centroflye_tpu.config import CentroFlyeConfig  # noqa: F401
