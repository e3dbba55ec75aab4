"""Multi-host pod-slice execution glue.

The reference has no multi-node anything (SURVEY §2.2); this engine scales
by data-parallelism over reads. On a multi-host TPU pod slice:

- every host calls `init_distributed()` (jax.distributed handshake), builds
  the global mesh over all devices, and streams its own shard of the read
  files (`shard_read_files` splits by round-robin so hosts need no
  coordination);
- per-shard tables merge with the collectives in parallel/mesh.py over ICI;
- stage artifacts are written by process 0 only (`is_coordinator`).

Single-host runs work unchanged (init is a no-op without the cluster env).
"""

from __future__ import annotations

import os
from typing import Iterable, Iterator, List, Optional, Tuple

import jax


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-process; returns True
    when a multi-process setup is active. Arguments default to the standard
    cluster environment (TPU pod metadata / JAX_COORDINATOR_ADDRESS)."""
    explicit = coordinator_address is not None
    env_driven = any(v in os.environ for v in (
        "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS"))
    if not explicit and not env_driven:
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return jax.process_count() > 1


def is_coordinator() -> bool:
    return jax.process_index() == 0


def shard_read_files(files: List[str]) -> List[str]:
    """Round-robin assignment of input files to this process."""
    return [f for i, f in enumerate(files)
            if i % jax.process_count() == jax.process_index()]


def shard_read_stream(reads: Iterable[Tuple[str, str]]
                      ) -> Iterator[Tuple[str, str]]:
    """Round-robin assignment of reads within one stream (for a single
    shared input file on a common filesystem)."""
    p = jax.process_index()
    n = jax.process_count()
    for i, item in enumerate(reads):
        if i % n == p:
            yield item
