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
                      ) -> Iterator[Tuple[int, Tuple[str, str]]]:
    """Round-robin assignment of reads within one stream (for a single
    shared input file on a common filesystem). Yields (global_ordinal,
    (r_id, seq)) so per-process outputs can be merged back into exact
    global input order."""
    p = jax.process_index()
    n = jax.process_count()
    for i, item in enumerate(reads):
        if i % n == p:
            yield i, item


def partial_path(output_fn: str, process: Optional[int] = None) -> str:
    p = jax.process_index() if process is None else process
    return f"{output_fn}.part{p}"


def finish_partial(output_fn: str) -> None:
    """Mark this process's partial artifact complete (shared-filesystem
    barrier token; the coordinator merge waits on all tokens)."""
    with open(partial_path(output_fn) + ".done", "w") as f:
        f.write("done\n")


def merge_partial_fastas(output_fn: str, timeout_s: float = 3600.0,
                         poll_s: float = 0.5) -> int:
    """Coordinator-side merge of all processes' partial FASTAs into
    `output_fn` in exact global input order. Each part line format:
    `>ordinal r_id` / sequence (written by the distributed recruit path).
    Waits for every process's .done token (shared filesystem), then
    streams a sorted merge. Returns the merged record count — the same
    count (and byte-identical file modulo the ordinal tags being removed)
    as a single-process run."""
    import time

    n = jax.process_count()
    deadline = time.monotonic() + timeout_s
    parts = [partial_path(output_fn, p) for p in range(n)]
    while any(not os.path.exists(p + ".done") for p in parts):
        if time.monotonic() > deadline:
            missing = [p for p in parts if not os.path.exists(p + ".done")]
            raise TimeoutError(f"partial artifacts never finished: {missing}")
        time.sleep(poll_s)

    records = []
    for part in parts:
        with open(part) as f:
            header = None
            for line in f:
                line = line.rstrip("\n")
                if line.startswith(">"):
                    header = line[1:]
                elif header is not None:
                    ordinal, _, r_id = header.partition(" ")
                    records.append((int(ordinal), r_id, line))
                    header = None
    records.sort()
    from centroflye_tpu.io.fasta import atomic_write
    with atomic_write(output_fn) as out:
        for _, r_id, seq in records:
            out.write(f">{r_id}\n{seq}\n")
    for part in parts:
        os.remove(part)
        os.remove(part + ".done")
    return len(records)
