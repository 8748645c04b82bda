"""Multi-host runtime: distributed init + per-host work sharding.

The reference is strictly single-node (SURVEY.md §2.3/§5.8: mp.Queue + files,
no backend).  The TPU-native design:

- one process per host, ``jax.distributed.initialize`` (ICI within a slice,
  DCN across); all chips form one Mesh
- each host streams a *disjoint* shard of the fast5/feature inputs
  (deterministic stride partition of the sorted file list — the
  generalization of the reference's ``_fill_files_queue`` batching,
  extract_features.py:306-309)
- each host writes its own output shard ``<result>.part<k>-of-<n>``; the
  frequency aggregator already merges multi-file inputs
  (call_modification_frequency.py:107-120), and ``merge_call_shards``
  concatenates per-read call TSVs.
"""

from __future__ import annotations

import os
from typing import Optional


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> tuple:
    """Initialize the multi-host runtime; no-op for single-process runs.

    Returns (process_index, process_count).  Arguments default from the
    standard env vars (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID) or cloud-TPU auto-detection.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address or num_processes:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    return jax.process_index(), jax.process_count()


def shard_file_list(files: list, process_id: Optional[int] = None,
                    num_processes: Optional[int] = None) -> list:
    """Deterministic per-host stride partition of the input file list.

    Sorted first so every host computes the same global order; stride (not
    contiguous blocks) so hosts see statistically similar read-length mixes.
    """
    import jax

    if process_id is None:
        process_id = jax.process_index()
    if num_processes is None:
        num_processes = jax.process_count()
    return sorted(files)[process_id::num_processes]


def shard_output_path(path: str, process_id: Optional[int] = None,
                      num_processes: Optional[int] = None) -> str:
    """Per-host output shard name: <path>.part<k>-of-<n> (single process:
    unchanged)."""
    import jax

    if process_id is None:
        process_id = jax.process_index()
    if num_processes is None:
        num_processes = jax.process_count()
    if num_processes == 1:
        return path
    return f"{path}.part{process_id}-of-{num_processes}"


def merge_call_shards(base_path: str, num_processes: int,
                      remove_shards: bool = False) -> str:
    """Concatenate per-host call-TSV shards into the final file."""
    with open(base_path, "w") as wf:
        for k in range(num_processes):
            shard = f"{base_path}.part{k}-of-{num_processes}"
            with open(shard, "r") as rf:
                for line in rf:
                    wf.write(line)
            if remove_shards:
                os.remove(shard)
    return base_path
