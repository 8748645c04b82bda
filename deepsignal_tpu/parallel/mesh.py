"""Device mesh construction and sharding rules.

The reference has no distributed backend at all — its only parallelism is
single-node multiprocessing with one full model replica per process
(SURVEY.md §2.3).  The TPU-native replacement:

- one process per host (``jax.distributed.initialize``), all chips in one
  ``Mesh`` with axes ``("data", "model")``
- inference/training batches sharded along ``data``; params replicated by
  default, with the large joint-head matmuls optionally sharded along
  ``model`` (tensor parallelism) — collectives ride ICI via XLA
- per-host input pipelines stream disjoint read shards; outputs are written
  per host and merged by the frequency aggregator, which already accepts
  multiple files (call_modification_frequency.py:107-120).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None,
              model_parallel: int = 1, local: bool = False) -> Mesh:
    """Build a (data, model) mesh over the first ``n_devices`` devices.

    ``local=True`` restricts the mesh to THIS process's addressable devices.
    Inference has zero cross-host data dependencies, so each host runs its
    own local mesh (embarrassingly parallel over read shards — no lockstep
    batch-count requirement between hosts); training uses the default global
    mesh, where XLA psums gradients over ICI/DCN.
    """
    devices = jax.local_devices() if local else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel="
                         f"{model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def mesh_is_multiprocess(mesh: Mesh) -> bool:
    """True when the mesh spans devices owned by more than one process."""
    return len({d.process_index for d in mesh.devices.flat}) > 1


def put_batch(tree, sharding: NamedSharding):
    """Host-local numpy batch -> global arrays sharded on the batch axis.

    Single-process meshes: a plain ``device_put``.  Multi-process meshes:
    every process contributes its LOCAL block via
    ``jax.make_array_from_process_local_data`` — the global batch dimension
    is the concatenation of per-host locals, so each host feeds host-local
    numpy and jit sees one consistent global array (the round-trip partner
    is ``host_local_rows``).  This is the piece plain device_put cannot do
    under ``jax.distributed``: a jit over a global mesh rejects host-local
    arrays with global in_shardings.
    """
    if not mesh_is_multiprocess(sharding.mesh):
        return jax.device_put(tree, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), tree)


def put_replicated(tree, mesh: Mesh):
    """Replicate host-identical values over a (possibly multi-process) mesh.

    Caller contract: every process passes bit-identical data (deterministic
    init seeds / checkpoint loads guarantee this)."""
    repl = replicated(mesh)
    if not mesh_is_multiprocess(mesh):
        return jax.device_put(tree, repl)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            repl, np.asarray(x)), tree)


def host_local_rows(arr) -> np.ndarray:
    """This process's rows of a batch-sharded global array, in the local
    input order ``put_batch`` used (addressable shards sorted by global
    offset)."""
    if arr.is_fully_addressable:
        return np.asarray(arr)
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dimension across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(mesh: Mesh, params) -> dict:
    """Sharding tree for model params.

    Joint-head Dense kernels are the big matrices ([6032, 6032] for the
    default config); shard their output dim over the model axis when the
    mesh has one.  Everything else is replicated — the per-step tensors are
    small and replication keeps collectives off the critical path.
    """
    use_tp = mesh.shape[MODEL_AXIS] > 1

    def rule(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if use_tp and "joint_model" in names and "fc1" in names \
                and names[-1] == "kernel":
            return NamedSharding(mesh, P(None, MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0):
    """Pad the batch axis up to a multiple (fixed-shape batching for XLA).

    Returns (padded_array, valid_count)."""
    n = arr.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return arr, n
    pad_width = [(0, 0)] * arr.ndim
    pad_width[axis] = (0, target - n)
    return np.pad(arr, pad_width, mode="edge" if n > 0 else "constant"), n
