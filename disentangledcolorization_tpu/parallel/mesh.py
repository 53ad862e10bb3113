"""Device meshes and sharding helpers: the TPU-native replacement for DDP/NCCL.

The reference scales with torch DistributedDataParallel over NCCL
(/root/reference/main/utils_train.py:221-241, train_colorizer.py:64-67).
Here the same capability is a jax.sharding Mesh: parameters replicated, batch
sharded over the 'data' axis, gradients averaged by XLA-inserted collectives
over ICI (intra-slice) / DCN (multi-slice). BatchNorm statistics are computed
over the global batch automatically under pjit — SyncBatchNorm semantics with
zero extra code.

Multi-host: call ``initialize_distributed()`` (jax.distributed) before any jax
op; each host feeds its local shard via ``host_local_batch_to_global``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: str | None = None, num_processes: int | None = None, process_id: int | None = None):
    """Multi-host bring-up (equivalent of reference init_dist, utils_train.py:229-241).

    No-op on a single host; with arguments (or TPU metadata auto-detection)
    joins the jax.distributed rendezvous.
    """
    try:
        if coordinator is not None:
            jax.distributed.initialize(coordinator, num_processes, process_id)
        elif jax.process_count() == 1 and num_processes not in (None, 1):
            jax.distributed.initialize()
    except RuntimeError:
        pass  # already initialized


def make_mesh(n_devices: int | None = None, axis: str = "data", devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host-local pytree of arrays as a batch-sharded global array."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def host_local_batch_to_global(mesh: Mesh, local_batch, axis: str = "data"):
    """Assemble per-host shards into a global batch-sharded array (multi-host).

    Single-host this is just shard_batch; multi-host it uses
    jax.make_array_from_process_local_data.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, local_batch, axis)
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), local_batch
    )


def mean_reduce_metrics(metrics):
    """Metric scalars under pjit are already global means — identity hook kept
    for API parity with the reference's mean_reduce_tensor (utils_train.py:276-284)."""
    return metrics


def make_hierarchical_mesh(n_slices: int, axis_names=("replica", "data"), devices=None) -> Mesh:
    """2-D mesh (slices x chips-per-slice) for multi-slice pods.

    Pure data parallelism still shards the batch over BOTH axes (pass
    ``PartitionSpec(axis_names)`` for the batch dim); laying the slice axis out
    explicitly keeps the gradient all-reduce hierarchical — XLA reduces over
    ICI within a slice first, then over DCN across slices.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % n_slices == 0, f"{n} devices not divisible into {n_slices} slices"
    arr = np.asarray(devices).reshape(n_slices, n // n_slices)
    return Mesh(arr, axis_names)


def hierarchical_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch sharded over every mesh axis (DP across slices and chips)."""
    return NamedSharding(mesh, P(mesh.axis_names))
