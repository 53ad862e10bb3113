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


def initialize_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Multi-host bring-up (equivalent of reference init_dist, utils_train.py:229-241).

    MUST be called before any other jax API: anything that touches the backend
    (jax.devices(), jax.process_count(), the first traced op) pins a
    single-process runtime and makes a later rendezvous impossible, which is
    why this function decides purely from its arguments.

    * No coordinator and num_processes in (None, 1): single-process run,
      no-op — matches the reference's non-DDP path.
    * A coordinator (with or without explicit num_processes/process_id — jax
      auto-detects the rest from the cluster env when omitted), or an explicit
      num_processes > 1 (TPU pod metadata auto-detection): joins the
      jax.distributed rendezvous.

    Idempotent: a second call after successful initialization is a no-op.
    Every other failure (bad address, rendezvous timeout, id out of range)
    propagates — silently swallowing it would strand the job as accidental
    single-process, the exact failure mode of the reference's unreachable
    mpi/slurm branches (utils_train.py:234-239).
    """
    if coordinator is None and num_processes in (None, 1):
        return
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" in str(e) or "called once" in str(e):
            return  # idempotent re-entry
        raise


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
