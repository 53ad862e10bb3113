"""Parallelism layer: device meshes, shardings, distributed bring-up."""

from .mesh import (  # noqa: F401
    batch_sharding,
    host_local_batch_to_global,
    initialize_distributed,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
