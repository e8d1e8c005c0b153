"""Device mesh + sharding utilities.

The reference's only parallelism is single-node data-parallel DDP over NCCL
(parallel_main.py:86-170).  The TPU-native equivalent built here: a
``jax.sharding.Mesh`` with a ``data`` axis (ICI); the train step is jitted
with the global batch sharded over that axis and parameters replicated.
GSPMD then inserts the gradient/BN-stat collectives automatically — the
all-reduce DDP does in backward, and *exact* sync-BN (the reference only
gets that with SyncBatchNorm), with zero Python plumbing.

A second ``dcn`` axis slot is reserved for multi-slice scaling (the
reference rejects multi-node outright, parallel_main.py:267-268; here it is
just a larger mesh).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data_axis: str = "data",
    dcn_axis: Optional[str] = None,
    dcn_size: int = 1,
) -> Mesh:
    """1-D data-parallel mesh (optionally 2-D with a leading DCN axis)."""
    devices = list(devices if devices is not None else jax.devices())
    if dcn_axis is not None and dcn_size > 1:
        arr = np.array(devices).reshape(dcn_size, -1)
        return Mesh(arr, (dcn_axis, data_axis))
    return Mesh(np.array(devices), (data_axis,))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    axes = [name for name in mesh.axis_names]
    return NamedSharding(mesh, P(tuple(axes)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Put a host batch onto the mesh, sharded along the batch axis.

    Single host: a plain sharded device_put.  Multi-host: each process holds
    its shard of the global batch (per-host data sharding) and the pieces are
    assembled into one global array.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, x), batch
        )

    def put(x):
        # a partial final batch that doesn't divide the mesh (eval only)
        # falls back to replication — one extra compile, correct numerics
        if x.shape[0] % mesh.size != 0:
            return jax.device_put(x, replicated(mesh))
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate_tree(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
