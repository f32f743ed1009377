"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's NCCL/DDP process-group machinery
(reference `train_classification.py:250-255`, `Models/mae/util/misc.py:216-248`):
instead of one process per GPU with explicit collectives, we build a
`jax.sharding.Mesh` and express data parallelism as batch sharding — XLA inserts the
gradient all-reduce (psum over ICI) automatically. Multi-host (DCN) joins via
`jax.distributed.initialize` before mesh creation.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> None:
    """Initialize multi-host JAX if the launcher environment calls for it.
    Thin alias for `parallel.distributed.initialize` (kept for back-compat)."""
    from ssl4gie_tpu.parallel.distributed import initialize
    initialize()


def make_mesh(shape: Optional[Sequence[int]] = None,
              axes: Sequence[str] = ("data",),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh. Default: 1-D data-parallel mesh over all devices.

    On multi-host slices, device order from `jax.devices()` already groups ICI
    neighbors; a 1-D data axis therefore rides ICI within a slice and DCN across
    slices, which is correct for pure DP.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(axes))


def data_sharding(mesh: Mesh, ndim: int = 1, axis: str = "data") -> NamedSharding:
    """Sharding that splits dim 0 (batch) over the data axis, replicating the rest."""
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host pytree of arrays onto the mesh, batch-dim sharded."""
    def put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x) or 1, axis))
    return jax.tree_util.tree_map(put, batch)


def local_batch_size(global_batch: int, mesh: Mesh, axis: str = "data") -> int:
    n = mesh.shape[axis]
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by data-parallel size {n} "
            "(the reference asserts the same divisibility, train_classification.py:420)")
    return global_batch // n
