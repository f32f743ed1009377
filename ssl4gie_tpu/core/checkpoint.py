"""Orbax checkpointing with the reference's best-val semantics.

Reference finetune protocol (`train_classification.py:352-366`): a single best-val file
containing model/optimizer/scaler state, epoch, best val/test metrics, and the three host
RNG streams for bit-level resume. Our TPU-native equivalent stores params, opt_state,
batch_stats, step/epoch, best metrics, scheduler state, and a single `jax.random` key
(replacing the python/np/torch triple-RNG capture).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Best-val single-slot checkpoint (+ optional periodic slots for pretraining)."""

    def __init__(self, directory: str, name: str):
        self.path = os.path.abspath(os.path.join(directory, name))
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def exists(self) -> bool:
        return os.path.isdir(self.path) and bool(os.listdir(self.path))

    def save(self, state_tree: Any) -> None:
        """Overwrite the best-val slot. state_tree must be a pytree of arrays +
        a metadata dict of plain scalars under 'meta'."""
        tmp = self.path + ".tmp"
        if os.path.isdir(tmp):
            import shutil
            shutil.rmtree(tmp)
        self._ckptr.save(tmp, state_tree, force=True)
        self._ckptr.wait_until_finished()
        if os.path.isdir(self.path):
            import shutil
            shutil.rmtree(self.path)
        os.rename(tmp, self.path)

    def delete(self) -> None:
        """Remove the slot (e.g. a stale .preempt sibling once surpassed)."""
        if os.path.isdir(self.path):
            import shutil
            shutil.rmtree(self.path)

    def restore(self, abstract_tree: Optional[Any] = None) -> Any:
        if abstract_tree is not None:
            return self._ckptr.restore(self.path, target=abstract_tree)
        return self._ckptr.restore(self.path)


def host_tree(tree):
    """Pull a sharded pytree fully to host numpy (for saving from process 0).

    Under --fsdp/--tensor-parallel on a multi-host mesh a leaf's shards can
    live on non-addressable devices, where device_get raises; those leaves are
    first all-gathered across processes (replicated state never hits this —
    every host holds full copies)."""
    def pull(x):
        if (isinstance(x, jax.Array) and not x.is_fully_addressable
                and not x.is_fully_replicated):
            # genuinely sharded across hosts (FSDP/TP): gather. Fully-
            # replicated multi-host arrays read their local copy directly.
            from jax.experimental import multihost_utils
            x = multihost_utils.process_allgather(x, tiled=True)
        return np.asarray(jax.device_get(x))
    return jax.tree_util.tree_map(pull, tree)


def is_primary() -> bool:
    """Rank-0 gating equivalent (`jax.process_index()==0`)."""
    return jax.process_index() == 0
