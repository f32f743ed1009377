"""Tensor parallelism for the ViT path (GSPMD param-sharding rules).

Beyond-reference extension: the reference scales only by data parallelism
(SURVEY.md §2.8 — TP/PP absent), which is all ViT-B needs for parity. This
module adds the standard Megatron-style sharding over a second mesh axis
("model") for when the framework is used with larger encoders (e.g. the MAE
vit_l/vit_h presets) or small per-chip batches:

- `attn/qkv` kernel column-sharded, `attn/proj` kernel row-sharded: each model
  shard computes a contiguous slice of the packed [q|k|v] columns; XLA inserts
  the (small) reshard at the q/k/v split so the per-head attention runs fully
  partitioned, and the psum after `proj` restores replicated activations.
- `mlp/fc1` column- / `mlp/fc2` row-sharded: the classic two-GEMM split with
  one psum after fc2.
- Everything else (LayerNorms, pos embed, patch embed, heads, BN) replicated —
  on those, the model axis behaves like extra data parallelism.

Pure GSPMD: no collectives are written by hand. Placing the parameters (and
their optimizer-state mirrors) with these shardings is the whole mechanism —
`jax.jit` propagates the layouts through the step function and inserts the
all-reduces over ICI. The math is bit-identical to DP up to float reduction
order (tested: DP8 == DP4xTP2 on a virtual CPU mesh, `tests/test_tp.py`).

Constraint: the model axis size must divide num_heads (and therefore the head
bias/kernel column counts) — 12 for ViT-B, so tp in {2, 3, 4, 6, 12}.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-suffix, PartitionSpec) — first match wins; default replicated.
TP_RULES: Sequence[Tuple[str, P]] = (
    ("attn/qkv/kernel", P(None, "model")),
    ("attn/qkv/bias", P("model")),
    ("attn/proj/kernel", P("model", None)),
    ("mlp/fc1/kernel", P(None, "model")),
    ("mlp/fc1/bias", P("model")),
    ("mlp/fc2/kernel", P("model", None)),
)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in path)


def tp_spec(path_str: str) -> P:
    for suffix, spec in TP_RULES:
        if path_str.endswith(suffix):
            return spec
    return P()


def tp_sharding_tree(tree, mesh: Mesh):
    """A pytree of NamedShardings mirroring `tree` (params OR a whole
    TrainState — optimizer-state mirrors share the param path suffixes, so the
    same rules place mu/nu consistently with their parameters)."""
    return hybrid_sharding_tree(tree, mesh, tp=True, fsdp=False)


def place_tp(tree, mesh: Mesh):
    """device_put `tree` with TP shardings (model axis) + replication (rest).

    Batch sharding stays on the "data" axis (core.mesh.data_sharding); this
    only changes where parameters and optimizer state live."""
    if "model" not in mesh.axis_names:
        raise ValueError("place_tp needs a mesh with a 'model' axis")
    return jax.device_put(tree, tp_sharding_tree(tree, mesh))


# Leaves smaller than this stay replicated under FSDP (LayerNorm scales,
# biases): sharding them saves nothing and adds per-leaf collective overhead.
FSDP_MIN_ELEMENTS = 4096


def hybrid_sharding_tree(tree, mesh: Mesh, tp: bool = False,
                         fsdp: bool = False):
    """Sharding pytree composing TP (model axis, TP_RULES by name) with
    FSDP/ZeRO-style param sharding (data axis, by shape): each leaf's spec
    starts from its TP rule, then the first still-unsharded dim divisible by
    the data-axis size is assigned to "data". Optimizer mirrors follow their
    params (TP by path suffix, FSDP by shape). Compute is unchanged — GSPMD
    all-gathers params where needed and reduce-scatters their grads, i.e.
    ZeRO-3 semantics for free."""
    n_data = mesh.shape["data"]

    def one(path, x):
        ndim = getattr(x, "ndim", 0)
        spec = list(tp_spec(_path_str(path))) if tp else []
        if ndim < len(spec):
            spec = []
        spec += [None] * (ndim - len(spec))
        if fsdp and ndim >= 1 and int(np.prod(x.shape)) >= FSDP_MIN_ELEMENTS:
            for d in range(ndim):
                if spec[d] is None and x.shape[d] % n_data == 0:
                    spec[d] = "data"
                    break
        return NamedSharding(mesh, P(*spec))
    return jax.tree_util.tree_map_with_path(one, tree)


def make_tp_mesh(tp: int, *head_counts: int, devices=None) -> Mesh:
    """(n/tp, tp) (data, model) mesh with the divisibility checks: tp must
    divide the device count and every attention head count it will shard
    (otherwise head boundaries straddle shards and GSPMD falls back to
    resharding collectives around every attention)."""
    from ssl4gie_tpu.core.mesh import make_mesh
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % tp != 0:
        raise ValueError(f"tensor_parallel={tp} does not divide {n} devices")
    for h in head_counts:
        if h % tp != 0:
            raise ValueError(f"tensor_parallel={tp} must divide the attention "
                             f"head count {h}")
    return make_mesh((n // tp, tp), ("data", "model"), devices=devices)


def make_place_fn(mesh: Mesh, tp: bool = False, fsdp: bool = False):
    """The single state-placement policy used at build AND resume time."""
    if not tp and not fsdp:
        return lambda tree: jax.device_put(
            tree, NamedSharding(mesh, P()))
    def place(tree):
        return jax.device_put(tree, hybrid_sharding_tree(tree, mesh,
                                                         tp=tp, fsdp=fsdp))
    return place
