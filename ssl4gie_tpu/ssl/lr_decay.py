"""Layer-wise LR decay (BEiT/ELECTRA scheme, `Models/mae/util/lr_decay.py:15-75`).

The reference builds per-layer torch param groups with lr_scale =
decay^(num_layers - layer_id), where layer_id is 0 for patch-embed /
pos-embed / cls-token, i+1 for block i, and num_layers (= depth+1, scale 1.0)
for the final norm and head. Torch applies the scale to the whole AdamW update
(step AND decoupled weight decay); the optax equivalent is therefore a
per-leaf update multiplier chained AFTER the optimizer:

    tx = optax.chain(optax.adamw(...), scale_by_layer_decay(params))

(Scaling gradients BEFORE Adam would be a no-op — Adam normalizes them away.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def vit_layer_id(path: tuple, depth: int = 12) -> int:
    """Layer id for a flattened param path (tuple of str keys) of our ViT
    models (`backbone/blocks_i/...`, `backbone/pos_embed`, `lin_head/...`),
    mirroring `get_layer_id_for_vit` (`lr_decay.py:64-79`)."""
    for p in path:
        if p in ("cls_token", "pos_embed") or p.startswith("patch_embed"):
            return 0
        if p.startswith("blocks_"):
            return int(p.split("_")[1]) + 1
    return depth + 1


def layer_decay_scales(params, depth: int = 12, decay: float = 0.75):
    """Pytree of per-leaf multipliers decay^(num_layers - layer_id)."""
    num_layers = depth + 1
    return jax.tree_util.tree_map_with_path(
        lambda path, _: decay ** (num_layers - vit_layer_id(
            tuple(p.key if hasattr(p, "key") else str(p) for p in path), depth)),
        params)


def scale_by_layer_decay(params, depth: int = 12, decay: float = 0.75
                         ) -> optax.GradientTransformation:
    """Stateless optax transform multiplying each leaf's update by its layer
    scale. Chain it after the base optimizer."""
    scales = layer_decay_scales(params, depth, decay)

    def init(params_):
        del params_
        return optax.EmptyState()

    def update(updates, state, params_=None):
        del params_
        return (jax.tree_util.tree_map(
            lambda u, s: u * jnp.asarray(s, u.dtype), updates, scales), state)

    return optax.GradientTransformation(init, update)
