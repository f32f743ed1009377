"""TrainState and optimizer construction.

One TrainState shared by every task (the reference instead re-implements the same
AdamW + GradScaler setup in each of four train_*.py scripts, e.g.
`train_classification.py:225-230`). On TPU we use bf16 compute with fp32 params and
optimizer state, so no GradScaler is needed.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: optax.OptState
    batch_stats: Any                       # BatchNorm running stats (ResNet paths)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, **kwargs):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state, **kwargs)

    @classmethod
    def create(cls, apply_fn, params, tx, batch_stats=None):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), batch_stats=batch_stats or FrozenDict({}),
                   tx=tx, apply_fn=apply_fn)


def make_adamw(learning_rate: float = 1e-4, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8, weight_decay: float = 1e-2,
               grad_clip: Optional[float] = None,
               mask: Any = None) -> optax.GradientTransformation:
    """AdamW with an injectable learning rate (for host-driven plateau scheduling).

    Matches torch.optim.AdamW defaults the reference relies on
    (`train_classification.py:226`: lr=args.learning_rate, rest default).
    The LR lives in opt_state hyperparams, so the plateau scheduler can halve it
    without re-jitting the train step.
    """
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.inject_hyperparams(
        lambda learning_rate: optax.adamw(
            learning_rate, b1=b1, b2=b2, eps=eps,
            weight_decay=weight_decay, mask=mask))(learning_rate=learning_rate))
    return optax.chain(*chain)


def _locate_inject_state(node):
    """Path (tuple of child indices) to the InjectHyperparamsState holding
    'learning_rate', searching through arbitrarily nested chain/wrapper states
    (chain tuples, MaskedState and friends are all tuples/NamedTuples)."""
    if hasattr(node, "hyperparams") and "learning_rate" in node.hyperparams:
        return ()
    if isinstance(node, (tuple, list)):
        for i, child in enumerate(node):
            sub = _locate_inject_state(child)
            if sub is not None:
                return (i,) + sub
    return None


def _follow(node, path):
    for i in path:
        node = node[i]
    return node


def _rebuild(node, path, leaf_fn):
    if not path:
        return leaf_fn(node)
    i = path[0]
    children = list(node)
    children[i] = _rebuild(children[i], path[1:], leaf_fn)
    if hasattr(node, "_make"):          # NamedTuple (chain/wrapper states)
        return node._make(children)
    return children if isinstance(node, list) else tuple(children)


def get_lr(opt_state) -> float:
    """Read the current injected LR back out of an optimizer state."""
    path = _locate_inject_state(opt_state)
    if path is None:
        raise ValueError("opt_state contains no inject_hyperparams learning_rate")
    return float(_follow(opt_state, path).hyperparams["learning_rate"])


def set_lr(opt_state, lr: float):
    """Return opt_state with the injected LR replaced (host-side, cheap)."""
    path = _locate_inject_state(opt_state)
    if path is None:
        raise ValueError("opt_state contains no inject_hyperparams learning_rate")
    return _rebuild(opt_state, path, lambda s: s._replace(
        hyperparams={**s.hyperparams,
                     "learning_rate": jnp.asarray(lr, jnp.float32)}))


def freeze_mask(params, trainable_predicate: Callable[[tuple], bool]):
    """Build an optax mask pytree: True = trainable. Used for --frozen runs
    (reference freezes encoder with torch.no_grad(), Models/models.py:138-140;
    here we zero gradients through an optax mask instead)."""
    flat = jax.tree_util.tree_map_with_path(
        lambda path, _: trainable_predicate(tuple(
            p.key if hasattr(p, "key") else str(p) for p in path)), params)
    return flat


def make_frozen_tx(tx: optax.GradientTransformation, params,
                   trainable_predicate: Callable[[tuple], bool]):
    """Wrap tx so that non-trainable params receive zero updates.

    The frozen mask must be applied both BEFORE tx (keep frozen grads out of
    momentum) and AFTER tx (AdamW's decoupled weight decay adds -lr*wd*param to
    the update regardless of the gradient — zeroing only the gradient would still
    decay frozen weights)."""
    mask = freeze_mask(params, trainable_predicate)
    inv = jax.tree_util.tree_map(lambda t: not t, mask)
    zero_frozen = lambda: optax.masked(optax.set_to_zero(), inv)
    return optax.chain(zero_frozen(), tx, zero_frozen())
