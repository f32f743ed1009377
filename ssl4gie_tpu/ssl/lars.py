"""LARS optimizer (optax), matching the vendored MoCo/MAE LARS semantics
(`Models/moco_v3/moco/optimizer.py:18-43`): layer-wise trust-ratio scaling and weight
decay applied only to parameters with ndim > 1 (i.e. not biases / norm gammas),
heavy-ball momentum buffer, update = -lr * mu."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class LarsState(NamedTuple):
    mu: optax.Updates


def lars(learning_rate, weight_decay: float = 0.0, momentum: float = 0.9,
         trust_coefficient: float = 0.001) -> optax.GradientTransformation:
    """learning_rate: float or optax schedule (called on step count)."""

    def init(params):
        return (LarsState(mu=jax.tree_util.tree_map(jnp.zeros_like, params)),
                optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))) \
            if callable(learning_rate) else \
            LarsState(mu=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params):
        if callable(learning_rate):
            lars_state, sched_state = state
            lr = learning_rate(sched_state.count)
            new_sched = optax.ScaleByScheduleState(count=sched_state.count + 1)
        else:
            lars_state, new_sched = state, None
            lr = learning_rate

        def one(g, p, mu):
            dp = g
            if p.ndim > 1:
                dp = dp + weight_decay * p
                p_norm = jnp.linalg.norm(p)
                u_norm = jnp.linalg.norm(dp)
                q = jnp.where(p_norm > 0.0,
                              jnp.where(u_norm > 0.0,
                                        trust_coefficient * p_norm / u_norm, 1.0),
                              1.0)
                dp = dp * q
            new_mu = momentum * mu + dp
            return -lr * new_mu, new_mu

        flat = jax.tree_util.tree_map(one, grads, params, lars_state.mu)
        updates = jax.tree_util.tree_map(lambda t: t[0], flat,
                                         is_leaf=lambda t: isinstance(t, tuple))
        new_mu = jax.tree_util.tree_map(lambda t: t[1], flat,
                                        is_leaf=lambda t: isinstance(t, tuple))
        new_state = LarsState(mu=new_mu)
        if new_sched is not None:
            return updates, (new_state, new_sched)
        return updates, new_state

    return optax.GradientTransformation(init, update)
