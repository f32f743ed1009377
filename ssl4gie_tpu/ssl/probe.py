"""Linear-probe recipes (MoCo v3 `main_lincls.py` / MAE `main_linprobe.py`).

Both probes evaluate an SSL checkpoint by training ONLY a linear classifier on
frozen features; they differ in head preconditioning and optimizer:

- MoCo v3 (`Models/moco_v3/main_lincls.py:158-166,233-237`): re-init the head
  to N(0, 0.01) weights / zero bias, freeze everything else, SGD(momentum=0.9,
  weight_decay=0) on the head params only.
- MAE (`Models/mae/main_linprobe.py:219-227,252`): an extra non-affine
  BatchNorm over the features right before the head ("BN-before-head" hack,
  `:221-222`), head weights trunc-normal(0.01), freeze-all-but-head, LARS with
  weight_decay=0 (`:252`).

Here each recipe is a (model flag, head re-init, optimizer) triple layered on
the shared engine: the BN lives in the model (`ViTClassifier(probe_bn=True)`),
the freeze is the optax mask of `make_frozen_tx`, and both optimizers are
wrapped in `inject_hyperparams` so the engine's plateau scheduler can still
drive the learning rate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ssl4gie_tpu.core.config import SSLFramework
from ssl4gie_tpu.core.train_state import make_frozen_tx
from ssl4gie_tpu.ssl.lars import lars


def probe_head_trainable(path: tuple) -> bool:
    """Trainable predicate: only the linear head learns. (The MAE probe's BN is
    affine=False — it owns no params, only batch_stats, which update through
    the model's mutable collection, exactly like torch's running stats.)"""
    return any(p == "lin_head" for p in path)


def reinit_head(params, key, std: float = 0.01):
    """Re-initialize `lin_head` the way both probe scripts do: weights
    ~N(0, std) (MoCo `main_lincls.py:164-165`; MAE uses trunc-normal with the
    same std, `main_linprobe.py:219`), bias zero."""
    head = params["lin_head"]
    new_head = {
        "kernel": std * jax.random.normal(key, head["kernel"].shape,
                                          jnp.float32),
        "bias": jnp.zeros_like(head["bias"]),
    }
    out = dict(params)
    out["lin_head"] = new_head
    return out


def probe_optimizer(framework: SSLFramework, learning_rate: float
                    ) -> optax.GradientTransformation:
    """The probe-specific optimizer, LR injectable for plateau scheduling."""
    if framework == SSLFramework.MOCOV3:
        make = lambda learning_rate: optax.sgd(learning_rate, momentum=0.9)
    elif framework == SSLFramework.MAE:
        make = lambda learning_rate: lars(learning_rate, weight_decay=0.0,
                                          momentum=0.9)
    else:
        raise ValueError(f"no linear-probe recipe for framework {framework}")
    return optax.inject_hyperparams(make)(learning_rate=learning_rate)


def make_probe_tx(framework: SSLFramework, learning_rate: float, params
                  ) -> optax.GradientTransformation:
    """Probe optimizer with everything but the head frozen."""
    tx = probe_optimizer(framework, learning_rate)
    return make_frozen_tx(tx, params, probe_head_trainable)
