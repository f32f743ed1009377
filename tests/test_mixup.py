"""Mixup/CutMix + label smoothing + soft-target CE + acc@k — the MAE
supervised-finetune recipe surface (`Models/mae/main_finetune.py:219-226`,
`engine_finetune.py:98-130`)."""

import jax
import jax.numpy as jnp
import numpy as np

from ssl4gie_tpu.data.augment import mixup_cutmix
from ssl4gie_tpu.metrics.classification import (accuracy_topk,
                                                smooth_one_hot,
                                                soft_target_cross_entropy,
                                                weighted_cross_entropy)


def test_smooth_one_hot():
    y = smooth_one_hot(jnp.asarray([0, 2]), 4, smoothing=0.1)
    np.testing.assert_allclose(np.asarray(jnp.sum(y, -1)), [1.0, 1.0], rtol=1e-6)
    assert abs(float(y[0, 0]) - (0.9 + 0.025)) < 1e-6
    assert abs(float(y[0, 1]) - 0.025) < 1e-6


def test_soft_ce_equals_hard_ce_on_one_hot():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(0, 2, (16, 5)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, 16))
    hard = weighted_cross_entropy(logits, labels)
    soft = soft_target_cross_entropy(logits, smooth_one_hot(labels, 5, 0.0))
    assert abs(float(hard) - float(soft)) < 1e-5


def test_accuracy_topk():
    logits = jnp.asarray([[3.0, 2.0, 1.0, 0.0]] * 4)
    labels = jnp.asarray([0, 1, 2, 3])
    a1, a2 = accuracy_topk(logits, labels, ks=(1, 2))
    assert abs(float(a1) - 25.0) < 1e-5
    assert abs(float(a2) - 50.0) < 1e-5


def test_mixup_branch_convex_and_consistent():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((6, 8, 8, 3)).astype(np.float32))
    # every reverse-order partner has a different class, so lambda is
    # recoverable from any target row
    y = smooth_one_hot(jnp.asarray([0, 0, 0, 1, 1, 1]), 2, 0.0)
    mixed, ty = mixup_cutmix(jax.random.PRNGKey(0), img, y,
                             mixup_alpha=0.8, cutmix_alpha=0.0)
    # recover lambda from the targets and check the image used the same one
    lam = float(jnp.max(ty))                      # rows are lam/1-lam splits
    lam = max(lam, 1 - lam)
    a = lam * img + (1 - lam) * img[::-1]
    b = (1 - lam) * img + lam * img[::-1]
    da = float(jnp.max(jnp.abs(mixed - a)))
    db = float(jnp.max(jnp.abs(mixed - b)))
    assert min(da, db) < 1e-5
    np.testing.assert_allclose(np.asarray(jnp.sum(ty, -1)), np.ones(6), rtol=1e-5)


def test_cutmix_branch_pixels_and_area():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((4, 16, 16, 3)).astype(np.float32))
    y = smooth_one_hot(jnp.asarray([0, 1, 2, 3]), 4, 0.0)
    mixed, ty = mixup_cutmix(jax.random.PRNGKey(3), img, y,
                             mixup_alpha=0.0, cutmix_alpha=1.0)
    # every output pixel comes from the sample or its partner
    from_self = np.isclose(np.asarray(mixed), np.asarray(img)).all(-1)
    from_flip = np.isclose(np.asarray(mixed), np.asarray(img[::-1])).all(-1)
    assert (from_self | from_flip).all()
    # lambda in the targets equals the kept-area fraction
    lam = float(ty[0, 0])
    lam = max(lam, 1 - lam)
    kept = from_self.mean()
    assert abs(max(kept, 1 - kept) - lam) < 0.02


def test_task_definition_wires_mixup(tmp_path):
    from ssl4gie_tpu.core.config import (Architecture, DataConfig, OptimConfig,
                                         RuntimeConfig, Task, TrainConfig)
    from ssl4gie_tpu.tasks.build import make_task_definition

    cfg = TrainConfig(
        task=Task.CLASSIFICATION, architecture=Architecture.RESNET50, epochs=1,
        data=DataConfig(dataset="synthetic", batch_size=4, synthetic=True),
        optim=OptimConfig(mixup=0.8, cutmix=1.0, label_smoothing=0.1),
        runtime=RuntimeConfig(compute_dtype="float32"),
        ckpt_dir=str(tmp_path), log_dir=str(tmp_path))
    td, _ = make_task_definition(cfg, {"n_class": 3,
                                       "class_weights": np.ones(3)})
    assert td.mixup_fn is not None
    img = jnp.zeros((4, 8, 8, 3))
    labels = jnp.asarray([0, 1, 2, 0])
    mixed, soft = td.mixup_fn(jax.random.PRNGKey(0), img, labels)
    assert soft.shape == (4, 3)
    loss = td.loss_fn(jnp.zeros((4, 3)), soft)
    assert np.isfinite(float(loss))
