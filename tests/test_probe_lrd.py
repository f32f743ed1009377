"""Linear-probe recipes (MoCo `main_lincls.py`, MAE `main_linprobe.py`) and
BEiT layer-wise LR decay (`mae/util/lr_decay.py`)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ssl4gie_tpu.core.config import (Architecture, DataConfig, OptimConfig,
                                     Pretraining, RuntimeConfig, SSLFramework,
                                     Task, TrainConfig)
from ssl4gie_tpu.tasks import build_trainer


def probe_config(framework, tmp, arch=Architecture.VIT_B):
    return TrainConfig(
        task=Task.CLASSIFICATION, architecture=arch,
        pretraining=Pretraining.HYPERKVASIR, ss_framework=framework,
        probe=True, epochs=1,
        data=DataConfig(dataset="synthetic", batch_size=8, num_workers=2,
                        img_size=64, synthetic=True, synthetic_size=16),
        optim=OptimConfig(learning_rate=1e-2, use_plateau_scheduler=True),
        runtime=RuntimeConfig(compute_dtype="float32", log_every=1),
        ckpt_dir=os.path.join(tmp, "ckpt"), log_dir=os.path.join(tmp, "logs"))


def _flat(tree):
    return {"/".join(str(getattr(p, "key", p)) for p in path): np.asarray(v)
            for path, v in jax.tree_util.tree_leaves_with_path(tree)}


def _opt_state_types(opt_state):
    names = set()

    def walk(node):
        names.add(type(node).__name__)
        if isinstance(node, (tuple, list)):
            for c in node:
                walk(c)
    walk(opt_state)
    return names


@pytest.mark.parametrize("framework", [SSLFramework.MOCOV3, SSLFramework.MAE])
def test_probe_trains_only_head(framework):
    with tempfile.TemporaryDirectory() as tmp:
        cfg = probe_config(framework, tmp)
        trainer = build_trainer(cfg)
        before = _flat(trainer.state.params)
        types = _opt_state_types(trainer.state.opt_state)
        if framework == SSLFramework.MOCOV3:
            # SGD momentum (`main_lincls.py:233-237`)
            assert "TraceState" in types, types
            assert "LarsState" not in types
            assert "head_bn" not in before.keys().__str__()
        else:
            # LARS (`main_linprobe.py:252`) + BN-before-head (`:221-222`)
            assert "LarsState" in types, types
            stats = _flat(trainer.state.batch_stats)
            assert any("head_bn" in k for k in stats), stats.keys()
        trainer.fit()
        after = _flat(trainer.state.params)
        for k in before:
            if k.startswith("lin_head"):
                assert not np.allclose(before[k], after[k]), f"{k} did not train"
            else:
                np.testing.assert_array_equal(
                    before[k], after[k], err_msg=f"frozen param {k} moved")
        if framework == SSLFramework.MAE:
            # BN running stats must update during the probe (torch BN does)
            stats_after = _flat(trainer.state.batch_stats)
            assert any("head_bn" in k and not np.allclose(stats[k], stats_after[k])
                       for k in stats)


def test_probe_head_reinit_matches_recipe():
    from ssl4gie_tpu.ssl.probe import reinit_head
    params = {"lin_head": {"kernel": jnp.ones((768, 6)),
                           "bias": jnp.ones((6,))},
              "backbone": {"w": jnp.ones((3,))}}
    out = reinit_head(params, jax.random.PRNGKey(0))
    assert float(jnp.abs(out["lin_head"]["bias"]).max()) == 0.0
    k = np.asarray(out["lin_head"]["kernel"])
    assert abs(k.std() - 0.01) < 0.005 and abs(k.mean()) < 0.005
    np.testing.assert_array_equal(np.asarray(out["backbone"]["w"]), 1.0)


def test_probe_validation():
    with tempfile.TemporaryDirectory() as tmp:
        cfg = probe_config(SSLFramework.MAE, tmp)
        cfg.task = Task.SEGMENTATION
        with pytest.raises(ValueError):
            cfg.validate()
        cfg2 = probe_config(SSLFramework.BARLOWTWINS, tmp,
                            arch=Architecture.RESNET50)
        with pytest.raises(ValueError):
            cfg2.validate()


# ------------------------------------------------------------ layer decay

def test_vit_layer_ids():
    from ssl4gie_tpu.ssl.lr_decay import vit_layer_id
    assert vit_layer_id(("backbone", "pos_embed")) == 0
    assert vit_layer_id(("backbone", "cls_token")) == 0
    assert vit_layer_id(("backbone", "patch_embed", "proj", "kernel")) == 0
    assert vit_layer_id(("backbone", "blocks_0", "attn", "qkv", "kernel")) == 1
    assert vit_layer_id(("backbone", "blocks_11", "mlp", "fc1", "bias")) == 12
    assert vit_layer_id(("backbone", "norm", "scale")) == 13
    assert vit_layer_id(("lin_head", "kernel")) == 13


def test_scale_by_layer_decay_update():
    from ssl4gie_tpu.ssl.lr_decay import scale_by_layer_decay
    params = {"backbone": {"pos_embed": jnp.zeros((5,)),
                           "blocks_11": {"w": jnp.zeros((3,))}},
              "lin_head": {"kernel": jnp.zeros((2,))}}
    tx = scale_by_layer_decay(params, depth=12, decay=0.75)
    state = tx.init(params)
    ones = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(ones, state, params)
    # head: decay^(13-13)=1; block 11: decay^(13-12); pos_embed: decay^13
    np.testing.assert_allclose(np.asarray(updates["lin_head"]["kernel"]), 1.0)
    np.testing.assert_allclose(
        np.asarray(updates["backbone"]["blocks_11"]["w"]), 0.75)
    np.testing.assert_allclose(
        np.asarray(updates["backbone"]["pos_embed"]), 0.75 ** 13, rtol=1e-6)


def test_layer_decay_composes_with_plateau_lr():
    """layer_decay chained after adamw must not break get_lr/set_lr."""
    from ssl4gie_tpu.core.train_state import get_lr, make_adamw, set_lr
    from ssl4gie_tpu.ssl.lr_decay import scale_by_layer_decay
    params = {"backbone": {"blocks_0": {"w": jnp.ones((3,))}},
              "lin_head": {"kernel": jnp.ones((2,))}}
    tx = optax.chain(make_adamw(1e-4), scale_by_layer_decay(params))
    st = tx.init(params)
    assert get_lr(st) == pytest.approx(1e-4)
    st2 = set_lr(st, 5e-5)
    assert get_lr(st2) == pytest.approx(5e-5)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, st2, params)
    jax.tree_util.tree_map(lambda u: np.isfinite(np.asarray(u)).all(), updates)
