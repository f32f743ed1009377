"""Tensor-parallel sharding equivalence on the virtual 8-device CPU mesh.

DP8 and DP4xTP2 must produce the same losses and parameters (up to float
reduction order): TP is a pure re-layout under GSPMD — no math changes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ssl4gie_tpu.core.mesh import data_sharding, make_mesh, replicated
from ssl4gie_tpu.core.train_state import TrainState
from ssl4gie_tpu.core.trainer import TaskDefinition, make_train_step
from ssl4gie_tpu.models.vit import ViTBackbone
from ssl4gie_tpu.parallel.tp import place_tp, tp_sharding_tree, tp_spec


import flax.linen as nn


class TinyViTCls(nn.Module):
    num_classes: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ViTBackbone(img_size=32, embed_dim=64, depth=2, num_heads=4,
                           name="backbone")(x, train)
        return nn.Dense(self.num_classes, name="lin_head")(feat)


def _soft_ce(logits, labels):
    logp = jax.nn.log_softmax(logits)
    onehot = jax.nn.one_hot(labels, logits.shape[-1])
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def _run(mesh, place_fn, steps=3):
    model = TinyViTCls()
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(0, 1, (3, 8, 32, 32, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, (3, 8)).astype(np.int32))

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    # SGD+momentum: updates are linear in the grads, so the DP-vs-TP bound is
    # tight. (Verified separately that raw grads agree to <1e-5 relative; adamw
    # per-element normalization amplifies reduction-order noise on elements
    # whose gradient is near zero, which is not a sharding defect.)
    tx = optax.sgd(1e-2, momentum=0.9)
    state = TrainState.create(model.apply, params, tx, {})
    state = place_fn(state)

    td = TaskDefinition(name="classification", aug_mode="none",
                        target_key="label", loss_fn=_soft_ce,
                        eval_metric_fn=None)
    step = make_train_step(td, top_level=False)
    losses = []
    for i in range(steps):
        batch = {"image": jax.device_put(imgs[i], data_sharding(mesh, 4)),
                 "label": jax.device_put(labels[i], data_sharding(mesh, 1))}
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    final = jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x)), state.params)
    return losses, final


@pytest.mark.slow
def test_dp_vs_tp_equivalence():
    n = len(jax.devices())
    if n < 8:
        pytest.skip("needs 8 virtual devices")
    dp_mesh = make_mesh((8,), ("data",))
    tp_mesh = make_mesh((4, 2), ("data", "model"))

    losses_dp, params_dp = _run(
        dp_mesh, lambda s: jax.device_put(s, replicated(dp_mesh)))
    losses_tp, params_tp = _run(tp_mesh, lambda s: place_tp(s, tp_mesh))

    np.testing.assert_allclose(losses_dp, losses_tp, rtol=2e-5, atol=2e-6)
    flat_dp = jax.tree_util.tree_leaves(params_dp)
    flat_tp = jax.tree_util.tree_leaves(params_tp)
    for a, b in zip(flat_dp, flat_tp):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_tp_rules_match_vit_paths():
    """Every block's qkv/proj/fc1/fc2 gets a sharded spec; LN/embeds don't."""
    from jax.sharding import PartitionSpec as P
    assert tp_spec("backbone/blocks_3/attn/qkv/kernel") == P(None, "model")
    assert tp_spec("backbone/blocks_0/attn/proj/kernel") == P("model", None)
    assert tp_spec("backbone/blocks_11/mlp/fc1/bias") == P("model")
    assert tp_spec("backbone/blocks_11/mlp/fc2/kernel") == P("model", None)
    assert tp_spec("backbone/norm/scale") == P()
    assert tp_spec("backbone/pos_embed") == P()
    assert tp_spec("lin_head/kernel") == P()
    # attn/proj/bias is added AFTER the psum -> replicated
    assert tp_spec("backbone/blocks_0/attn/proj/bias") == P()


def test_tp_sharding_tree_handles_opt_state_mirrors():
    """Optimizer mu/nu mirrors inherit the param's sharding via path suffix."""
    tp_mesh = make_mesh((len(jax.devices()) // 2, 2), ("data", "model"))
    params = {"blocks_0": {"attn": {"qkv": {"kernel": jnp.zeros((8, 24)),
                                            "bias": jnp.zeros((24,))}}}}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    tree = tp_sharding_tree({"params": params, "opt": opt_state}, tp_mesh)
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    kernel_specs = [s.spec for p, s in flat if "kernel" in str(p)]
    # params kernel + adam mu/nu kernels all sharded the same way
    assert len(kernel_specs) == 3
    assert all(spec == kernel_specs[0] for spec in kernel_specs)
    scalars = [s.spec for p, s in flat if "count" in str(p).lower()]
    from jax.sharding import PartitionSpec as P
    assert all(spec == P() for spec in scalars)


@pytest.mark.slow
def test_mae_pretrain_tp_equivalence():
    """run_pretraining with tensor_parallel=2: (4, 2) mesh, MAE encoder AND
    decoder blocks sharded, final encoder params ~= the DP run's (identical
    init; tolerance covers adamw's noise amplification on near-zero-grad
    elements — a real sharding bug produces O(param)-scale differences)."""
    import os
    import tempfile

    import ssl4gie_tpu.ssl.pretrain as pre
    from ssl4gie_tpu.core import checkpoint as ckpt_lib
    from ssl4gie_tpu.core.config import (Architecture, DataConfig,
                                         PretrainConfig, RuntimeConfig,
                                         SSLFramework)

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    def cfg(tmp, tp):
        return PretrainConfig(
            framework=SSLFramework.MAE, architecture=Architecture.VIT_B,
            epochs=2, warmup_epochs=0, batch_size=8, img_size=32,
            model_kwargs=dict(embed_dim=64, depth=2, num_heads=2,
                              decoder_embed_dim=32, decoder_depth=1,
                              decoder_num_heads=2),
            data=DataConfig(synthetic=True, synthetic_size=16, num_workers=2),
            runtime=RuntimeConfig(compute_dtype="float32", log_every=1,
                                  scan_steps=1, tensor_parallel=tp),
            ckpt_dir=os.path.join(tmp, "pre"))

    def run(tmp, tp):
        path = pre.run_pretraining(cfg(tmp, tp))
        mgr = ckpt_lib.CheckpointManager(os.path.dirname(path),
                                         os.path.basename(path))
        return mgr.restore()["params"]

    with tempfile.TemporaryDirectory() as ta, \
            tempfile.TemporaryDirectory() as tb:
        p_dp = jax.tree_util.tree_leaves(run(ta, 1))
        p_tp = jax.tree_util.tree_leaves(run(tb, 2))
        assert len(p_dp) == len(p_tp)
        for a, b in zip(p_dp, p_tp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=5e-5)


def test_tp_rejects_unsupported_combinations():
    import os
    import tempfile

    from ssl4gie_tpu.core.config import (Architecture, DataConfig, OptimConfig,
                                         RuntimeConfig, Task, TrainConfig)
    from ssl4gie_tpu.tasks import build_trainer

    def cfg(task, arch, tmp):
        return TrainConfig(
            task=task, architecture=arch, epochs=1,
            data=DataConfig(dataset="synthetic", batch_size=8, img_size=64,
                            synthetic=True, synthetic_size=16),
            optim=OptimConfig(learning_rate=1e-3),
            runtime=RuntimeConfig(compute_dtype="float32", tensor_parallel=2),
            ckpt_dir=os.path.join(tmp, "c"), log_dir=os.path.join(tmp, "l"))

    with tempfile.TemporaryDirectory() as tmp:
        with pytest.raises(ValueError, match="tensor-parallel"):
            build_trainer(cfg(Task.CLASSIFICATION, Architecture.RESNET50, tmp))
        with pytest.raises(ValueError, match="tensor-parallel"):
            build_trainer(cfg(Task.DETECTION, Architecture.VIT_B, tmp))


@pytest.mark.slow
def test_dp_vs_fsdp_and_hybrid_equivalence():
    """FSDP (params sharded over 'data') and hybrid FSDP+TP must match plain
    DP losses/params — placement only, ZeRO semantics come from GSPMD."""
    from ssl4gie_tpu.parallel.tp import make_place_fn

    n = len(jax.devices())
    if n < 8:
        pytest.skip("needs 8 virtual devices")
    dp_mesh = make_mesh((8,), ("data",))
    tp_mesh = make_mesh((4, 2), ("data", "model"))

    losses_dp, params_dp = _run(
        dp_mesh, lambda s: jax.device_put(s, replicated(dp_mesh)))
    losses_fs, params_fs = _run(dp_mesh, make_place_fn(dp_mesh, fsdp=True))
    losses_hy, params_hy = _run(tp_mesh,
                                make_place_fn(tp_mesh, tp=True, fsdp=True))

    for losses, params in ((losses_fs, params_fs), (losses_hy, params_hy)):
        np.testing.assert_allclose(losses_dp, losses, rtol=2e-5, atol=2e-6)
        for a, b in zip(jax.tree_util.tree_leaves(params_dp),
                        jax.tree_util.tree_leaves(params)):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_fsdp_actually_shards_params():
    """Big params live in 1/N-size shards; small leaves stay replicated."""
    from ssl4gie_tpu.parallel.tp import FSDP_MIN_ELEMENTS, hybrid_sharding_tree

    n = len(jax.devices())
    mesh = make_mesh((n,), ("data",))
    tree = {"mlp": {"fc1": {"kernel": jnp.zeros((64, 256)),
                            "bias": jnp.zeros((256,))}},
            "norm": {"scale": jnp.zeros((64,))}}
    placed = jax.device_put(tree, hybrid_sharding_tree(tree, mesh, fsdp=True))
    k = placed["mlp"]["fc1"]["kernel"]
    assert 64 * 256 >= FSDP_MIN_ELEMENTS
    shard_shape = k.addressable_shards[0].data.shape
    assert shard_shape == (64 // n, 256), shard_shape
    # tiny leaves replicated
    s = placed["norm"]["scale"]
    assert s.addressable_shards[0].data.shape == (64,)


def test_tp_head_divisibility_validated():
    from ssl4gie_tpu.parallel.tp import make_tp_mesh
    n = len(jax.devices())
    if n != 8:
        pytest.skip("assumes the conftest's 8 virtual devices")
    with pytest.raises(ValueError, match="head count"):
        make_tp_mesh(n, 12)   # 12 heads not divisible by 8
    m = make_tp_mesh(2, 12, 16)
    assert dict(m.shape) == {"data": n // 2, "model": 2}


@pytest.mark.slow
def test_moco_pretrain_tp_equivalence():
    """MoCo v3 vit_s under tensor_parallel=2: encoder+momentum+predictor state
    placed by the TP rules, InfoNCE einsum partitioned over data — final
    encoder params ~= the DP run's (same tolerance rationale as the MAE
    test)."""
    import os
    import tempfile

    import ssl4gie_tpu.ssl.pretrain as pre
    from ssl4gie_tpu.core import checkpoint as ckpt_lib
    from ssl4gie_tpu.core.config import (Architecture, DataConfig,
                                         PretrainConfig, RuntimeConfig,
                                         SSLFramework)

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    def cfg(tmp, tp):
        return PretrainConfig(
            framework=SSLFramework.MOCOV3, architecture=Architecture.VIT_S,
            epochs=2, warmup_epochs=0, batch_size=8, img_size=32,
            moco_dim=32, moco_mlp_dim=64,
            data=DataConfig(synthetic=True, synthetic_size=16, num_workers=2),
            runtime=RuntimeConfig(compute_dtype="float32", log_every=1,
                                  scan_steps=1, tensor_parallel=tp),
            ckpt_dir=os.path.join(tmp, "pre"))

    def run(tmp, tp):
        path = pre.run_pretraining(cfg(tmp, tp))
        mgr = ckpt_lib.CheckpointManager(os.path.dirname(path),
                                         os.path.basename(path))
        return mgr.restore()["params"]

    with tempfile.TemporaryDirectory() as ta, \
            tempfile.TemporaryDirectory() as tb:
        p_dp = jax.tree_util.tree_leaves(run(ta, 1))
        p_tp = jax.tree_util.tree_leaves(run(tb, 2))
        assert len(p_dp) == len(p_tp)
        for a, b in zip(p_dp, p_tp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=5e-5)
