"""End-to-end 1-epoch train smoke tests per task on synthetic data, running SPMD on
the 8-device virtual CPU mesh (SURVEY §4 plan (d)/(e))."""

import os
import tempfile

import jax
import numpy as np
import pytest

from ssl4gie_tpu.core.config import (Architecture, DataConfig, OptimConfig,
                                     RuntimeConfig, Task, TrainConfig)
from ssl4gie_tpu.tasks import build_trainer


def tiny_config(task, arch, tmp, epochs=2, img=64, bs=8):
    return TrainConfig(
        task=task, architecture=arch, epochs=epochs,
        data=DataConfig(dataset="synthetic", batch_size=bs, num_workers=2,
                        img_size=img, synthetic=True, synthetic_size=16),
        optim=OptimConfig(learning_rate=1e-3, use_plateau_scheduler=True),
        runtime=RuntimeConfig(compute_dtype="float32", log_every=1),
        ckpt_dir=os.path.join(tmp, "ckpt"), log_dir=os.path.join(tmp, "logs"))


def test_devices_visible():
    assert jax.device_count() == 8


@pytest.mark.parametrize("arch", [Architecture.VIT_B, Architecture.RESNET50])
def test_classification_e2e(arch):
    with tempfile.TemporaryDirectory() as tmp:
        cfg = tiny_config(Task.CLASSIFICATION, arch, tmp)
        trainer = build_trainer(cfg)
        best = trainer.fit()
        assert best is not None and 0.0 <= best <= 1.0
        # checkpoint written and resumable
        assert trainer.ckpt.exists()
        trainer2 = build_trainer(cfg)
        trainer2.maybe_resume()
        assert trainer2.start_epoch == trainer.epochs + 1 or trainer2.start_epoch > 1


def test_segmentation_e2e_vit():
    with tempfile.TemporaryDirectory() as tmp:
        cfg = tiny_config(Task.SEGMENTATION, Architecture.VIT_B, tmp, epochs=1)
        trainer = build_trainer(cfg)
        best = trainer.fit()
        assert 0.0 <= best <= 1.0


def test_depth_e2e_resnet():
    with tempfile.TemporaryDirectory() as tmp:
        cfg = tiny_config(Task.DEPTH, Architecture.RESNET50, tmp, epochs=1)
        trainer = build_trainer(cfg)
        best = trainer.fit()
        assert best >= 0.0  # SSI loss, mode=min


def test_loss_decreases_classification():
    with tempfile.TemporaryDirectory() as tmp:
        cfg = tiny_config(Task.CLASSIFICATION, Architecture.RESNET50, tmp,
                          epochs=1, img=32)
        cfg.optim.learning_rate = 1e-2
        trainer = build_trainer(cfg)
        losses = []
        for epoch in range(1, 6):
            loss = trainer.train_epoch(epoch)
            losses.append(loss)
        assert losses[-1] < losses[0]


@pytest.mark.slow
def test_depth_e2e_vit():
    with tempfile.TemporaryDirectory() as tmp:
        cfg = tiny_config(Task.DEPTH, Architecture.VIT_B, tmp, epochs=1)
        trainer = build_trainer(cfg)
        best = trainer.fit()
        assert best >= 0.0


def test_classification_e2e_tensor_parallel():
    """--tensor-parallel 2: (4, 2) (data, model) mesh, Megatron ViT sharding
    through build_trainer, one full fit epoch (beyond-reference extension)."""
    from jax.sharding import PartitionSpec as P

    with tempfile.TemporaryDirectory() as tmp:
        cfg = tiny_config(Task.CLASSIFICATION, Architecture.VIT_B, tmp,
                          epochs=1)
        cfg.runtime.tensor_parallel = 2
        trainer = build_trainer(cfg)
        assert dict(trainer.mesh.shape) == {"data": 4, "model": 2}
        qkv = trainer.state.params["backbone"]["blocks_0"]["attn"]["qkv"]
        assert qkv["kernel"].sharding.spec == P(None, "model")
        assert qkv["bias"].sharding.spec == P("model")
        best = trainer.fit()
        assert best is not None and 0.0 <= best <= 1.0


def test_classification_e2e_fsdp():
    """--fsdp through build_trainer: params+opt sharded over the data axis,
    one full fit epoch, resume re-places with the same layout."""
    from jax.sharding import PartitionSpec as P

    with tempfile.TemporaryDirectory() as tmp:
        cfg = tiny_config(Task.CLASSIFICATION, Architecture.VIT_B, tmp,
                          epochs=1)
        cfg.runtime.fsdp = True
        trainer = build_trainer(cfg)
        qkv = trainer.state.params["backbone"]["blocks_0"]["attn"]["qkv"]
        # (768, 2304) kernel: dim 0 sharded 8-way over data
        assert qkv["kernel"].sharding.spec == P("data", None)
        assert qkv["kernel"].addressable_shards[0].data.shape[0] == 768 // 8
        best = trainer.fit()
        assert best is not None and 0.0 <= best <= 1.0
        trainer2 = build_trainer(cfg)
        trainer2.maybe_resume()
        q2 = trainer2.state.params["backbone"]["blocks_0"]["attn"]["qkv"]
        assert q2["kernel"].sharding.spec == P("data", None)   # kept on resume
