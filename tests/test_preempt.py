"""Preemption checkpoint-and-requeue (core/preempt.py — the TPU-native
equivalent of submitit's checkpoint() requeue hook,
`Models/mae/submitit_pretrain.py:60-70`)."""

import os
import signal
import tempfile

import jax
import pytest

from ssl4gie_tpu.core.config import (Architecture, DataConfig, OptimConfig,
                                     RuntimeConfig, Task, TrainConfig)
from ssl4gie_tpu.core.preempt import (REQUEUE_EXIT_CODE, Preempted,
                                      PreemptionGuard)
from ssl4gie_tpu.tasks import build_trainer


def tiny_config(tmp, epochs=3):
    return TrainConfig(
        task=Task.CLASSIFICATION, architecture=Architecture.RESNET50,
        epochs=epochs,
        data=DataConfig(dataset="synthetic", batch_size=8, num_workers=2,
                        img_size=64, synthetic=True, synthetic_size=16),
        optim=OptimConfig(learning_rate=1e-3, use_plateau_scheduler=True),
        runtime=RuntimeConfig(compute_dtype="float32", log_every=1),
        ckpt_dir=os.path.join(tmp, "ckpt"), log_dir=os.path.join(tmp, "logs"))


def test_guard_latches_sigterm_and_restores_handler():
    prev = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as guard:
        assert not guard.should_stop
        os.kill(os.getpid(), signal.SIGTERM)
        # the python-level handler runs between bytecodes; a no-op call forces it
        signal.getsignal(signal.SIGTERM)
        assert guard.should_stop
    assert signal.getsignal(signal.SIGTERM) is prev


def test_trainer_preempt_saves_and_resumes():
    """A signal during epoch 1 stops training at the next boundary with a
    requeue checkpoint; a relaunched trainer resumes past the completed work
    instead of restarting, while the best-val slot stays eval-loadable."""
    with tempfile.TemporaryDirectory() as tmp:
        cfg = tiny_config(tmp)
        trainer = build_trainer(cfg)

        calls = {"n": 0}
        orig_eval = trainer.evaluate

        def eval_and_preempt(loader, epoch, split):
            calls["n"] += 1
            if calls["n"] == 1:     # during epoch 1's val pass
                os.kill(os.getpid(), signal.SIGTERM)
            return orig_eval(loader, epoch, split)

        trainer.evaluate = eval_and_preempt
        with pytest.raises(Preempted):
            trainer.fit()
        assert trainer.preempt_ckpt.exists()

        trainer2 = build_trainer(cfg)
        trainer2.maybe_resume()
        assert trainer2.start_epoch == 2          # epoch 1 complete
        assert trainer2.best_val is not None

        # relaunch-to-completion: the supervisor's re-exec of the same command
        trainer3 = build_trainer(cfg)
        best = trainer3.fit()
        assert best is not None
        assert trainer3.ckpt.exists()
        # the .preempt slot is deleted once the rerun trains past its epoch,
        # so a later relaunch can never prefer the stale requeue state
        assert not trainer3.preempt_ckpt.exists()

    assert REQUEUE_EXIT_CODE == 42


def test_mid_epoch_preempt_saves_boundary_state():
    """A signal in the middle of an epoch must save the state as of the last
    epoch BOUNDARY (not in-flight params), so the replayed epoch does not
    apply its first batches twice."""
    import numpy as np

    with tempfile.TemporaryDirectory() as tmp:
        cfg = tiny_config(tmp)
        trainer = build_trainer(cfg)

        orig_step = trainer.train_step
        calls = {"n": 0}

        def step_and_preempt(state, batch, rng):
            calls["n"] += 1
            if calls["n"] == 1:     # latch during epoch 1's first step, so the
                # NEXT step's poll stops mid-epoch (one update has applied)
                os.kill(os.getpid(), signal.SIGTERM)
                signal.getsignal(signal.SIGTERM)
            return orig_step(state, batch, rng)

        init_params = jax.device_get(trainer.state.params)  # host copy:
        # the jitted step donates the state, invalidating old device buffers
        trainer.train_step = step_and_preempt
        with pytest.raises(Preempted):
            trainer.fit()
        assert trainer.preempt_ckpt.exists()

        restored = trainer.preempt_ckpt.restore(
            trainer._ckpt_tree(0, 0.0, 0.0))
        assert int(restored["meta"]["epoch"]) == 0   # nothing complete yet
        leaves_saved = jax.tree_util.tree_leaves(restored["params"])
        leaves_init = jax.tree_util.tree_leaves(init_params)
        for a, b in zip(leaves_saved, leaves_init):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_detection_trainer_preempt_saves_and_resumes():
    """Detection variant of the requeue protocol: a mid-epoch signal saves the
    last epoch BOUNDARY into the `.preempt` sibling slot, a relaunch resumes
    past the completed epochs, and a run that trains past the slot deletes it
    (parity with core.trainer.Trainer; `submitit_pretrain.py:60-70`)."""
    with tempfile.TemporaryDirectory() as tmp:
        cfg = TrainConfig(
            task=Task.DETECTION, architecture=Architecture.RESNET50,
            epochs=2,
            data=DataConfig(dataset="synthetic", batch_size=8, num_workers=2,
                            img_size=128, synthetic=True, synthetic_size=16),
            optim=OptimConfig(learning_rate=1e-4, use_plateau_scheduler=True),
            runtime=RuntimeConfig(compute_dtype="float32", log_every=1),
            ckpt_dir=os.path.join(tmp, "ckpt"),
            log_dir=os.path.join(tmp, "logs"))
        trainer = build_trainer(cfg)

        orig_step = trainer.train_step
        calls = {"n": 0}

        def step_and_preempt(state, batch, rng):
            calls["n"] += 1
            if calls["n"] == 3:     # first step of epoch 2 (2 steps/epoch):
                # the latch is polled at the NEXT step, mid-epoch
                os.kill(os.getpid(), signal.SIGTERM)
                signal.getsignal(signal.SIGTERM)
            return orig_step(state, batch, rng)

        trainer.train_step = step_and_preempt
        with pytest.raises(Preempted):
            trainer.fit()
        assert trainer.preempt_ckpt.exists()
        saved = trainer.preempt_ckpt.restore(trainer._ckpt_tree(0, 0.0, 0.0))
        assert int(saved["meta"]["epoch"]) == 1   # epoch 1 complete, not the
        # in-flight epoch-2 params

        trainer2 = build_trainer(cfg)
        trainer2.maybe_resume()
        assert trainer2.start_epoch == 2

        # relaunch-to-completion deletes the stale requeue slot
        trainer3 = build_trainer(cfg)
        best = trainer3.fit()
        assert best is not None
        assert not trainer3.preempt_ckpt.exists()
