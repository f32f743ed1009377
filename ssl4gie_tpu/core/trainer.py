"""The shared training engine.

The reference re-implements one ~400-line train/val/ckpt loop per task
(`train_classification.py`, `train_segmentation.py`, `train_detection.py`,
`train_depth.py`); here the convention is factored into one engine:

- one jitted `train_step(state, batch, rng) -> (state, metrics)` with optional
  gradient accumulation via `lax.scan` over microbatches (the reference's detection
  `--accum_iter`, `train_detection.py:73-81`),
- SPMD data parallelism: state replicated, batch sharded over the mesh data axis
  (XLA inserts the gradient psum the reference gets from DDP/NCCL),
- per-epoch validation + test, ReduceLROnPlateau on the broadcast val metric,
  best-val checkpointing with full resume (reference protocol §5.4),
- throughput logging (images/sec, step-time) as first-class metrics.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssl4gie_tpu.core import checkpoint as ckpt_lib
from ssl4gie_tpu.core.logger import MetricsLogger, Throughput
from ssl4gie_tpu.core.mesh import replicated
from ssl4gie_tpu.core.preempt import Preempted, PreemptionGuard
from ssl4gie_tpu.core.schedule import ReduceLROnPlateau
from ssl4gie_tpu.core.train_state import TrainState, get_lr, set_lr
from ssl4gie_tpu.data.augment import augment_train_batch, eval_batch


@dataclasses.dataclass
class TaskDefinition:
    """What a task contributes to the engine (build/loss/metric per SURVEY §2.6)."""
    name: str
    aug_mode: str                       # classification | segmentation | depth | none
    target_key: str                     # label | mask | depth
    loss_fn: Callable                   # (outputs, targets) -> scalar loss
    eval_metric_fn: Callable            # see eval_kind
    eval_kind: str = "batch_metric"     # batch_metric | accumulate_preds
    select_mode: str = "max"            # plateau/selection direction
    has_dropout: bool = False
    train_arg_via_kwarg: bool = True
    # optional train-time target/image mixer applied after the augmentation
    # ((key, img, targets) -> (img, targets)); classification mixup/cutmix
    # (`Models/mae/main_finetune.py:219-226`)
    mixup_fn: Optional[Callable] = None
    # optional replacement train transform ((key, img_u8) -> img), overriding
    # the aug_mode stack: the probe recipe (RRC+hflip only) or the timm
    # --aa/--reprob finetune stack (`data/randaug.py`)
    aug_fn: Optional[Callable] = None


def make_train_step(task: TaskDefinition, accum_steps: int = 1,
                    top_level: bool = True):
    """Build the jitted SPMD train step.

    top_level=False skips the TPU compiler options (jax only allows
    compiler_options on the outermost jit) for callers that wrap this
    step inside their own jit/scan (bench.py, __graft_entry__)."""

    def loss_for_params(params, state, batch, rng):
        variables = {"params": params}
        mutable = []
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
            mutable = ["batch_stats"]
        rngs = {"dropout": rng} if task.has_dropout else None
        if mutable:
            outputs, new_model_state = state.apply_fn(
                variables, batch["image"], train=True, mutable=mutable, rngs=rngs)
        else:
            outputs = state.apply_fn(variables, batch["image"], train=True, rngs=rngs)
            new_model_state = {}
        loss = task.loss_fn(outputs, batch[task.target_key])
        return loss, new_model_state.get("batch_stats", state.batch_stats)

    grad_fn = jax.value_and_grad(loss_for_params, has_aux=True)

    def train_step(state: TrainState, batch, rng):
        if accum_steps == 1:
            (loss, new_bs), grads = grad_fn(state.params, state, batch, rng)
        else:
            # split the global batch into microbatches and scan, averaging grads —
            # the reference's detection --accum_iter without host round-trips.
            b = jax.tree_util.tree_map(
                lambda x: x.reshape((accum_steps, x.shape[0] // accum_steps)
                                    + x.shape[1:]), batch)
            rngs = jax.random.split(rng, accum_steps)

            def body(carry, xs):
                grads_acc, loss_acc, bs = carry
                mb, r = xs
                st = state.replace(batch_stats=bs)
                (l, new_bs_), g = grad_fn(state.params, st, mb, r)
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, g)
                return (grads_acc, loss_acc + l, new_bs_), None

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, loss_sum, new_bs), _ = jax.lax.scan(
                body, (zero_grads, jnp.zeros(()), state.batch_stats), (b, rngs))
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
            loss = loss_sum / accum_steps
        new_state = state.apply_gradients(grads, batch_stats=new_bs)
        return new_state, {"loss": loss}

    from ssl4gie_tpu.core.xla_options import jit_kwargs
    return jax.jit(train_step, donate_argnums=(0,),
                   **(jit_kwargs(task.name) if top_level else {}))


def make_eval_step(task: TaskDefinition):
    """Jitted eval step over a PADDED batch (static shape -> one compile).

    `valid` masks out the padding. For `batch_metric` tasks `eval_metric_fn`
    returns per-sample (numerator, denominator) pairs; the step reduces them to
    masked sums, and the host forms the per-batch ratio — equal-weight per
    batch, like the reference test() loops (`train_segmentation.py:90-95`)."""
    def eval_step(state: TrainState, batch, valid):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        outputs = state.apply_fn(variables, batch["image"], train=False)
        if task.eval_kind == "accumulate_preds":
            return jnp.argmax(outputs, axis=-1)
        num, den = task.eval_metric_fn(outputs, batch[task.target_key])
        v = valid.astype(num.dtype)
        return jnp.sum(num * v), jnp.sum(den * v)
    return jax.jit(eval_step)


def _pad_eval_batch(batch: dict, static_b: int):
    """Pad a (possibly ragged tail) batch to `static_b` rows by repeating the
    last sample. Returns (padded batch of np arrays, true row count)."""
    arrs = {k: np.asarray(v) for k, v in batch.items()}
    n = next(iter(arrs.values())).shape[0]
    if n == static_b:
        return arrs, n
    pad = static_b - n
    return {k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
            for k, v in arrs.items()}, n


class Trainer:
    def __init__(self, *, task: TaskDefinition, state: TrainState, mesh,
                 train_loader, val_loader, test_loader,
                 logger: MetricsLogger, ckpt: ckpt_lib.CheckpointManager,
                 epochs: int, accum_steps: int = 1, seed: int = 42,
                 plateau: Optional[ReduceLROnPlateau] = None,
                 eval_finalize: Optional[Callable] = None,
                 log_every: int = 10, place_fn: Optional[Callable] = None):
        self.task = task
        self.state = state
        self.mesh = mesh
        # the state-placement policy (replicated / TP / FSDP), reused on resume
        self.place_fn = place_fn or (
            lambda tree: jax.device_put(tree, replicated(mesh)))
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.test_loader = test_loader
        self.logger = logger
        self.ckpt = ckpt
        self.epochs = epochs
        self.seed = seed
        self.plateau = plateau
        self.eval_finalize = eval_finalize   # e.g. meanF1 over accumulated preds
        self.log_every = log_every
        self.train_step = make_train_step(task, accum_steps)
        self.eval_step = make_eval_step(task)
        self.start_epoch = 1
        self.best_val: Optional[float] = None
        self.root_key = jax.random.PRNGKey(seed)
        # sibling slot for preemption saves: the best-val slot must keep the
        # BEST params (eval/predict load it), so the requeue state lives next
        # to it and maybe_resume picks whichever is newer
        import os as _os
        self.preempt_ckpt = ckpt_lib.CheckpointManager(
            _os.path.dirname(ckpt.path), _os.path.basename(ckpt.path) + ".preempt")
        self._guard: Optional[PreemptionGuard] = None
        # host-side state snapshot taken at each epoch BOUNDARY; a mid-epoch
        # preemption saves this (not the in-flight, partially-updated state)
        # so the requeued run replays the interrupted epoch from clean state
        self._boundary_snapshot = None
        self._preempt_slot_epoch: Optional[int] = None

    # -------------------------------------------------------------- epochs

    def _augment(self, key, batch):
        if self.task.aug_mode == "none":
            img = eval_batch(batch["image"])
            return {**batch, "image": img}
        import os
        if (self.task.aug_mode == "classification"
                and os.environ.get("SSL4GIE_HOST_AUG") == "1"):
            # C++ host pipeline (multi-core hosts: overlaps device compute)
            from ssl4gie_tpu.data import native_loader
            if native_loader.available():
                if not hasattr(self, "_native_aug_pool"):
                    self._native_aug_pool = native_loader.NativeBatchLoader()
                seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
                img = native_loader.augment_classification(
                    self._native_aug_pool, np.asarray(batch["image"]), seed)
                return {**batch, "image": img}
        tgt = batch.get(self.task.target_key) \
            if self.task.target_key in ("mask", "depth") else None
        kaug, kmix = jax.random.split(key)
        if self.task.aug_fn is not None:
            img = self.task.aug_fn(kaug, batch["image"])
        else:
            img, tgt = augment_train_batch(kaug, batch["image"], tgt,
                                           mode=self.task.aug_mode)
        out = dict(batch, image=img)
        if tgt is not None:
            out[self.task.target_key] = tgt
        if self.task.mixup_fn is not None:
            img, mixed_tgt = self.task.mixup_fn(kmix, out["image"],
                                                out[self.task.target_key])
            out["image"] = img
            out[self.task.target_key] = mixed_tgt
        return out

    def train_epoch(self, epoch: int, profile_dir: Optional[str] = None):
        meter = Throughput()
        last_loss = None
        from ssl4gie_tpu.data.loader import prefetch_to_device
        it = prefetch_to_device(self.train_loader.epoch(epoch), self.mesh)
        # one split per epoch instead of per-step fold_in: keeps the hot loop free
        # of host->device round-trips
        n_steps = max(len(self.train_loader), 1)
        epoch_keys = jax.random.split(
            jax.random.fold_in(self.root_key, epoch), 2 * n_steps)
        for step, batch in enumerate(it):
            if self._guard is not None and self._guard.should_stop:
                # mid-epoch preemption: state as of the last COMPLETE epoch is
                # what resumes (per-epoch RNG makes the replay deterministic)
                self._check_preempted(epoch - 1)
            if profile_dir and step == 5:
                jax.profiler.start_trace(profile_dir)
            kaug, kstep = epoch_keys[2 * step], epoch_keys[2 * step + 1]
            batch = self._augment(kaug, batch)
            self.state, metrics = self.train_step(self.state, batch, kstep)
            meter.update(batch["image"].shape[0])
            if profile_dir and step == 10:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                profile_dir = None
            if (step + 1) % self.log_every == 0 or step + 1 == len(self.train_loader):
                last_loss = float(metrics["loss"])
                if not np.isfinite(last_loss):
                    # NaN abort, like the vendored MAE engine
                    # (`engine_pretrain.py:52-54`)
                    raise FloatingPointError(
                        f"Loss is {last_loss} at epoch {epoch} step {step+1}, "
                        "stopping training")
                payload = {"epoch": epoch, "step": step + 1,
                           "loss": last_loss,
                           "lr": get_lr(self.state.opt_state),
                           **meter.rates(n_steps - (step + 1))}
                if step + 1 == len(self.train_loader):
                    from ssl4gie_tpu.core.logger import peak_memory_mb
                    mem = peak_memory_mb()   # once per epoch (host round-trip)
                    if mem is not None:
                        payload["max_mem_mb"] = mem
                self.logger.log(payload)
        return last_loss

    def evaluate(self, loader, epoch: int, split: str) -> float:
        """Evaluate a split. Every batch is padded to one static shape (single
        compile; the ragged tail no longer retraces) and each batch contributes
        with EQUAL weight, like the reference test() loops which accumulate a
        per-batch metric and divide by the batch count
        (`train_segmentation.py:90-95`)."""
        static_b = getattr(loader, "batch_size", None)
        it = loader.epoch(0) if hasattr(loader, "epoch") else loader
        if self.task.eval_kind == "accumulate_preds":
            preds, targets = [], []
            for batch in it:
                padded, n = _pad_eval_batch(batch, static_b or
                                            np.asarray(batch["image"]).shape[0])
                img = eval_batch(jnp.asarray(padded["image"]))
                valid = jnp.arange(img.shape[0]) < n
                p = self.eval_step(self.state, {**padded, "image": img}, valid)
                preds.append(np.asarray(p)[:n])
                targets.append(np.asarray(batch[self.task.target_key]))
            perf = float(self.eval_finalize(np.concatenate(preds),
                                            np.concatenate(targets)))
        else:
            total, batches = 0.0, 0
            for batch in it:
                padded, n = _pad_eval_batch(batch, static_b or
                                            np.asarray(batch["image"]).shape[0])
                img = eval_batch(jnp.asarray(padded["image"]))
                valid = jnp.arange(img.shape[0]) < n
                num, den = self.eval_step(self.state,
                                          {**padded, "image": img}, valid)
                den = float(den)
                total += float(num) / den if den != 0 else 0.0
                batches += 1
            perf = total / max(batches, 1)
        self.logger.log({"epoch": epoch, f"{split}_perf": perf})
        return perf

    # -------------------------------------------------------------- ckpt

    def _ckpt_tree(self, epoch, val_perf, test_perf):
        return {"params": ckpt_lib.host_tree(self.state.params),
                "opt_state": ckpt_lib.host_tree(self.state.opt_state),
                "batch_stats": ckpt_lib.host_tree(self.state.batch_stats),
                "meta": {"epoch": epoch, "val_perf": val_perf,
                         "test_perf": test_perf,
                         "plateau_best": -1.0 if self.plateau is None or
                         self.plateau.best is None else float(self.plateau.best),
                         "plateau_bad": 0 if self.plateau is None else
                         self.plateau.num_bad_epochs,
                         "lr": get_lr(self.state.opt_state)}}

    def maybe_resume(self):
        # prefer the preemption slot when it is NEWER than the best-val slot
        # (it records a later epoch of the same run); the best-val slot keeps
        # serving eval/predict either way
        src = None
        if self.ckpt.exists():
            src = self.ckpt
        if self.preempt_ckpt.exists():
            pre = self.preempt_ckpt.restore(self._ckpt_tree(0, 0.0, 0.0))
            self._preempt_slot_epoch = int(pre["meta"]["epoch"])
            if src is None:
                src = self.preempt_ckpt
            else:
                best = self.ckpt.restore(self._ckpt_tree(0, 0.0, 0.0))
                src = (self.preempt_ckpt
                       if self._preempt_slot_epoch > int(best["meta"]["epoch"])
                       else self.ckpt)
        if src is None:
            return
        restored = src.restore(self._ckpt_tree(0, 0.0, 0.0))
        self.state = self.state.replace(
            params=restored["params"], opt_state=restored["opt_state"],
            batch_stats=restored["batch_stats"])
        # re-place the restored host arrays with the same layout the build
        # chose (replicated for DP; TP/FSDP shardings otherwise)
        self.state = self.place_fn(self.state)
        meta = restored["meta"]
        self.start_epoch = int(meta["epoch"]) + 1
        self.best_val = float(meta["val_perf"])
        if self.plateau is not None:
            pb = float(meta["plateau_best"])
            self.plateau.best = None if pb < 0 else pb
            self.plateau.num_bad_epochs = int(meta["plateau_bad"])
        self.logger.log({"resumed_from_epoch": self.start_epoch - 1,
                         "best_val": self.best_val})

    # -------------------------------------------------------------- driver

    def fit(self, profile_dir: Optional[str] = None):
        self.maybe_resume()
        try:
            with PreemptionGuard() as self._guard:
                return self._fit(profile_dir)
        except KeyboardInterrupt:
            # clean exit like the reference (`train_classification.py:329-331`);
            # the best-val checkpoint on disk stays valid for resume
            self.logger.log({"interrupted_at_epoch": -1},
                            echo="KeyboardInterrupt — exiting cleanly")
            return self.best_val
        finally:
            self._guard = None

    def _check_preempted(self, epoch: int):
        """Poll the signal latch; save the requeue state and stop if set.

        Epoch granularity: the saved meta marks `epoch` epochs COMPLETE and the
        relaunch restarts at epoch+1. A mid-epoch signal saves the snapshot
        taken at the last epoch BOUNDARY (not the in-flight params), so the
        interrupted epoch replays from clean state and no batch is applied
        twice — the same policy as submitit requeueing from the last periodic
        checkpoint (`submitit_pretrain.py:60-70`)."""
        if self._guard is None or not self._guard.should_stop:
            return
        # host_tree is a collective under sharded state (multi-host
        # allgather) — every process builds the tree; only primary writes
        tree = self._boundary_snapshot
        if tree is None:
            tree = self._ckpt_tree(
                epoch, self.best_val if self.best_val is not None else 0.0,
                0.0)
        if ckpt_lib.is_primary():
            self.preempt_ckpt.save(tree)
        self._preempt_slot_epoch = int(tree["meta"]["epoch"])
        self.logger.log({"preempted_after_epoch": epoch},
                        echo=f"preemption signal — state saved after epoch "
                             f"{epoch}, exiting for requeue")
        raise Preempted()

    def _fit(self, profile_dir: Optional[str] = None):
        for epoch in range(self.start_epoch, self.epochs + 1):
            # boundary snapshot: the state with `epoch-1` epochs complete —
            # what a mid-epoch preemption saves for the requeue
            self._boundary_snapshot = self._ckpt_tree(
                epoch - 1, self.best_val if self.best_val is not None else 0.0,
                0.0)
            self._check_preempted(epoch - 1)
            self.train_epoch(epoch, profile_dir if epoch == self.start_epoch
                             else None)
            val_perf = self.evaluate(self.val_loader, epoch, "val")
            test_perf = self.evaluate(self.test_loader, epoch, "test")
            if self.plateau is not None:
                lr = get_lr(self.state.opt_state)
                new_lr = self.plateau.step(val_perf, lr)
                if new_lr != lr:
                    self.state = self.state.replace(
                        opt_state=set_lr(self.state.opt_state, new_lr))
                    self.logger.log({"epoch": epoch, "lr_reduced_to": new_lr})
            better = (self.best_val is None or
                      (val_perf > self.best_val if self.task.select_mode == "max"
                       else val_perf < self.best_val))
            if better:
                self.best_val = val_perf
                tree = self._ckpt_tree(epoch, val_perf, test_perf)  # collective
                if ckpt_lib.is_primary():
                    self.ckpt.save(tree)
                self.logger.log({"epoch": epoch, "new_best_val": val_perf,
                                 "test_at_best": test_perf})
            # drop a stale .preempt slot once this run has trained past it, so
            # a later rerun can never prefer it over the best-val slot
            if (self._preempt_slot_epoch is not None
                    and epoch > self._preempt_slot_epoch):
                if ckpt_lib.is_primary():
                    self.preempt_ckpt.delete()
                self._preempt_slot_epoch = None
        return self.best_val
