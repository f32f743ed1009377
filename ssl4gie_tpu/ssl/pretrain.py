"""SSL pretraining driver (MAE / MoCo v3) — the TPU-native counterpart of the
vendored `main_pretrain.py` / `main_moco.py` CLIs.

Recipe parity:
- MAE: AdamW betas (0.9, 0.95), weight-decay grouping (no WD on 1-D params), base LR
  x batch/256 scaling, per-iteration warmup+cosine schedule, norm_pix loss, ckpt
  every `save_every` epochs (`main_pretrain.py:165-200`, `engine_pretrain.py:42-60`).
- MoCo v3: AdamW or LARS, cosine LR, cosine EMA momentum per iteration
  (`main_moco.py:224-230,420-434`).

The encoder lands in an Orbax checkpoint whose 'backbone' subtree matches the
finetune models' backbone params 1:1 — the converter-free path for our own
pretraining (external torch ckpts go through ssl4gie_tpu/convert).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ssl4gie_tpu.core import checkpoint as ckpt_lib
from ssl4gie_tpu.core.config import PretrainConfig, SSLFramework
from ssl4gie_tpu.core.logger import (MetricsLogger, Throughput,
                                     peak_memory_mb)
from ssl4gie_tpu.core.mesh import make_mesh
from ssl4gie_tpu.core.schedule import cosine_momentum
from ssl4gie_tpu.core.xla_options import jit_kwargs
from ssl4gie_tpu.data.loader import Loader, Source
from ssl4gie_tpu.data.ssl_augment import mae_augment, moco_two_crops
from ssl4gie_tpu.ssl.lars import lars
from ssl4gie_tpu.ssl.mae import MAE, MAE_SIZES
from ssl4gie_tpu.ssl.moco_v3 import (MoCoEncoder, MoCoPredictor, MoCoState,
                                     make_moco_train_step)


class UnlabeledSource(Source):
    """Hyperkvasir-unlabelled: a flat folder tree of jpgs; decoded to a fixed canvas
    so the on-device crop has headroom."""

    def __init__(self, paths, canvas: int = 256):
        self.paths, self.canvas = list(paths), canvas

    def __len__(self):
        return len(self.paths)

    def get(self, i):
        from ssl4gie_tpu.data.loader import _open_rgb
        return {"image": _open_rgb(self.paths[i], self.canvas)}


class SyntheticUnlabeled(Source):
    def __init__(self, n: int, canvas: int = 256, seed: int = 0):
        self.n, self.canvas, self.seed = n, canvas, seed

    def __len__(self):
        return self.n

    def get(self, i):
        rng = np.random.default_rng(self.seed * 9973 + i)
        return {"image": rng.integers(0, 256, (self.canvas, self.canvas, 3),
                                      dtype=np.uint8)}


def wd_mask(params):
    """MAE-style weight-decay grouping: decay only params with ndim > 1
    (timm optim_factory.add_weight_decay semantics used at main_pretrain.py:179)."""
    return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)


def make_schedule(base_lr, warmup_steps, total_steps):
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=base_lr, warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1), end_value=0.0)


def discover_unlabeled(root: str):
    import glob
    paths = []
    for ext in ("*.jpg", "*.jpeg", "*.png"):
        paths += glob.glob(os.path.join(root, "**", ext), recursive=True)
    return sorted(paths)


def _retained_save(cfg: PretrainConfig, full_state, epoch: int) -> None:
    """Retained numbered checkpoint slots, the reference's history protocol.

    MoCo keeps EVERY epoch as `checkpoint_%04d` (0-based,
    `Models/moco_v3/main_moco.py:310-316`); MAE keeps `checkpoint-%d` when
    `epoch0 % 20 == 0 or epoch0 + 1 == epochs`
    (`Models/mae/main_pretrain.py:197-204`, `util/misc.py:295-309`) — so any
    epoch's encoder can seed a downstream finetune (the paper's
    100/300/1000-epoch ablations). `cfg.keep_last > 0` adds a beyond-reference
    retention cap (newest N numbered slots). Caller is already primary-gated.
    """
    is_mae = cfg.framework == SSLFramework.MAE
    every = cfg.save_every or (20 if is_mae else 1)
    epoch0 = epoch - 1                     # the reference epoch loop is 0-based
    if epoch0 % every != 0 and epoch != cfg.epochs:
        return
    name = ("checkpoint-%d" % epoch0) if is_mae else ("checkpoint_%04d" % epoch0)
    slot = ckpt_lib.CheckpointManager(cfg.ckpt_dir, name)
    slot.save({"state": full_state, "meta": {"epoch": epoch}})
    if cfg.keep_last > 0:
        import re
        pat = re.compile(r"^checkpoint-(\d+)$" if is_mae
                         else r"^checkpoint_(\d{4})$")
        slots = sorted((int(m.group(1)), d) for d in os.listdir(cfg.ckpt_dir)
                       if (m := pat.match(d)))
        for _, stale in slots[:-cfg.keep_last]:
            ckpt_lib.CheckpointManager(cfg.ckpt_dir, stale).delete()


def run_pretraining(cfg: PretrainConfig, steps_per_epoch_override: Optional[int] = None):
    tp = getattr(cfg.runtime, "tensor_parallel", 1)
    # Resolve the MAE size preset early: TP needs the head counts for its
    # divisibility checks (architecture -> models_mae.py:223-250 preset;
    # cfg.model_kwargs overrides win — tiny test models).
    mae_size = dict(MAE_SIZES.get(cfg.architecture.value, {}))
    mae_size.update(cfg.model_kwargs)
    attn_fn = None
    if tp > 1:
        # beyond-reference: Megatron-style ViT sharding for the big MAE
        # presets (vit_l/vit_h); the TP_RULES suffixes match the MAE decoder
        # blocks too (decoder_blocks_i/attn|mlp/...).
        from ssl4gie_tpu.parallel.tp import make_tp_mesh
        if cfg.framework == SSLFramework.MAE:
            heads = (mae_size.get("num_heads", 12),
                     mae_size.get("decoder_num_heads", 16))
        else:
            from ssl4gie_tpu.ssl.moco_v3 import VIT_PRESETS
            if cfg.architecture.value not in VIT_PRESETS:
                # RN50 conv/BN params match no TP rule: the model axis would
                # silently duplicate all compute (same guard as build_trainer)
                raise ValueError("--tensor-parallel requires a ViT "
                                 "architecture; use --fsdp or pure data "
                                 "parallelism for resnet50")
            heads = (VIT_PRESETS[cfg.architecture.value]["num_heads"],)
        mesh = make_tp_mesh(tp, *heads)
        # Pallas attention kernels have no SPMD partitioning rule over the
        # model axis; plain XLA attention partitions head-wise for free.
        from ssl4gie_tpu.models.layers import plain_attention
        attn_fn = plain_attention
    else:
        mesh = make_mesh()

    from ssl4gie_tpu.models.layers import set_pallas_mesh
    set_pallas_mesh(mesh)   # Pallas kernels shard over THIS mesh's data axis
    from ssl4gie_tpu.parallel.tp import make_place_fn
    _place = make_place_fn(mesh, tp=tp > 1,
                           fsdp=getattr(cfg.runtime, "fsdp", False))
    logger = MetricsLogger(cfg.ckpt_dir, f"pretrain_{cfg.framework.value}_"
                                         f"{cfg.architecture.value}",
                           tb=cfg.runtime.tensorboard)
    dtype = jnp.bfloat16 if cfg.runtime.compute_dtype == "bfloat16" else jnp.float32

    if cfg.data.synthetic:
        src = SyntheticUnlabeled(cfg.data.synthetic_size)
    else:
        src = UnlabeledSource(discover_unlabeled(cfg.data.data_root))
    loader = Loader(src, cfg.batch_size, shuffle=True, drop_last=True,
                    seed=cfg.runtime.seed, num_threads=cfg.data.num_workers)
    steps_per_epoch = steps_per_epoch_override or len(loader)
    total_steps = steps_per_epoch * cfg.epochs
    warmup_steps = steps_per_epoch * cfg.warmup_epochs
    eff_lr = cfg.base_lr * cfg.batch_size / 256.0
    schedule = make_schedule(eff_lr, warmup_steps, total_steps)
    root_key = jax.random.PRNGKey(cfg.runtime.seed)

    ckpt = ckpt_lib.CheckpointManager(cfg.ckpt_dir,
                                      f"{cfg.framework.value}_{cfg.architecture.value}")
    # full-state sibling slot for requeue/resume: the export slot above keeps
    # only the finetune-consumable encoder params, the resume slot carries the
    # complete protocol — MAE {params, opt_state, step, epoch}
    # (`Models/mae/util/misc.py:295-329`), MoCo {params (encoder+predictor),
    # momentum params/stats, opt_state, step, epoch} (`main_moco.py:310-316`)
    resume_ckpt = ckpt_lib.CheckpointManager(
        cfg.ckpt_dir, f"{cfg.framework.value}_{cfg.architecture.value}.resume")

    if cfg.framework == SSLFramework.MAE:
        model = MAE(img_size=cfg.img_size, norm_pix_loss=cfg.norm_pix_loss,
                    mask_ratio=cfg.mask_ratio, dtype=dtype, attn_fn=attn_fn,
                    **mae_size)
        sample = jnp.zeros((2, cfg.img_size, cfg.img_size, 3), jnp.float32)
        variables = jax.jit(functools.partial(model.init, train=True))(
            {"params": root_key, "mask": root_key}, sample)
        params = variables["params"]
        tx = optax.adamw(schedule, b1=0.9, b2=0.95, weight_decay=cfg.weight_decay,
                         mask=wd_mask(params))
        opt_state = tx.init(params)
        state = {"params": params, "opt_state": opt_state,
                 "step": jnp.zeros((), jnp.int32)}
        state = _place(state)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state, img_u8, key):
            kaug, kmask = jax.random.split(key)
            imgs = mae_augment(kaug, img_u8, out_size=cfg.img_size)

            def loss_fn(p):
                loss, _, _ = model.apply({"params": p}, imgs, train=True,
                                         rngs={"mask": kmask})
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(state["params"])
            updates, new_opt = tx.update(grads, state["opt_state"], state["params"])
            new_params = optax.apply_updates(state["params"], updates)
            # grad_norm each step, like the reference's
            # NativeScalerWithGradNormCount (`Models/mae/util/misc.py:251-292`)
            return ({"params": new_params, "opt_state": new_opt,
                     "step": state["step"] + 1},
                    {"loss": loss, "grad_norm": optax.global_norm(grads)})

        def save(state, epoch):
            # host_tree first on EVERY process (collective under sharded
            # state), write on primary only
            full = ckpt_lib.host_tree(state)
            if not ckpt_lib.is_primary():
                return
            ckpt.save({"params": full["params"], "meta": {"epoch": epoch}})
            resume_ckpt.save({"state": full, "meta": {"epoch": epoch}})
            _retained_save(cfg, full, epoch)

        start_epoch = 1
        if resume_ckpt.exists():
            restored = resume_ckpt.restore(
                {"state": ckpt_lib.host_tree(state), "meta": {"epoch": 0}})
            state = _place(restored["state"])
            start_epoch = int(restored["meta"]["epoch"]) + 1
            logger.log({"resumed_from_epoch": start_epoch - 1},
                       echo=f"resuming MAE pretraining at epoch {start_epoch}")

        run_loop(cfg, mesh, loader, train_step, save, logger, root_key,
                 state=state, two_view=False, steps_per_epoch=steps_per_epoch,
                 start_epoch=start_epoch)
        return ckpt.path

    # ---- MoCo v3
    encoder = MoCoEncoder(arch=cfg.architecture.value, dim=cfg.moco_dim,
                          mlp_dim=cfg.moco_mlp_dim, dtype=dtype,
                          attn_fn=attn_fn)
    # backbone sizes come from VIT_PRESETS (vit_b/s/conv_s/conv_b) or RN50 like
    # the reference `-a` choices; cfg.model_kwargs applies to MAE only
    predictor = MoCoPredictor(dim=cfg.moco_dim, mlp_dim=cfg.moco_mlp_dim,
                              dtype=dtype)
    sample = jnp.zeros((2, cfg.img_size, cfg.img_size, 3), jnp.float32)
    enc_vars = jax.jit(functools.partial(encoder.init, train=False))(root_key, sample)
    pred_vars = jax.jit(functools.partial(predictor.init, train=False))(
        root_key, jnp.zeros((2, cfg.moco_dim), jnp.float32))
    params = {"encoder": enc_vars["params"], "predictor": pred_vars["params"]}
    stats = {"encoder": enc_vars.get("batch_stats", {}),
             "predictor": pred_vars.get("batch_stats", {})}
    if cfg.optimizer == "lars":
        tx = lars(schedule, weight_decay=cfg.weight_decay)
    else:
        tx = optax.adamw(schedule, b1=0.9, b2=0.95, weight_decay=cfg.weight_decay,
                         mask=wd_mask(params))
    if cfg.architecture.value in ("vit_b", "vit_s") and cfg.moco_stop_grad_patch_embed:
        # MoCo v3 --stop-grad-conv1: frozen random patch projection. Applies
        # only to the plain-PatchEmbed ViTs — the reference guards on
        # `isinstance(self.patch_embed, PatchEmbed)` (`vits.py:43-51`), so the
        # ConvStem variants train their stem normally.
        def is_patch_embed(path_tuple):
            return "patch_embed" in path_tuple
        frozen = jax.tree_util.tree_map_with_path(
            lambda path, _: is_patch_embed(tuple(
                p.key if hasattr(p, "key") else str(p) for p in path)), params)
        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), frozen))
    # momentum copies must be distinct buffers (donation would otherwise see the
    # same buffer twice)
    state = MoCoState(step=jnp.zeros((), jnp.int32), params=params,
                      momentum_params=jax.tree_util.tree_map(
                          jnp.copy, params["encoder"]),
                      batch_stats=stats,
                      momentum_batch_stats=jax.tree_util.tree_map(
                          jnp.copy, stats["encoder"]),
                      opt_state=tx.init(params), tx=tx)
    state = _place(state)
    moco_step = make_moco_train_step(encoder, predictor, cfg.moco_temperature)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, img_u8, key):
        kaug, _ = jax.random.split(key)
        v1, v2 = moco_two_crops(kaug, img_u8, out_size=cfg.img_size)
        m = cosine_momentum(state.step, base_m=cfg.moco_momentum,
                            total_steps=total_steps)
        return moco_step(state, v1, v2, m)

    def moco_tree(st: MoCoState):
        # everything but the static tx: the full main_moco.py:310-316 protocol
        return {"params": st.params, "momentum_params": st.momentum_params,
                "batch_stats": st.batch_stats,
                "momentum_batch_stats": st.momentum_batch_stats,
                "opt_state": st.opt_state, "step": st.step}

    def save(state, epoch):
        # host_tree first on EVERY process (collective under sharded state),
        # write on primary only
        full = ckpt_lib.host_tree(moco_tree(state))
        if not ckpt_lib.is_primary():
            return
        ckpt.save({"params": full["params"]["encoder"],
                   "meta": {"epoch": epoch}})
        resume_ckpt.save({"state": full, "meta": {"epoch": epoch}})
        _retained_save(cfg, full, epoch)

    start_epoch = 1
    if resume_ckpt.exists():
        restored = resume_ckpt.restore(
            {"state": ckpt_lib.host_tree(moco_tree(state)), "meta": {"epoch": 0}})
        state = state.replace(**_place(restored["state"]))
        start_epoch = int(restored["meta"]["epoch"]) + 1
        logger.log({"resumed_from_epoch": start_epoch - 1},
                   echo=f"resuming MoCo pretraining at epoch {start_epoch}")

    run_loop(cfg, mesh, loader, train_step, save, logger, root_key,
             state=state, two_view=True, steps_per_epoch=steps_per_epoch,
             start_epoch=start_epoch)
    return ckpt.path


def _superbatches(it, mesh, k, total_steps):
    """Group the host loader stream into chunks of up to k batches, each batch
    device_put (async, double-buffered) with the usual data sharding.

    Yields LISTS of per-batch device arrays — the chunk is stacked along the
    scan dim inside the jitted chunk runner, because a host-side np.stack of
    the superbatch costs a ~350 ms/step page-faulting memcpy on a 1-core host
    (measured; device-side stacking is ~0.5 ms of HBM traffic). Batch
    composition AND order are exactly the per-step path's.
    """
    import collections
    import itertools

    from ssl4gie_tpu.core.mesh import data_sharding

    def put(b):
        return {key: jax.device_put(v, data_sharding(mesh, v.ndim))
                for key, v in b.items()}

    it = itertools.islice(it, total_steps)
    queue = collections.deque()
    chunk = []
    for b in it:
        chunk.append(put(b))
        if len(chunk) == k:
            queue.append(chunk)
            chunk = []
            if len(queue) > 1:
                yield queue.popleft()
    if chunk:
        queue.append(chunk)
    while queue:
        yield queue.popleft()


def run_loop(cfg, mesh, loader, train_step, save, logger, root_key, *, state,
             two_view, steps_per_epoch, start_epoch: int = 1):
    """Epoch loop with `scan_steps` train steps scanned inside ONE jit dispatch
    (same technique as bench.py): python and dispatch latency leave the hot
    loop entirely — on this relay that is ~40 ms/step, on a real TPU VM it
    keeps the device queue full. Per-step RNG keys, batch order, and loss
    values are bit-identical to the per-step formulation.
    """
    from ssl4gie_tpu.core.preempt import Preempted, PreemptionGuard
    meter = Throughput()
    log_every = cfg.runtime.log_every
    K = max(1, min(int(getattr(cfg.runtime, "scan_steps", 8) or 1),
                   steps_per_epoch))

    # no TPU compiler-options override here: the 48 MiB scoped-vmem cap that
    # speeds the finetune programs +3% SLOWS the MAE pretrain program ~3%
    # (201.5 vs 195.3 ms/step measured, benchmarks/bench_mae_pretrain.py);
    # MoCo was within noise. Force via SSL4GIE_XLA_OPTIONS if desired.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_chunk(state, imgs, keys):
        # imgs: LIST of (B, ...) batches — stacked here (cheap HBM traffic)
        # rather than on the slow host. Not donated: uint8 inputs never match
        # an output buffer, so donation would only emit unusable-buffer noise.
        stacked = jnp.stack(imgs)
        def body(st, xs):
            img, k = xs
            st, m = train_step(st, img, k)
            return st, (m["loss"], m.get("grad_norm", jnp.zeros(())))
        return jax.lax.scan(body, state, (stacked, keys))

    with PreemptionGuard() as guard:
        for epoch in range(start_epoch, cfg.epochs + 1):
            meter.reset()   # per-epoch rates (epoch 1 absorbs the compile)
            # one split per epoch, fetched to host once: per-chunk key slices
            # are then plain numpy (no eager device ops in the hot loop)
            epoch_keys = np.asarray(
                jax.random.split(jax.random.fold_in(root_key, epoch),
                                 max(steps_per_epoch, 1)))
            step = 0
            for chunk in _superbatches(loader.epoch(epoch), mesh, K,
                                       steps_per_epoch):
                klen = len(chunk)
                if guard.should_stop:
                    # mid-epoch preemption: exit WITHOUT saving — the previous
                    # epoch's .resume slot is the requeue state and this epoch
                    # replays deterministically (per-epoch fold_in keys +
                    # (seed, epoch)-seeded loader shuffle)
                    logger.log({"preempted_in_epoch": epoch},
                               echo=f"preemption signal mid-epoch {epoch} — "
                                    f"exiting for requeue, epoch {epoch} will "
                                    f"replay from the last .resume state")
                    raise Preempted()
                imgs = [b["image"] for b in chunk]
                bsz = imgs[0].shape[0]    # read before donation invalidates
                state, (losses, gnorms) = run_chunk(state, imgs,
                                                    epoch_keys[step:step + klen])
                meter.update(klen * bsz, steps=klen)
                if (step + klen) // log_every > step // log_every:
                    losses_np = np.asarray(losses)   # one sync per logged chunk
                    gnorms_np = np.asarray(gnorms)
                    for j in range(klen):
                        if (step + j + 1) % log_every == 0:
                            logger.log({"epoch": epoch, "step": step + j + 1,
                                        "loss": float(losses_np[j]),
                                        "grad_norm": float(gnorms_np[j]),
                                        **meter.rates(
                                            steps_per_epoch - (step + j + 1))})
                step += klen
            save(state, epoch)
            mem = peak_memory_mb()   # once per epoch (host round-trip)
            if mem is not None:
                logger.log({"epoch": epoch, "max_mem_mb": mem})
            if guard.should_stop:
                # the save above wrote both the encoder export AND the full
                # .resume state — run_pretraining relaunches at epoch+1
                # (submitit_pretrain.py:60-70 equivalent)
                logger.log({"preempted_after_epoch": epoch},
                           echo=f"preemption signal — checkpointed epoch "
                                f"{epoch}, exiting for requeue")
                raise Preempted()
    return state
