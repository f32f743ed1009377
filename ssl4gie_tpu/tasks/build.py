"""Assemble a Trainer from a TrainConfig: data discovery + split, model, optimizer,
loss/metric wiring — the engine-level equivalent of each reference build()
(`train_classification.py:128-248`, `train_segmentation.py:125-223`,
`train_depth.py:131-251`)."""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssl4gie_tpu.core import checkpoint as ckpt_lib
from ssl4gie_tpu.core.config import Architecture, Task, TrainConfig
from ssl4gie_tpu.core.logger import MetricsLogger
from ssl4gie_tpu.core.mesh import make_mesh
from ssl4gie_tpu.core.schedule import ReduceLROnPlateau
from ssl4gie_tpu.core.train_state import TrainState, make_adamw, make_frozen_tx
from ssl4gie_tpu.core.trainer import TaskDefinition, Trainer
from ssl4gie_tpu.data import discovery
from ssl4gie_tpu.data.loader import (ClassificationSource, DepthSource, Loader,
                                     SegmentationSource, SyntheticSource)
from ssl4gie_tpu.data.splits import split_ids
from ssl4gie_tpu.metrics import classification as cls_metrics
from ssl4gie_tpu.metrics import depth as depth_metrics
from ssl4gie_tpu.metrics import segmentation as seg_metrics
from ssl4gie_tpu.models.factory import build_model


def _subset(lst, idx):
    return [lst[i] for i in idx]


def _make_sources(cfg: TrainConfig):
    """Returns (train_source, val_source, test_source, extras dict)."""
    d = cfg.data
    if d.synthetic:
        task_name = cfg.task.value
        n = d.synthetic_size
        mk = lambda seed: SyntheticSource(n, d.img_size, task_name, seed=seed)
        extras = {"n_class": 6, "class_weights": [1.0] * 6} \
            if cfg.task == Task.CLASSIFICATION else {}
        return mk(0), mk(1), mk(2), extras

    if cfg.task == Task.CLASSIFICATION:
        data = discovery.discover_classification(d.data_root, d.dataset)
        tr, te, va = split_ids(len(data.input_paths))
        mk = lambda idx: ClassificationSource(_subset(data.input_paths, idx),
                                              _subset(data.targets, idx), d.img_size)
        return mk(tr), mk(va), mk(te), {"n_class": data.n_class,
                                        "class_weights": data.class_weights}

    if cfg.task == Task.SEGMENTATION:
        imgs, masks = discovery.discover_segmentation(d.data_root, d.dataset)
        tr, te, va = split_ids(len(imgs))
        mk = lambda idx: SegmentationSource(_subset(imgs, idx),
                                            _subset(masks, idx), d.img_size)
        return mk(tr), mk(va), mk(te), {}

    if cfg.task == Task.DEPTH:
        splits = discovery.discover_depth(d.data_root)
        mk = lambda s: DepthSource(*splits[s], d.img_size)
        return mk("train"), mk("val"), mk("test"), {}

    raise NotImplementedError(f"build for task {cfg.task} not wired yet")


def make_task_definition(cfg: TrainConfig, extras: dict) -> Tuple[TaskDefinition,
                                                                  Optional[callable]]:
    if cfg.task == Task.CLASSIFICATION:
        n_class = extras["n_class"]
        weights = jnp.asarray(extras["class_weights"], jnp.float32)
        finalize = lambda preds, targets: cls_metrics.mean_f1(
            jnp.asarray(preds), jnp.asarray(targets), n_class)
        o = cfg.optim
        aug_fn = None
        if cfg.probe:
            # probe train transform is RRC(224)+hflip+normalize ONLY
            # (`main_lincls.py:273-274`, `main_linprobe.py:133-134`) — never
            # the GI-task jitter/blur/rotation stack
            from ssl4gie_tpu.data.randaug import probe_train_batch
            aug_fn = functools.partial(probe_train_batch,
                                       out_size=cfg.data.img_size)
        elif o.auto_augment or o.reprob > 0:
            # timm create_transform stack (--aa/--reprob finetune recipe)
            from ssl4gie_tpu.data.randaug import timm_train_batch
            aug_fn = functools.partial(timm_train_batch,
                                       out_size=cfg.data.img_size,
                                       policy=o.auto_augment or "",
                                       reprob=o.reprob)
        if o.mixup > 0 or o.cutmix > 0 or o.label_smoothing > 0:
            # MAE supervised-finetune recipe (`main_finetune.py:219-226`,
            # `:251-254`): smoothed/soft targets + mixup/cutmix after the
            # standard augmentation; soft-target CE replaces weighted CE.
            # Train-time labels become (B, n_class) soft targets; eval keeps
            # int labels + argmax meanF1.
            from ssl4gie_tpu.data.augment import mixup_cutmix
            import jax as _jax

            @_jax.jit
            def mixer(key, img, labels):
                soft = cls_metrics.smooth_one_hot(labels, n_class,
                                                  o.label_smoothing)
                if o.mixup > 0 or o.cutmix > 0:
                    return mixup_cutmix(key, img, soft, mixup_alpha=o.mixup,
                                        cutmix_alpha=o.cutmix)
                return img, soft

            td = TaskDefinition(
                name="classification", aug_mode="classification",
                target_key="label",
                loss_fn=cls_metrics.soft_target_cross_entropy,
                eval_metric_fn=None, eval_kind="accumulate_preds",
                select_mode="max", mixup_fn=mixer, aug_fn=aug_fn,
                has_dropout=o.drop_path > 0)  # stochastic depth needs an rng
            return td, finalize
        loss_fn = functools.partial(cls_metrics.weighted_cross_entropy,
                                    class_weights=weights)
        td = TaskDefinition(
            name="classification", aug_mode="classification", target_key="label",
            loss_fn=lambda logits, labels: loss_fn(logits, labels),
            eval_metric_fn=None, eval_kind="accumulate_preds", select_mode="max",
            aug_fn=aug_fn, has_dropout=o.drop_path > 0)
        return td, finalize

    if cfg.task == Task.SEGMENTATION:
        td = TaskDefinition(
            name="segmentation", aug_mode="segmentation", target_key="mask",
            loss_fn=seg_metrics.soft_dice_loss,
            eval_metric_fn=seg_metrics.dice_pair, select_mode="max",
            has_dropout=True)  # DPT seg head Dropout(0.1) / DeepLabV3+ ASPP Dropout(0.5)
        return td, None

    if cfg.task == Task.DEPTH:
        td = TaskDefinition(
            name="depth", aug_mode="depth", target_key="depth",
            loss_fn=functools.partial(depth_metrics.ssi_loss, alpha=0.1),
            eval_metric_fn=depth_metrics.ssi_eval_pair,
            select_mode="min")
        return td, None

    raise NotImplementedError(cfg.task)


def build_trainer(cfg: TrainConfig):
    cfg.validate()
    tp = getattr(cfg.runtime, "tensor_parallel", 1)
    fsdp = getattr(cfg.runtime, "fsdp", False)
    if (tp > 1 or fsdp) and cfg.task == Task.DETECTION:
        # DetectionTrainer places its own state; its windowed Pallas kernel
        # consumes replicated activations, defeating TP, and FSDP isn't wired.
        raise ValueError("--tensor-parallel/--fsdp support the ViT dense/"
                         "pooled tasks (classification/segmentation/depth) "
                         "and SSL pretraining; use pure data parallelism for "
                         "detection")
    if tp > 1:
        if cfg.runtime.mesh_shape is not None:
            raise ValueError("give either tensor_parallel or an explicit "
                             "mesh_shape/mesh_axes, not both")
        if cfg.architecture == Architecture.RESNET50:
            # RN50 has no TP rules (conv/BN params replicated -> the model
            # axis would silently duplicate compute). FSDP is shape-based and
            # works for RN50.
            raise ValueError("--tensor-parallel requires a ViT architecture; "
                             "use --fsdp or pure data parallelism for resnet50")
        from ssl4gie_tpu.models.vit import ViTBackbone
        from ssl4gie_tpu.parallel.tp import make_tp_mesh
        # the finetune ViT is always the backbone default (ViT-B); derive the
        # head count from the module instead of hardcoding it here
        mesh = make_tp_mesh(tp, ViTBackbone.num_heads)
    else:
        mesh = make_mesh(cfg.runtime.mesh_shape, cfg.runtime.mesh_axes)
    tp_active = "model" in mesh.axis_names and mesh.shape["model"] > 1
    from ssl4gie_tpu.models.layers import set_pallas_mesh
    set_pallas_mesh(mesh)   # Pallas kernels shard over THIS mesh's data axis
    from ssl4gie_tpu.core.mesh import local_batch_size
    local_batch_size(cfg.data.batch_size, mesh)   # divisibility check (clear error)
    if cfg.task == Task.DETECTION:
        return _build_detection_trainer(cfg, mesh)
    train_src, val_src, test_src, extras = _make_sources(cfg)
    td, finalize = make_task_definition(cfg, extras)

    dtype = jnp.bfloat16 if cfg.runtime.compute_dtype == "bfloat16" else jnp.float32
    from ssl4gie_tpu.core.config import SSLFramework
    # Under TP, route attention through plain XLA einsums: the Pallas kernels
    # lower to Mosaic custom calls with no SPMD partitioning rule over the
    # model axis, while the einsum formulation partitions head-wise for free.
    attn_fn = None
    if tp_active:
        from ssl4gie_tpu.models.layers import plain_attention
        attn_fn = plain_attention
    model = build_model(cfg.task, cfg.architecture,
                        num_classes=extras.get("n_class", 1),
                        pretraining=cfg.pretraining, framework=cfg.ss_framework,
                        out_token=cfg.out_token, img_size=cfg.data.img_size,
                        dtype=dtype, attn_fn=attn_fn,
                        drop_path=cfg.optim.drop_path,
                        probe_bn=cfg.probe and cfg.ss_framework == SSLFramework.MAE)

    rng = jax.random.PRNGKey(cfg.runtime.seed)
    sample = jnp.zeros((2, cfg.data.img_size, cfg.data.img_size, 3), jnp.float32)
    init_rngs = {"params": rng}
    if td.has_dropout:
        init_rngs["dropout"] = jax.random.fold_in(rng, 1)
    variables = jax.jit(functools.partial(model.init, train=False))(init_rngs, sample)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    if cfg.checkpoint:
        from ssl4gie_tpu.convert import load_pretrained
        params, loaded_stats = load_pretrained(cfg, params, batch_stats)
        if loaded_stats:
            batch_stats = loaded_stats
    elif cfg.pretraining.value == "ImageNet_class":
        from ssl4gie_tpu.convert import load_imagenet_supervised
        params = load_imagenet_supervised(cfg, params)

    if cfg.probe:
        # linear-probe recipe: re-init head, freeze-all-but-head, SGD (MoCo) or
        # LARS (MAE) — `main_lincls.py:158-166,233-237`, `main_linprobe.py:219-252`
        from ssl4gie_tpu.ssl.probe import make_probe_tx, reinit_head
        params = reinit_head(params, jax.random.fold_in(rng, 7))
        tx = make_probe_tx(cfg.ss_framework, cfg.optim.learning_rate, params)
    else:
        tx = make_adamw(cfg.optim.learning_rate, cfg.optim.b1, cfg.optim.b2,
                        cfg.optim.eps, cfg.optim.adamw_weight_decay,
                        grad_clip=cfg.optim.grad_clip)
        if cfg.optim.layer_decay is not None:
            import optax
            from ssl4gie_tpu.ssl.lr_decay import scale_by_layer_decay
            tx = optax.chain(tx, scale_by_layer_decay(
                params, decay=cfg.optim.layer_decay))
        if cfg.frozen:
            # train only heads/decoders (reference freezes the encoder with
            # no_grad, `Models/models.py:138-140`)
            def trainable(path):
                joined = "/".join(path)
                return not (joined.startswith("backbone")
                            or joined.startswith("encoder"))
            tx = make_frozen_tx(tx, params, trainable)

    state = TrainState.create(model.apply, params, tx, batch_stats)
    from ssl4gie_tpu.parallel.tp import make_place_fn
    place_fn = make_place_fn(mesh, tp=tp_active, fsdp=fsdp)
    state = place_fn(state)                 # replicated / TP / FSDP / hybrid

    bs = cfg.data.batch_size
    train_loader = Loader(train_src, bs, shuffle=True, drop_last=True,
                          seed=cfg.runtime.seed, num_threads=cfg.data.num_workers)
    val_loader = Loader(val_src, bs, shuffle=False, drop_last=False,
                        seed=cfg.runtime.seed, num_threads=cfg.data.num_workers)
    test_loader = Loader(test_src, bs, shuffle=False, drop_last=False,
                         seed=cfg.runtime.seed, num_threads=cfg.data.num_workers)

    logger = MetricsLogger(cfg.log_dir, cfg.run_name(),
                           tb=cfg.runtime.tensorboard)
    ckpt = ckpt_lib.CheckpointManager(cfg.ckpt_dir, cfg.run_name())
    plateau = None
    if cfg.optim.use_plateau_scheduler:
        plateau = ReduceLROnPlateau(mode=td.select_mode,
                                    factor=cfg.optim.plateau_factor,
                                    patience=cfg.optim.plateau_patience,
                                    min_lr=cfg.optim.min_lr)

    return Trainer(task=td, state=state, mesh=mesh, place_fn=place_fn,
                   train_loader=train_loader,
                   val_loader=val_loader, test_loader=test_loader, logger=logger,
                   ckpt=ckpt, epochs=cfg.epochs, accum_steps=cfg.optim.accum_steps,
                   seed=cfg.runtime.seed, plateau=plateau, eval_finalize=finalize,
                   log_every=cfg.runtime.log_every)


def _build_detection_trainer(cfg: TrainConfig, mesh):
    """Detection build (`train_detection.py:169-300`): Kvasir boxes JSON, split,
    Faster R-CNN with SSL/imagenet backbone weights, AdamW, mAP-selected ckpt."""
    import jax as _jax
    from ssl4gie_tpu.models.factory import pos_embed_type_for
    from ssl4gie_tpu.models.faster_rcnn import build_detector
    from ssl4gie_tpu.tasks.detection import (DetectionSource, DetectionTrainer,
                                             SyntheticDetectionSource)

    d = cfg.data
    # ViT: reference fixed_size 1024 (`train_detection.py:250`). RN50: torchvision
    # GeneralizedRCNNTransform min/max resize onto a 1344 static canvas
    # (`train_detection.py:197-204`; tasks.detection.DetectionSource docstring).
    from ssl4gie_tpu.tasks.detection import TV_CANVAS
    vit = cfg.architecture == Architecture.VIT_B
    canvas = 1024 if vit else TV_CANVAS
    resize = "fixed" if vit else "torchvision"
    if d.synthetic:
        # ViT det needs the token grid divisible by the 16-unit window -> canvas
        # must be a multiple of 256
        canvas = 256 if vit else min(d.img_size, 256)
        mk = lambda seed: SyntheticDetectionSource(d.synthetic_size, canvas, seed)
        train_src, val_src, test_src = mk(0), mk(1), mk(2)
    else:
        paths, targets = discovery.discover_detection(d.data_root, d.dataset)
        tr, te, va = split_ids(len(paths))
        mk = lambda idx: DetectionSource([paths[i] for i in idx], targets, canvas,
                                         resize=resize)
        train_src, val_src, test_src = mk(tr), mk(va), mk(te)

    dtype = jnp.bfloat16 if cfg.runtime.compute_dtype == "bfloat16" else jnp.float32
    small = dict(rpn_pre_nms_top_n_train=200, rpn_pre_nms_top_n_test=100,
                 rpn_post_nms_top_n_train=100, rpn_post_nms_top_n_test=50,
                 box_batch_size_per_image=64,
                 detections_per_img=10) if d.synthetic else {}
    from ssl4gie_tpu.models.faster_rcnn import FasterRCNN
    arch = "vit_b" if cfg.architecture == Architecture.VIT_B else "resnet50"
    model = FasterRCNN(arch=arch, num_classes=2, image_size=canvas,
                       pos_embed_type=pos_embed_type_for(cfg.pretraining,
                                                         cfg.ss_framework),
                       dtype=dtype, **small)

    rng = _jax.random.PRNGKey(cfg.runtime.seed)
    sample = jnp.zeros((1, canvas, canvas, 3), jnp.float32)
    gtb = jnp.zeros((1, 16, 4), jnp.float32)
    gtl = jnp.zeros((1, 16), jnp.int32)
    gtv = jnp.zeros((1, 16), bool)
    variables = model.init({"params": rng, "sampler": rng}, sample, gtb, gtl, gtv,
                           train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    if cfg.checkpoint:
        from ssl4gie_tpu.convert import load_pretrained
        params, loaded = load_pretrained(cfg, params, batch_stats)
        if loaded:
            batch_stats = loaded
    elif cfg.pretraining.value == "ImageNet_class":
        from ssl4gie_tpu.convert import load_imagenet_supervised
        params = load_imagenet_supervised(cfg, params)

    tx = make_adamw(cfg.optim.learning_rate, cfg.optim.b1, cfg.optim.b2,
                    cfg.optim.eps, cfg.optim.adamw_weight_decay,
                    grad_clip=cfg.optim.grad_clip)

    from ssl4gie_tpu.core import checkpoint as ckpt_lib
    from ssl4gie_tpu.core.logger import MetricsLogger
    from ssl4gie_tpu.core.schedule import ReduceLROnPlateau
    logger = MetricsLogger(cfg.log_dir, cfg.run_name(),
                           tb=cfg.runtime.tensorboard)
    ckpt = ckpt_lib.CheckpointManager(cfg.ckpt_dir, cfg.run_name())
    plateau = None
    if cfg.optim.use_plateau_scheduler:
        plateau = ReduceLROnPlateau(mode="max", factor=cfg.optim.plateau_factor,
                                    patience=cfg.optim.plateau_patience,
                                    min_lr=cfg.optim.min_lr)
    return DetectionTrainer(cfg, mesh, model, params, batch_stats, tx,
                            train_src, val_src, test_src, logger, ckpt, plateau)
