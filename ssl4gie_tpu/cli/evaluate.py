"""Evaluation CLI (the reference eval_*.py equivalents).

Loads the best-val checkpoint written by cli.train and evaluates on the held-out
test split with native-resolution post-processing; appends to eval_results.txt.
"""

import argparse
import functools

import jax
import jax.numpy as jnp

from ssl4gie_tpu.cli.args import add_common, to_train_config
from ssl4gie_tpu.core import checkpoint as ckpt_lib
from ssl4gie_tpu.core.config import Task


def load_eval_state(cfg):
    """Build model + restore best-val params from the run's checkpoint."""
    from ssl4gie_tpu.models.factory import build_model
    from ssl4gie_tpu.data import discovery

    extras = {}
    if cfg.task == Task.CLASSIFICATION:
        if cfg.data.synthetic:
            extras = {"n_class": 6}
        else:
            data = discovery.discover_classification(cfg.data.data_root,
                                                     cfg.data.dataset)
            extras = {"n_class": data.n_class}

    dtype = jnp.bfloat16 if cfg.runtime.compute_dtype == "bfloat16" else jnp.float32
    rng = jax.random.PRNGKey(cfg.runtime.seed)
    if cfg.task == Task.DETECTION:
        from ssl4gie_tpu.models.factory import pos_embed_type_for
        from ssl4gie_tpu.models.faster_rcnn import FasterRCNN
        if cfg.data.synthetic:
            canvas = 256 if cfg.architecture.value == "vit_b" \
                else min(cfg.data.img_size, 256)
        else:
            from ssl4gie_tpu.tasks.detection import TV_CANVAS
            canvas = 1024 if cfg.architecture.value == "vit_b" else TV_CANVAS
        small = dict(rpn_pre_nms_top_n_test=100, rpn_post_nms_top_n_test=50,
                     detections_per_img=10) if cfg.data.synthetic else {}
        arch = "vit_b" if cfg.architecture.value == "vit_b" else "resnet50"
        model = FasterRCNN(arch=arch, image_size=canvas,
                           pos_embed_type=pos_embed_type_for(cfg.pretraining,
                                                             cfg.ss_framework),
                           dtype=dtype, **small)
        sample = jnp.zeros((1, canvas, canvas, 3), jnp.float32)
        variables = model.init({"params": rng, "sampler": rng}, sample,
                               jnp.zeros((1, 16, 4)), jnp.zeros((1, 16), jnp.int32),
                               jnp.zeros((1, 16), bool), train=True)
    else:
        model = build_model(cfg.task, cfg.architecture,
                            num_classes=extras.get("n_class", 1),
                            pretraining=cfg.pretraining, framework=cfg.ss_framework,
                            out_token=cfg.out_token, img_size=cfg.data.img_size,
                            dtype=dtype)
        sample = jnp.zeros((1, cfg.data.img_size, cfg.data.img_size, 3), jnp.float32)
        init_rngs = {"params": rng, "dropout": rng}
        variables = jax.jit(functools.partial(model.init, train=False))(init_rngs,
                                                                        sample)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    ckpt = ckpt_lib.CheckpointManager(cfg.ckpt_dir, cfg.run_name())
    if not ckpt.exists():
        raise FileNotFoundError(f"no checkpoint at {ckpt.path} — train first")
    restored = ckpt.restore()    # full tree (params/opt_state/batch_stats/meta)
    return model, restored["params"], restored.get("batch_stats") or {}, extras


def make_test_source(cfg):
    from ssl4gie_tpu.data import discovery
    from ssl4gie_tpu.data.loader import (ClassificationSource, DepthSource,
                                         SegmentationSource, SyntheticSource)
    from ssl4gie_tpu.data.splits import split_ids

    if cfg.task == Task.DETECTION:
        from ssl4gie_tpu.tasks.detection import (DetectionSource,
                                                 SyntheticDetectionSource)
        if cfg.data.synthetic:
            canvas = 256 if cfg.architecture.value == "vit_b" \
                else min(cfg.data.img_size, 256)
            return SyntheticDetectionSource(cfg.data.synthetic_size, canvas, seed=2)
        paths, targets = discovery.discover_detection(cfg.data.data_root,
                                                      cfg.data.dataset)
        _, te, _ = split_ids(len(paths))
        from ssl4gie_tpu.tasks.detection import TV_CANVAS
        if cfg.architecture.value == "vit_b":
            return DetectionSource([paths[i] for i in te], targets, 1024)
        return DetectionSource([paths[i] for i in te], targets, TV_CANVAS,
                               resize="torchvision")
    if cfg.data.synthetic:
        return SyntheticSource(cfg.data.synthetic_size, cfg.data.img_size,
                               cfg.task.value, seed=2)
    if cfg.task == Task.CLASSIFICATION:
        d = discovery.discover_classification(cfg.data.data_root, cfg.data.dataset)
        _, te, _ = split_ids(len(d.input_paths))
        return ClassificationSource([d.input_paths[i] for i in te],
                                    [d.targets[i] for i in te], cfg.data.img_size)
    if cfg.task == Task.SEGMENTATION:
        imgs, masks = discovery.discover_segmentation(cfg.data.data_root,
                                                      cfg.data.dataset)
        _, te, _ = split_ids(len(imgs))
        return SegmentationSource([imgs[i] for i in te], [masks[i] for i in te],
                                  cfg.data.img_size, native_target=True)
    if cfg.task == Task.DEPTH:
        splits = discovery.discover_depth(cfg.data.data_root, numeric_sort=True)
        rgb, dep = splits["test"]
        return DepthSource(rgb, dep, cfg.data.img_size, with_native=True)
    raise NotImplementedError(cfg.task)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    add_common(p)
    p.add_argument("--ckpt-dir", type=str, default="Trained models",
                   dest="ckpt_dir")
    p.add_argument("--print-list", action="store_true", dest="print_list")
    p.add_argument("--results-root", type=str, default=".", dest="results_root")
    args = p.parse_args()
    args.epochs = 1
    cfg = to_train_config(args)
    cfg.ckpt_dir = args.ckpt_dir

    model, params, batch_stats, extras = load_eval_state(cfg)
    src = make_test_source(cfg)

    from ssl4gie_tpu.tasks import evaluate as E
    if cfg.task == Task.CLASSIFICATION:
        E.evaluate_classification(cfg, model, params, batch_stats, src,
                                  extras["n_class"], args.results_root)
    elif cfg.task == Task.SEGMENTATION:
        E.evaluate_segmentation(cfg, model, params, batch_stats, src,
                                args.results_root, args.print_list)
    elif cfg.task == Task.DEPTH:
        E.evaluate_depth(cfg, model, params, batch_stats, src,
                         args.results_root, args.print_list)
    elif cfg.task == Task.DETECTION:
        # reference eval_detection.py prints mAP@[.5:.95]/.5/.75 and appends to the
        # ledger (`eval_detection.py:38-40`)
        from ssl4gie_tpu.core.logger import append_eval_results
        from ssl4gie_tpu.tasks.detection import evaluate_map
        res = evaluate_map(model, params, src, batch_stats=batch_stats)
        header = f"Detection results for {cfg.run_name()}"
        lines = [f"mAP: {res['map']}", f"mAP@50: {res['map_50']}",
                 f"mAP@75: {res['map_75']}"]
        for ln in [header] + lines:
            print(ln)
        append_eval_results(args.results_root, header, lines)
    else:
        raise NotImplementedError(cfg.task)


if __name__ == "__main__":
    main()
