"""Detection task wiring: data source (Kvasir boxes JSON), box-aware on-device
augmentation, jitted train step (loss-dict sum like `train_detection.py:72-77`,
with lax.scan gradient accumulation for --accum_iter), and mAP-selected eval.

Static-shape data contract: every image is center-padded (after optional 2x
bicubic downscale when larger than the canvas, `Object_detection/Data/
dataset.py:82-106`) into a fixed square canvas; GT boxes are padded to MAX_GT with
a validity mask. Both backbones use the fixed canvas (the reference fixes 1024 for
ViT; RN50 goes through torchvision's dynamic min/max resize — fixed-square is the
TPU-native equivalent and is recorded as a deliberate deviation).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssl4gie_tpu.data.loader import Source

MAX_GT = 16


def parse_kvasir_targets(input_path: str, targets: dict):
    """`get_Kvasir_target_vals` (`train_detection.py:154-167`)."""
    objects = targets[os.path.splitext(os.path.basename(input_path))[0]]["bbox"]
    boxes = np.zeros((len(objects), 4), np.float32)
    for i, obj in enumerate(objects):
        boxes[i] = [obj["xmin"], obj["ymin"], obj["xmax"], obj["ymax"]]
    labels = np.ones((len(objects),), np.int32)
    return boxes, labels


TV_MIN_SIZE = 800      # torchvision GeneralizedRCNNTransform defaults
TV_MAX_SIZE = 1333     # (`fasterrcnn_resnet50_fpn`, `train_detection.py:197`)
TV_CANVAS = 1344       # 1333 rounded up to the FPN's size_divisible=32


def _tv_bilinear_resize(im, W2: int, H2: int):
    """torchvision `GeneralizedRCNNTransform` bilinear resize semantics.

    torchvision resizes the float image with NON-antialiased bilinear
    (`F.interpolate(mode="bilinear", align_corners=False)`); PIL's BILINEAR
    antialiases on downscale — measured round 5: upscales agree to <=1/255
    everywhere, downscales differ by up to ~9% of range on ~20% of pixels
    (docs/PARITY.md deviation #10). torch is a host-side optional dep here:
    when importable the exact kernel is used (residual deviation is only the
    uint8 round-trip, <=0.5/255); otherwise PIL remains the fallback.
    Returns a PIL Image either way."""
    try:
        import torch
        import torch.nn.functional as torch_F
    except Exception:
        from PIL import Image
        return im.resize((W2, H2), Image.BILINEAR)
    arr = np.asarray(im, np.float32)
    t = torch.from_numpy(arr).permute(2, 0, 1)[None]
    out = torch_F.interpolate(t, size=(H2, W2), mode="bilinear",
                              align_corners=False)
    out = out[0].permute(1, 2, 0).round().clamp(0, 255).byte().numpy()
    from PIL import Image
    return Image.fromarray(out)


class DetectionSource(Source):
    """Host-side detection image prep into one static canvas.

    resize modes:
    - "fixed" (ViT path): optional 2x bicubic downscale when larger than the
      canvas, then CENTER-pad into a square canvas — the reference's ViT-Det
      prep (`Object_detection/Data/dataset.py:82-106` + fixed_size 1024).
    - "torchvision" (RN50 path): torchvision GeneralizedRCNNTransform
      semantics — bilinear resize by min(800/min_side, 1333/max_side), boxes
      scaled by the per-axis actual ratios, image placed TOP-LEFT on a 1344
      canvas (torchvision zero-pads bottom/right to the batch max rounded to
      /32; a fixed 1344 equals that behavior for a batch whose max is 1344).
      Replaces the round-1 fixed-1024 deviation for RN50
      (`train_detection.py:197-204`).
    """

    def __init__(self, paths: List[str], targets: dict, canvas: int = 1024,
                 keep_original: bool = False, resize: str = "fixed"):
        self.paths, self.targets, self.canvas = list(paths), targets, canvas
        self.keep_original = keep_original
        self.resize = resize

    def __len__(self):
        return len(self.paths)

    def get(self, i):
        from PIL import Image
        path = self.paths[i]
        boxes, labels = parse_kvasir_targets(path, self.targets)
        im = Image.open(path)
        if im.mode != "RGB":
            im = im.convert("RGB")
        original = np.asarray(im, np.uint8) if self.keep_original else None
        W, H = im.size
        if self.resize == "torchvision":
            s = min(TV_MIN_SIZE / min(H, W), TV_MAX_SIZE / max(H, W))
            # floor, matching torchvision's F.interpolate(scale_factor=s,
            # recompute_scale_factor=True) output dims (int(round(.)) differed
            # by 1px on ~half of inputs).
            W2, H2 = int(W * s), int(H * s)
            im = _tv_bilinear_resize(im, W2, H2)
            boxes[:, [0, 2]] *= W2 / W      # torchvision resize_boxes: per-axis
            boxes[:, [1, 3]] *= H2 / H      # ratios of actual new/old sizes
            scale = np.asarray([W2 / W, H2 / H], np.float32)
            W, H = W2, H2
            p1 = p2 = 0                     # top-left placement
        else:
            # halve if larger than the canvas (bicubic, `Data/dataset.py:84-99`)
            scale = np.asarray([1.0, 1.0], np.float32)
            if H > self.canvas or W > self.canvas:
                if H % 2:
                    H += 1
                if W % 2:
                    W += 1
                im = im.resize((W // 2, H // 2), Image.BICUBIC)
                W, H = im.size
                boxes = boxes / 2.0
                scale = np.asarray([0.5, 0.5], np.float32)
            p1 = int(np.floor((self.canvas - W) / 2))
            p2 = int(np.floor((self.canvas - H) / 2))
        canvas = np.zeros((self.canvas, self.canvas, 3), np.uint8)
        canvas[p2:p2 + H, p1:p1 + W] = np.asarray(im, np.uint8)
        boxes[:, [0, 2]] += p1
        boxes[:, [1, 3]] += p2
        content_size = np.asarray([W, H], np.int32)   # pre-pad extent (W2, H2)

        n = min(len(boxes), MAX_GT)
        gt_boxes = np.zeros((MAX_GT, 4), np.float32)
        gt_labels = np.zeros((MAX_GT,), np.int32)
        gt_valid = np.zeros((MAX_GT,), bool)
        gt_boxes[:n] = boxes[:n]
        gt_labels[:n] = labels[:n]
        gt_valid[:n] = True
        out = {"image": canvas, "gt_boxes": gt_boxes, "gt_labels": gt_labels,
               "gt_valid": gt_valid}
        if self.resize == "torchvision":
            # torchvision clips detections to each image's pre-pad size
            # (RoIHeads.postprocess_detections image_shapes); evaluate_map
            # applies this host-side when the key is present. The ViT path
            # (resize="fixed") matches the reference's fixed_size=(1024,1024)
            # where torchvision itself clips at the full canvas — no key.
            out["content_size"] = content_size
        if self.keep_original:
            out["pad"] = np.asarray([p1, p2], np.int32)
            out["scale"] = scale                     # per-axis (sx, sy)
            out["original"] = original
        return out


def clip_to_content(boxes: np.ndarray, content_size) -> np.ndarray:
    """torchvision RoIHeads clips detections to each image's pre-pad size
    (`postprocess_detections` image_shapes); apply the same per-image clip
    host-side for the RN50 path. boxes (N, 4) xyxy; content_size (W, H)."""
    cw, ch = float(content_size[0]), float(content_size[1])
    boxes = np.asarray(boxes, np.float32)
    return np.stack([np.clip(boxes[:, 0], 0, cw), np.clip(boxes[:, 1], 0, ch),
                     np.clip(boxes[:, 2], 0, cw), np.clip(boxes[:, 3], 0, ch)],
                    axis=1)


def boxes_to_original(boxes: np.ndarray, pad: np.ndarray,
                      scale: np.ndarray) -> np.ndarray:
    """Map canvas-space boxes back to original-image coordinates, inverting
    DetectionSource's pad-then-place bookkeeping — the reference's
    `(box - pad) / scale` un-pad/rescale in `predict_detection.py:29-44`.
    boxes (N, 4) xyxy; pad (p1, p2); scale per-axis (sx, sy)."""
    out = np.asarray(boxes, np.float32).copy()
    p1, p2 = float(pad[0]), float(pad[1])
    sx, sy = float(scale[0]), float(scale[1])
    out[:, [0, 2]] = (out[:, [0, 2]] - p1) / sx
    out[:, [1, 3]] = (out[:, [1, 3]] - p2) / sy
    return out


class SyntheticDetectionSource(Source):
    def __init__(self, n: int, canvas: int = 256, seed: int = 0):
        self.n, self.canvas, self.seed = n, canvas, seed

    def __len__(self):
        return self.n

    def get(self, i):
        rng = np.random.default_rng(self.seed * 7919 + i)
        img = rng.integers(0, 256, (self.canvas, self.canvas, 3), dtype=np.uint8)
        n_obj = int(rng.integers(1, 4))
        gt_boxes = np.zeros((MAX_GT, 4), np.float32)
        gt_labels = np.zeros((MAX_GT,), np.int32)
        gt_valid = np.zeros((MAX_GT,), bool)
        for j in range(n_obj):
            x0, y0 = rng.uniform(0, self.canvas * 0.6, 2)
            w, h = rng.uniform(self.canvas * 0.1, self.canvas * 0.35, 2)
            gt_boxes[j] = [x0, y0, min(x0 + w, self.canvas), min(y0 + h, self.canvas)]
            gt_labels[j] = 1
            gt_valid[j] = True
            # paint the object so there is signal
            img[int(y0):int(gt_boxes[j, 3]), int(x0):int(gt_boxes[j, 2])] = \
                rng.integers(180, 256, 3)
        return {"image": img, "gt_boxes": gt_boxes, "gt_labels": gt_labels,
                "gt_valid": gt_valid}


# ------------------------------------------------------------ augmentation

@functools.partial(jax.jit, static_argnames=())
def detection_augment(key, img_u8, gt_boxes):
    """rot90 / hflip / vflip with box bookkeeping (`Data/dataset.py:50-80`) +
    ColorJitter/blur (no normalize — the model normalizes internally, matching
    GeneralizedRCNNTransform). Square canvas assumed."""
    from ssl4gie_tpu.data.augment import color_jitter, gaussian_blur
    B, S = img_u8.shape[0], img_u8.shape[1]
    kj, kb, kr, kh, kv = jax.random.split(key, 5)
    img = img_u8.astype(jnp.float32) / 255.0
    img = color_jitter(kj, img)
    img = gaussian_blur(kb, img)

    Sf = jnp.float32(S)
    x0, y0, x1, y1 = (gt_boxes[..., i] for i in range(4))

    do_r = jax.random.uniform(kr, (B,)) > 0.5
    # torch.rot90(dims=[1,2]) on CHW = CCW rotation: new[x, W-1-y]... box transform
    # per the reference: new_x = old_y; new_y = W - old_x (swapped corners)
    rot_img = jnp.rot90(img, k=1, axes=(1, 2))
    img = jnp.where(do_r[:, None, None, None], rot_img, img)
    rx0 = jnp.where(do_r[:, None], y0, x0)
    rx1 = jnp.where(do_r[:, None], y1, x1)
    ry0 = jnp.where(do_r[:, None], Sf - x1, y0)
    ry1 = jnp.where(do_r[:, None], Sf - x0, y1)
    x0, y0, x1, y1 = rx0, ry0, rx1, ry1

    do_h = jax.random.uniform(kh, (B,)) > 0.5
    img = jnp.where(do_h[:, None, None, None], img[:, :, ::-1], img)
    hx0 = jnp.where(do_h[:, None], Sf - x1, x0)
    hx1 = jnp.where(do_h[:, None], Sf - x0, x1)
    x0, x1 = hx0, hx1

    do_v = jax.random.uniform(kv, (B,)) > 0.5
    img = jnp.where(do_v[:, None, None, None], img[:, ::-1], img)
    vy0 = jnp.where(do_v[:, None], Sf - y1, y0)
    vy1 = jnp.where(do_v[:, None], Sf - y0, y1)
    y0, y1 = vy0, vy1

    return img, jnp.stack([x0, y0, x1, y1], axis=-1)


# ------------------------------------------------------------ train/eval steps

def make_detection_train_step(model, tx, accum_steps: int = 1, batch_stats=None,
                              top_level: bool = True):
    # top_level=False skips the TPU compiler options for callers that wrap
    # this step in their own jit (jax restricts compiler_options to the
    # outermost jit)
    # batch_stats (RN50 backbone) are FROZEN at their loaded values, matching
    # torchvision FrozenBatchNorm2d — they ride along as constants.
    def loss_fn(params, batch, key):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        losses = model.apply(
            variables, batch["image"], batch["gt_boxes"],
            batch["gt_labels"], batch["gt_valid"], train=True,
            rngs={"sampler": key})
        total = sum(losses.values())
        return total, losses

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    from ssl4gie_tpu.core.xla_options import jit_kwargs
    @functools.partial(jax.jit, donate_argnums=(0,),
                       **(jit_kwargs("detection") if top_level else {}))
    def train_step(state, batch, key):
        params, opt_state = state
        if accum_steps == 1:
            (loss, losses), grads = grad_fn(params, batch, key)
        else:
            mb = jax.tree_util.tree_map(
                lambda x: x.reshape((accum_steps, x.shape[0] // accum_steps)
                                    + x.shape[1:]), batch)
            keys = jax.random.split(key, accum_steps)

            def body(carry, xs):
                g_acc, l_acc = carry
                b, k = xs
                (l, _), g = grad_fn(params, b, k)
                return (jax.tree_util.tree_map(jnp.add, g_acc, g), l_acc + l), None

            zero = jax.tree_util.tree_map(jnp.zeros_like, params)
            (grads, loss), _ = jax.lax.scan(body, (zero, jnp.zeros(())),
                                            (mb, keys))
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
            loss = loss / accum_steps
            losses = {}
        import optax
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return (new_params, new_opt), {"loss": loss}

    return train_step


def make_detection_eval_step(model, batch_stats=None):
    @jax.jit
    def eval_step(params, images, content_sizes=None):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, images, train=False,
                           content_sizes=content_sizes)
    return eval_step


def evaluate_map(model, params, source, batch_size: int = 2,
                 batch_stats=None) -> Dict[str, float]:
    """Run detection inference over a source and compute COCO mAP."""
    from ssl4gie_tpu.metrics.detection import MeanAveragePrecision
    eval_step = make_detection_eval_step(model, batch_stats)
    metric = MeanAveragePrecision()
    n = len(source)
    for start in range(0, n, batch_size):
        # every image enters the metric (the reference evaluates all of them,
        # `eval_detection.py`); the ragged tail is padded by repeating the last
        # sample so the jitted step keeps one static shape, and the padded rows
        # are skipped below.
        real = min(batch_size, n - start)
        samples = [source.get(start + min(i, real - 1))
                   for i in range(batch_size)]
        imgs = jnp.asarray(np.stack([s["image"] for s in samples])
                           ).astype(jnp.float32) / 255.0
        # RN50/torchvision prep carries per-image pre-pad extents: pass them
        # so the model reproduces torchvision's batch-max padding semantics
        # in-model (anchor masking + pre-NMS clipping); the host-side
        # clip_to_content below is then an idempotent no-op kept as a guard.
        cs = None
        if all("content_size" in s for s in samples):
            cs = jnp.asarray(np.stack([s["content_size"] for s in samples]))
        det = eval_step(params, imgs, cs)
        det = {k: np.asarray(v) for k, v in det.items()}
        preds, targets = [], []
        for bi, s in enumerate(samples[:real]):
            ok = det["valid"][bi]
            pb = det["boxes"][bi][ok]
            if "content_size" in s:
                pb = clip_to_content(pb, s["content_size"])
            preds.append({"boxes": pb,
                          "scores": det["scores"][bi][ok],
                          "labels": det["labels"][bi][ok]})
            gv = s["gt_valid"]
            targets.append({"boxes": s["gt_boxes"][gv],
                            "labels": s["gt_labels"][gv]})
        metric.update(preds, targets)
    return metric.compute()


# ------------------------------------------------------------ trainer

class DetectionTrainer:
    """Detection-specific engine: loss-dict training with optional grad accum,
    mAP('map') validation/selection each epoch (`train_detection.py:330`),
    plateau LR on val mAP, best-val checkpoint."""

    def __init__(self, cfg, mesh, model, params, batch_stats, tx,
                 train_source, val_source, test_source, logger, ckpt,
                 plateau=None):
        from ssl4gie_tpu.data.loader import Loader
        from ssl4gie_tpu.core.mesh import replicated
        self.cfg = cfg
        self.mesh = mesh
        self.model = model
        self.batch_stats = jax.device_put(batch_stats, replicated(mesh))
        self.tx = tx
        self.state = jax.device_put((params, tx.init(params)), replicated(mesh))
        self.train_loader = Loader(train_source, cfg.data.batch_size,
                                   shuffle=True, drop_last=True,
                                   seed=cfg.runtime.seed,
                                   num_threads=cfg.data.num_workers)
        self.val_source = val_source
        self.test_source = test_source
        self.logger = logger
        self.ckpt = ckpt
        self.plateau = plateau
        self.train_step = make_detection_train_step(
            model, tx, cfg.optim.accum_steps, batch_stats)
        self.root_key = jax.random.PRNGKey(cfg.runtime.seed)
        self.best_val = None
        self.start_epoch = 1
        self._lr = cfg.optim.learning_rate
        # preemption machinery mirroring core.trainer.Trainer: a `.preempt`
        # sibling slot so requeue state never clobbers the best-val params,
        # plus an epoch-boundary snapshot that a MID-epoch signal saves (the
        # interrupted epoch replays from clean state; no batch applied twice)
        import os as _os
        from ssl4gie_tpu.core import checkpoint as ckpt_lib
        self.preempt_ckpt = ckpt_lib.CheckpointManager(
            _os.path.dirname(ckpt.path), _os.path.basename(ckpt.path) + ".preempt")
        self._guard = None
        self._boundary_snapshot = None
        self._preempt_slot_epoch = None

    def train_epoch(self, epoch):
        from ssl4gie_tpu.core.logger import Throughput
        from ssl4gie_tpu.data.loader import prefetch_to_device
        meter = Throughput()
        it = prefetch_to_device(self.train_loader.epoch(epoch), self.mesh)
        n_steps = max(len(self.train_loader), 1)
        epoch_keys = jax.random.split(
            jax.random.fold_in(self.root_key, epoch), 2 * n_steps)
        for step, batch in enumerate(it):
            if self._guard is not None and self._guard.should_stop:
                self._check_preempted(epoch - 1)
            kaug, kstep = epoch_keys[2 * step], epoch_keys[2 * step + 1]
            img, boxes = detection_augment(kaug, batch["image"],
                                           batch["gt_boxes"])
            batch = dict(batch, image=img, gt_boxes=boxes)
            self.state, metrics = self.train_step(self.state, batch, kstep)
            meter.update(batch["image"].shape[0])
            if (step + 1) % self.cfg.runtime.log_every == 0:
                self.logger.log({"epoch": epoch, "step": step + 1,
                                 "loss": float(metrics["loss"]),
                                 **meter.rates()})

    def evaluate(self, source, epoch, split):
        res = evaluate_map(self.model, self.state[0], source,
                           batch_size=min(2, len(source)),
                           batch_stats=self.batch_stats)
        self.logger.log({"epoch": epoch, f"{split}_map": res["map"],
                         f"{split}_map50": res["map_50"]})
        return res["map"]

    def _ckpt_tree(self, epoch, val, test):
        from ssl4gie_tpu.core import checkpoint as ckpt_lib
        return {"params": ckpt_lib.host_tree(self.state[0]),
                "opt_state": ckpt_lib.host_tree(self.state[1]),
                "batch_stats": ckpt_lib.host_tree(self.batch_stats),
                "meta": {"epoch": epoch, "val_perf": val, "test_perf": test}}

    def maybe_resume(self):
        # prefer the `.preempt` slot when it records a LATER epoch than the
        # best-val slot (same policy as core.trainer.Trainer.maybe_resume)
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
        self.state = (restored["params"], restored["opt_state"])
        self.batch_stats = restored["batch_stats"]
        self.start_epoch = int(restored["meta"]["epoch"]) + 1
        self.best_val = float(restored["meta"]["val_perf"])
        self.logger.log({"resumed_from_epoch": self.start_epoch - 1,
                         "best_val": self.best_val})

    def _check_preempted(self, epoch):
        """Save the requeue state (last COMPLETE epoch boundary) and stop.

        Mirrors `core/trainer.py:_check_preempted`: the saved meta marks
        `epoch` epochs complete; a mid-epoch signal saves the boundary
        snapshot, not the in-flight params, so the interrupted epoch replays
        deterministically (per-epoch RNG) — submitit requeue semantics
        (`submitit_pretrain.py:60-70`)."""
        from ssl4gie_tpu.core import checkpoint as ckpt_lib
        from ssl4gie_tpu.core.preempt import Preempted
        if self._guard is None or not self._guard.should_stop:
            return
        # host_tree is a collective under sharded state — build the tree on
        # every (signal-received) process, write on primary only
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

    def fit(self):
        from ssl4gie_tpu.core.preempt import PreemptionGuard
        self.maybe_resume()
        try:
            with PreemptionGuard() as self._guard:
                return self._fit()
        finally:
            self._guard = None

    def _fit(self):
        from ssl4gie_tpu.core import checkpoint as ckpt_lib
        for epoch in range(self.start_epoch, self.cfg.epochs + 1):
            self._boundary_snapshot = self._ckpt_tree(
                epoch - 1, self.best_val if self.best_val is not None else 0.0,
                0.0)
            self._check_preempted(epoch - 1)
            self.train_epoch(epoch)
            val = self.evaluate(self.val_source, epoch, "val")
            test = self.evaluate(self.test_source, epoch, "test")
            if self.plateau is not None:
                new_lr = self.plateau.step(val, self._lr)
                if new_lr != self._lr:
                    self._lr = new_lr
                    from ssl4gie_tpu.core.train_state import set_lr
                    self.state = (self.state[0], set_lr(self.state[1], new_lr))
                    self.logger.log({"epoch": epoch, "lr_reduced_to": new_lr})
            if self.best_val is None or val > self.best_val:
                self.best_val = val
                if ckpt_lib.is_primary():
                    self.ckpt.save(self._ckpt_tree(epoch, val, test))
                self.logger.log({"epoch": epoch, "new_best_val_map": val,
                                 "test_map_at_best": test})
            # drop a stale .preempt slot once this run has trained past it
            if (self._preempt_slot_epoch is not None
                    and epoch > self._preempt_slot_epoch):
                if ckpt_lib.is_primary():
                    self.preempt_ckpt.delete()
                self._preempt_slot_epoch = None
            # a signal that lands during eval is handled by the NEXT epoch's
            # boundary check (fresh snapshot), like core.trainer._fit
        return self.best_val
