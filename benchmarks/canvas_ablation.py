"""Quantify the detection static-canvas deviation (round-5 VERDICT item 7).

The repo's RN50 detection path always pads images to the static 1344 canvas
(`tasks/detection.py:38-41` — torchvision resize rule, TOP-LEFT placement),
while torchvision's `GeneralizedRCNNTransform` pads each batch only to the
batch max rounded to /32 (`/root/reference/Object_detection/train_detection.py:
197-204`). The two agree only when a batch contains a max-size image; otherwise
the static canvas adds extra zero padding that the FPN/RPN see (and, because
the repo normalizes in-model AFTER padding, the pad pixels sit at -mean/std in
normalized space instead of torchvision's 0).

This ablation measures the effect on synthetic data at CPU-feasible scale:
identical image content (objects inside a 128px region, identical seeds and
init) trained + evaluated on

  tight: canvas 128 (= batch-max /32 semantics)
  big:   canvas 192 (50% linear over-padding — proportionally MORE padding
         than the real 1344-vs-~1100 worst case, so an upper bound)

and reports mAP for both. Run: JAX_PLATFORMS=cpu python benchmarks/canvas_ablation.py
"""
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from ssl4gie_tpu.metrics.detection import MeanAveragePrecision
from ssl4gie_tpu.models.faster_rcnn import FasterRCNN
from ssl4gie_tpu.tasks.detection import (SyntheticDetectionSource,
                                         make_detection_train_step)

CONTENT = 128
STEPS = 150
B = 4
N_TRAIN, N_EVAL = 32, 16


def batch_at(canvas, samples):
    """Pad CONTENT-sized samples top-left onto `canvas` (boxes unchanged)."""
    imgs = np.zeros((len(samples), canvas, canvas, 3), np.uint8)
    out = {}
    for i, s in enumerate(samples):
        imgs[i, :CONTENT, :CONTENT] = s["image"]
    out["image"] = jnp.asarray(imgs.astype(np.float32) / 255.0)
    for k in ("gt_boxes", "gt_labels", "gt_valid"):
        out[k] = jnp.asarray(np.stack([s[k] for s in samples]))
    return out


def make_model(canvas):
    return FasterRCNN(arch="resnet50", image_size=canvas,
                      rpn_pre_nms_top_n_train=400, rpn_pre_nms_top_n_test=200,
                      rpn_post_nms_top_n_train=200,
                      rpn_post_nms_top_n_test=100,
                      box_batch_size_per_image=64, detections_per_img=20)


def eval_map(model, params, batch_stats, canvas, with_cs: bool = False):
    """with_cs: pass per-image content extents so the model applies the
    round-5 batch-max emulation (anchor masking + pre-NMS clipping)."""
    cs = jnp.asarray([[CONTENT, CONTENT]] * B) if with_cs else None
    apply = jax.jit(lambda p, x: model.apply(
        {"params": p, "batch_stats": batch_stats}, x, train=False,
        content_sizes=cs))
    eval_src = SyntheticDetectionSource(N_EVAL, canvas=CONTENT, seed=1)
    m = MeanAveragePrecision()
    for i0 in range(0, N_EVAL, B):
        samples = [eval_src.get(i) for i in range(i0, i0 + B)]
        batch = batch_at(canvas, samples)
        det = jax.tree_util.tree_map(np.asarray, apply(params, batch["image"]))
        preds, targets = [], []
        for j, s in enumerate(samples):
            v = det["valid"][j].astype(bool)
            # torchvision per-image clip to the pre-pad content extent
            # (round-5 `clip_to_content`); without it the over-padded canvas
            # measured a spurious +0.058 map_50 from unclipped boxes
            from ssl4gie_tpu.tasks.detection import clip_to_content
            preds.append(dict(boxes=clip_to_content(det["boxes"][j][v],
                                                    (CONTENT, CONTENT)),
                              scores=det["scores"][j][v],
                              labels=det["labels"][j][v]))
            gv = s["gt_valid"].astype(bool)
            targets.append(dict(boxes=s["gt_boxes"][gv],
                                labels=s["gt_labels"][gv]))
        m.update(preds, targets)
    return m.compute()


def run(canvas):
    model = make_model(canvas)
    train_src = SyntheticDetectionSource(N_TRAIN, canvas=CONTENT, seed=0)

    b0 = batch_at(canvas, [train_src.get(i) for i in range(B)])
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "sampler": jax.random.PRNGKey(0)},
                           b0["image"], b0["gt_boxes"], b0["gt_labels"],
                           b0["gt_valid"], train=True)
    tx = optax.adamw(1e-4)
    step = jax.jit(make_detection_train_step(
        model, tx, batch_stats=variables.get("batch_stats", {}),
        top_level=False))
    state = (variables["params"], tx.init(variables["params"]))

    t0 = time.time()
    order = np.random.default_rng(7).permutation
    for s in range(STEPS):
        idx = order(N_TRAIN)[:B] if s else np.arange(B)
        batch = batch_at(canvas, [train_src.get(int(i)) for i in idx])
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + s))
        if s % 20 == 0:
            print(f"  canvas={canvas} step {s} loss={float(metrics['loss']):.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    out = eval_map(model, state[0], variables.get("batch_stats", {}), canvas)
    print(f"  canvas={canvas}: map={out['map']:.4f} map_50={out['map_50']:.4f} "
          f"map_75={out['map_75']:.4f}", flush=True)
    return out, state[0], variables.get("batch_stats", {})


def eval_equivalence():
    """Round-5 quantification: with `content_sizes` batch-max emulation
    (anchor masking + per-image pre-NMS clip, models/faster_rcnn.py), how
    close is the over-padded 192-canvas eval to the tight 128 canvas with
    the SAME params?

    Three deviation mechanisms existed, all now addressed (cross-canvas
    eval matches to float-reassociation noise; measured bitwise-0 at one
    shape pair, <=0.01 px at another): (a) padded-region anchors competing
    in RPN top-k — killed exactly by the anchor mask; (b) backbone border
    halos — FrozenBN shifts turn the zero-padding region into nonzero
    activations that leak back across the content border through conv
    receptive fields — killed by `resnet.extent_mask` before every spatial
    op; (c) RoIAlign border clamp/outside rules applying at the static map
    edge instead of the batch-max extent — killed by
    `multiscale_roi_align(extent_hw=...)`.

    Params are canvas-size-independent (convs + heads only), so one training
    run serves both models. 10 train steps suffice: the equality holds for
    ANY params; training just makes the compared detections non-degenerate."""
    global STEPS
    STEPS, steps_saved = 10, STEPS
    _, params, bstats = run(CONTENT)
    STEPS = steps_saved

    # near-zero score threshold so all detection slots fill even at 10 train
    # steps — a STRONGER equivalence check (NMS + clipping run on real boxes)
    import dataclasses
    model_t = dataclasses.replace(make_model(CONTENT), box_score_thresh=1e-6)
    model_b = dataclasses.replace(make_model(192), box_score_thresh=1e-6)
    eval_src = SyntheticDetectionSource(N_EVAL, canvas=CONTENT, seed=1)
    samples = [eval_src.get(i) for i in range(B)]
    xt = batch_at(CONTENT, samples)["image"]
    xb = batch_at(192, samples)["image"]
    cs = jnp.asarray([[CONTENT, CONTENT]] * B)

    det_t = jax.tree_util.tree_map(np.asarray, model_t.apply(
        {"params": params, "batch_stats": bstats}, xt, train=False))
    det_b = jax.tree_util.tree_map(np.asarray, model_b.apply(
        {"params": params, "batch_stats": bstats}, xb, train=False,
        content_sizes=cs))

    v = det_t["valid"].astype(bool) & det_b["valid"].astype(bool)
    mism = int((det_t["valid"] != det_b["valid"]).sum())
    tot = int(det_t["valid"].astype(bool).sum())
    ds = np.abs(det_t["scores"][v] - det_b["scores"][v]).max() if v.any() else 0
    db = np.abs(det_t["boxes"][v] - det_b["boxes"][v]).max() if v.any() else 0
    lab = int((det_t["labels"][v] != det_b["labels"][v]).sum())
    print(f"tight-128 vs masked-192 eval: {tot} tight detections, "
          f"{mism} valid-slot mismatches, {lab} label flips on common slots, "
          f"common-slot max |dscore|={ds:.2e}, max |dbox|={db:.2e}", flush=True)
    assert mism == 0 and lab == 0 and ds < 1e-5 and db < 0.05, \
        "batch-max emulation regressed (should match to float-noise)"

    # mAP-level residual over the full eval set, masked vs tight
    def full_eval(model, canvas, with_cs):
        m = MeanAveragePrecision()
        for i0 in range(0, N_EVAL, B):
            smp = [eval_src.get(i) for i in range(i0, i0 + B)]
            x = batch_at(canvas, smp)["image"]
            kw = dict(content_sizes=cs) if with_cs else {}
            det = jax.tree_util.tree_map(np.asarray, model.apply(
                {"params": params, "batch_stats": bstats}, x, train=False,
                **kw))
            preds, targets = [], []
            for j, s in enumerate(smp):
                ok = det["valid"][j].astype(bool)
                preds.append(dict(boxes=det["boxes"][j][ok],
                                  scores=det["scores"][j][ok],
                                  labels=det["labels"][j][ok]))
                gv = s["gt_valid"].astype(bool)
                targets.append(dict(boxes=s["gt_boxes"][gv],
                                    labels=s["gt_labels"][gv]))
            m.update(preds, targets)
        return m.compute()

    mt = full_eval(model_t, CONTENT, False)
    mb = full_eval(model_b, 192, True)
    print(f"mAP tight={mt['map']:.4f}/{mt['map_50']:.4f} "
          f"masked-192={mb['map']:.4f}/{mb['map_50']:.4f} "
          f"residual delta map={mb['map'] - mt['map']:+.4f} "
          f"map_50={mb['map_50'] - mt['map_50']:+.4f} "
          f"(was -0.006/+0.058 unmasked)", flush=True)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "equivalence":
        eval_equivalence()
        sys.exit(0)
    print("train+eval on tight canvas (batch-max semantics):", flush=True)
    tight, params, bstats = run(CONTENT)

    # deterministic isolation of the padding effect: the SAME trained params
    # evaluated with the content placed on the over-padded canvas (anchors,
    # FPN and normalize all see the extra zero padding)
    print("same params evaluated on over-padded canvas:", flush=True)
    crosseval = eval_map(make_model(192), params, bstats, 192)
    print(f"  eval-only padding delta: map {crosseval['map'] - tight['map']:+.4f}, "
          f"map_50 {crosseval['map_50'] - tight['map_50']:+.4f}", flush=True)

    print("same params, over-padded canvas WITH batch-max emulation "
          "(content_sizes):", flush=True)
    masked = eval_map(make_model(192), params, bstats, 192, with_cs=True)
    print(f"  residual delta (full batch-max emulation; measured +0.0000 at "
          f"150 steps): map {masked['map'] - tight['map']:+.4f}, "
          f"map_50 {masked['map_50'] - tight['map_50']:+.4f}", flush=True)

    print("train+eval on static over-padded canvas (+50% linear):", flush=True)
    big, _, _ = run(192)
    print(f"\ntrain-time delta map = {big['map'] - tight['map']:+.4f}, "
          f"map_50 = {big['map_50'] - tight['map_50']:+.4f}")
