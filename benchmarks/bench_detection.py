"""Detection train-step bench: ViT-Det 1024px and RN50-FPN 1344px, B/accum sweep.

Round-5 additions (VERDICT item 3): batch-size sweep (the reference trains
detection at global batch 48 with --accum_iter 2, `README.md:111-114`), the
RN50-FPN 1344 canvas variant, and an eval-step timing so the per-epoch
val+test mAP cost (`tasks/detection.py` runs both every epoch) is accounted.
Also fixes a round-4 measurement hazard: the batch is now passed as a jit
ARGUMENT — closing over a large device array in a scanned jit measured 5x
slower on the MAE bench (see CLAUDE.md), so the old closure-style number
(174.2 ms @ B=2) may include that artifact.

Usage: python benchmarks/bench_detection.py [vit_b|resnet50] [B ...] [--accum N]
       [--eval]     (defaults: vit_b, B sweep 2 4 8)
"""
import sys
import time
import functools

import jax, jax.numpy as jnp, numpy as np
from ssl4gie_tpu.core.train_state import make_adamw
from ssl4gie_tpu.models.faster_rcnn import FasterRCNN
from ssl4gie_tpu.tasks.detection import make_detection_train_step, MAX_GT
from ssl4gie_tpu.core.xla_options import jit_kwargs


def bench(arch: str, B: int, accum: int = 1, do_eval: bool = False,
          n: int = 10, eval_only: bool = False, masked_eval: bool = False):
    S = 1024 if arch == "vit_b" else 1344
    model = FasterRCNN(arch=arch, num_classes=2, image_size=S,
                       pos_embed_type="learned", dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((B, S, S, 3), jnp.float32)
    gtb = jnp.tile(jnp.asarray([[100., 100., 300., 300.]]), (B, MAX_GT, 1))
    gtl = jnp.ones((B, MAX_GT), jnp.int32)
    gtv = jnp.zeros((B, MAX_GT), bool).at[:, 0].set(True)
    variables = model.init({"params": rng, "sampler": rng}, img, gtb, gtl, gtv,
                           train=True)
    tx = make_adamw(1e-4)
    state = (variables["params"], tx.init(variables["params"]))
    step = make_detection_train_step(model, tx, accum,
                                     variables.get("batch_stats"),
                                     top_level=False)

    rng_np = np.random.default_rng(0)
    batch = {"image": jnp.asarray(rng_np.random((B, S, S, 3), np.float32)),
             "gt_boxes": gtb, "gt_labels": gtl, "gt_valid": gtv}
    dt = float("nan")
    if not eval_only:
        @functools.partial(jax.jit, **jit_kwargs("detection"))
        def run(state, batch, key):
            def body(st, k):
                st, m = step(st, batch, k)
                return st, m["loss"]
            return jax.lax.scan(body, state, jax.random.split(key, n))

        _, losses = run(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(losses)
        t0 = time.perf_counter()
        _, losses = run(state, batch, jax.random.PRNGKey(2))
        float(losses[-1])
        dt = (time.perf_counter() - t0) / n * 1000
        print(f"{arch} {S}px train step: {dt:.1f} ms/step @ B={B} accum={accum} "
              f"({B / dt * 1000:.1f} img/s)", flush=True)

    if do_eval:
        # per-epoch eval cost: the trainer runs val AND test mAP every epoch
        # at eval batch 2 (`tasks/detection.py`); time the eval forward.
        # --masked passes content_sizes (a typical torchvision-resized extent)
        # to price the batch-max emulation (anchor mask + extent-masked
        # backbone + extent-aware RoIAlign + per-image clip).
        eB = 2
        ebatch = jnp.asarray(rng_np.random((eB, S, S, 3), np.float32))
        ecs = (jnp.asarray([[1067, 800]] * eB, jnp.int32)
               if masked_eval else None)

        @functools.partial(jax.jit, **jit_kwargs("detection"))
        def erun(params, x):
            def body(carry, i):
                # x must depend on the loop index, else XLA hoists the whole
                # (loop-invariant) model out of the scan and the bench times
                # ONE apply + relay overhead spread over n "steps" — this
                # exact artifact produced the retracted 223.6 ms round-5
                # eval figure (real device cost ~72 ms, profile_detection.py)
                xi = x + (1e-12 * i.astype(x.dtype) + carry * 0.0)
                det = model.apply(
                    {"params": params,
                     "batch_stats": variables.get("batch_stats", {})},
                    xi, train=False, content_sizes=ecs)
                s = det["scores"][:, 0]
                return jnp.sum(s) * 1e-20, s
            return jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))

        _, s0 = erun(state[0], ebatch)
        jax.block_until_ready(s0)
        edt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _, s0 = erun(state[0], ebatch)
            float(s0[-1, 0])
            edt = min(edt, (time.perf_counter() - t0) / n * 1000)
        tag = " (masked batch-max emulation)" if masked_eval else ""
        print(f"{arch} {S}px eval step{tag}:  {edt:.1f} ms/step @ B={eB} "
              f"({eB / edt * 1000:.1f} img/s)", flush=True)
    return dt


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    arch = args.pop(0) if args and not args[0].isdigit() and \
        not args[0].startswith("--") else "vit_b"
    accum = 1
    if "--accum" in args:
        i = args.index("--accum")
        accum = int(args[i + 1])
        del args[i:i + 2]
    do_eval = "--eval" in args
    eval_only = "--eval-only" in args
    masked = "--masked" in args
    args = [a for a in args if a not in ("--eval", "--eval-only", "--masked")]
    bs = [int(a) for a in args] or [2, 4, 8]
    for B in bs:
        bench(arch, B, accum, (do_eval or eval_only) and B == bs[-1],
              eval_only=eval_only, masked_eval=masked)
