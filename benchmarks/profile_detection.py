"""Profile the ViT-Det train/eval step: where do 174/224 ms actually go?

Round-5 sweep measured eval (B=2) SLOWER than train (B=2) per step, which
points at the latency-bound greedy-NMS slot scans (`ops/nms.py`: 1000
sequential argmax+suppress iterations in the RPN, 100 in the RoI head) rather
than MXU work. This script traces one scanned run of each and aggregates
device-event durations by op name, separating `while`-loop (NMS scan) time
from fusion/GEMM time.

Usage: python benchmarks/profile_detection.py [train|eval] [B]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.profile_peak import trace_events
from ssl4gie_tpu.core.train_state import make_adamw
from ssl4gie_tpu.core.xla_options import jit_kwargs
from ssl4gie_tpu.models.faster_rcnn import FasterRCNN
from ssl4gie_tpu.tasks.detection import make_detection_train_step, MAX_GT
import functools

N_STEPS = 5


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "eval"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    S = 1024
    model = FasterRCNN(arch="vit_b", num_classes=2, image_size=S,
                       pos_embed_type="learned", dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((B, S, S, 3), jnp.float32)
    gtb = jnp.tile(jnp.asarray([[100., 100., 300., 300.]]), (B, MAX_GT, 1))
    gtl = jnp.ones((B, MAX_GT), jnp.int32)
    gtv = jnp.zeros((B, MAX_GT), bool).at[:, 0].set(True)
    variables = model.init({"params": rng, "sampler": rng}, img, gtb, gtl, gtv,
                           train=True)
    rng_np = np.random.default_rng(0)
    x = jnp.asarray(rng_np.random((B, S, S, 3), np.float32))

    if which == "train":
        tx = make_adamw(1e-4)
        state = (variables["params"], tx.init(variables["params"]))
        step = make_detection_train_step(model, tx, 1,
                                         variables.get("batch_stats"),
                                         top_level=False)
        batch = {"image": x, "gt_boxes": gtb, "gt_labels": gtl, "gt_valid": gtv}

        @functools.partial(jax.jit, **jit_kwargs("detection"))
        def run(state, batch, key):
            def body(st, k):
                st, m = step(st, batch, k)
                return st, m["loss"]
            return jax.lax.scan(body, state, jax.random.split(key, N_STEPS))

        out = lambda: float(run(state, batch, jax.random.PRNGKey(1))[1][-1])
    else:
        @functools.partial(jax.jit, **jit_kwargs("detection"))
        def erun(params, x):
            def body(_, i):
                det = model.apply(
                    {"params": params,
                     "batch_stats": variables.get("batch_stats", {})},
                    x, train=False)
                return None, det["scores"][:, 0]
            return jax.lax.scan(body, None, jnp.arange(N_STEPS))

        params = variables["params"]
        out = lambda: float(erun(params, x)[1][-1, 0])

    out()  # compile
    out()
    trace_dir = f"/tmp/det_trace_{which}"
    with jax.profiler.trace(trace_dir):
        out()
    _, ops = trace_events(trace_dir)
    # drop parent spans (jit_*, the outer while) to avoid double counting
    leaves = {n: v for n, v in ops.items()
              if not n.startswith("jit_") and n != "while"}
    total = sum(v[0] for v in leaves.values())
    whiles = sum(v[0] for n, v in leaves.items() if n.startswith("while"))
    print(f"{'op':70s} {'total_ms':>9s} {'count':>6s}")
    for name, (dur, cnt) in sorted(leaves.items(), key=lambda kv: -kv[1][0])[:25]:
        print(f"{name[:70]:70s} {dur / 1e3:9.3f} {cnt:6d}")
    print(f"\nleaf total {total / 1e3:.1f} ms / {N_STEPS} steps = "
          f"{total / 1e3 / N_STEPS:.1f} ms/step; nested-while (NMS/loops) share "
          f"{whiles / 1e3:.1f} ms")


if __name__ == "__main__":
    main()
