"""Device-profile a train program and print the fusion-family breakdown.

    python benchmarks/profile_step.py [cls|moco] [B] [outdir] [--parse-only]

Targets:
  cls   — the headline classification aug+train step (default B=192)
  moco  — the MoCo v3 two-crop pretrain step (default B=128 pairs)

Traces one scanned program, then parses the trace.json.gz directly (CLAUDE.md:
read device-pid events; wall timings of individual jit calls are unreliable
through the relay) and prints device time aggregated by op-name family
(multiply_add_fusion, attn, convolution_add_fusion, ...). The device pid
carries several overlay threads (module events, scan body, step markers, the
op lane) — only the op lane is counted, container events excluded, so the
total matches the wall ms/step.
"""

import collections
import glob
import gzip
import json
import re
import sys

import jax

N_STEPS_BY_TARGET = {"cls": 20, "moco": 10}


def parse_trace(outdir, n_steps, label=""):
    paths = sorted(glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("no trace written", file=sys.stderr)
        return
    with gzip.open(paths[-1], "rt") as f:
        events = json.load(f)["traceEvents"]

    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n or "Device" in n}
    lane_counts = collections.Counter(
        (e["pid"], e["tid"]) for e in events
        if e.get("ph") == "X" and e.get("pid") in dev_pids)
    if not lane_counts:
        print("no device events", file=sys.stderr)
        return
    op_lane = lane_counts.most_common(1)[0][0]

    def is_container(name):
        return (name in ("0",) or name.startswith("jit_")
                or name.startswith("while") or name.startswith("Step"))

    fam = collections.Counter()
    cnt = collections.Counter()
    ops = {}
    total = 0.0
    for e in events:
        if (e.get("ph") != "X" or (e.get("pid"), e.get("tid")) != op_lane
                or is_container(e.get("name", ""))):
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        total += dur
        f = re.sub(r"[.\d]+$", "", name)
        fam[f] += dur
        cnt[f] += 1
        rec = ops.setdefault(name, [0.0, (e.get("args", {}) or {})
                                    .get("long_name", "")])
        rec[0] += dur

    print(f"{label}total device time: {total:.1f} ms over {n_steps} steps "
          f"({total / n_steps:.1f} ms/step)")
    for k, v in fam.most_common(20):
        print(f"  {v / n_steps:8.2f} ms/step  x{cnt[k] // n_steps:4d}/step  {k}")
    print("\ntop 10 ops (with long_name):")
    for n, (dur, ln) in sorted(ops.items(), key=lambda kv: -kv[1][0])[:10]:
        print(f"  {dur / n_steps:6.2f} ms/step  {n}")
        print(f"      {str(ln)[:220]}")


def build_moco(B):
    import jax.numpy as jnp
    import numpy as np

    from ssl4gie_tpu.data.ssl_augment import moco_two_crops
    from ssl4gie_tpu.ssl.lars import lars
    from ssl4gie_tpu.ssl.moco_v3 import (MoCoEncoder, MoCoPredictor, MoCoState,
                                         make_moco_train_step)

    encoder = MoCoEncoder(arch="vit_b", dim=256, mlp_dim=4096,
                          dtype=jnp.bfloat16)
    predictor = MoCoPredictor(dim=256, mlp_dim=4096, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, 224, 224, 3), jnp.float32)
    enc_vars = jax.jit(lambda r, x: encoder.init(r, x, train=False))(rng, sample)
    pred_vars = jax.jit(lambda r, x: predictor.init(r, x, train=False))(
        rng, jnp.zeros((2, 256), jnp.float32))
    params = {"encoder": enc_vars["params"], "predictor": pred_vars["params"]}
    stats = {"encoder": enc_vars.get("batch_stats", {}),
             "predictor": pred_vars.get("batch_stats", {})}
    tx = lars(1e-3, weight_decay=1e-6)
    state = MoCoState(step=jnp.zeros((), jnp.int32), params=params,
                      momentum_params=jax.tree_util.tree_map(
                          jnp.copy, params["encoder"]),
                      batch_stats=stats,
                      momentum_batch_stats=jax.tree_util.tree_map(
                          jnp.copy, stats["encoder"]),
                      opt_state=tx.init(params), tx=tx)
    moco_step = make_moco_train_step(encoder, predictor, 1.0)
    img_u8 = jax.device_put(np.random.default_rng(0).integers(
        0, 256, (B, 256, 256, 3), dtype=np.uint8))

    @jax.jit
    def run(state, img_u8, key):
        def body(st, k):
            v1, v2 = moco_two_crops(k, img_u8, out_size=224)
            st, metrics = moco_step(st, v1, v2, jnp.float32(0.99))
            return st, metrics["loss"]
        return jax.lax.scan(body, state, jax.random.split(key, 10))

    return lambda key: run(state, img_u8, key)


def build_cls(B):
    sys.path.insert(0, "/root/repo/benchmarks")
    from bench_batch_sweep import build

    compiled, state, img_u8, labels = build(B)
    return lambda key: compiled(state, img_u8, labels, key)


def main():
    argv = [a for a in sys.argv[1:] if a != "--parse-only"]
    target = argv[0] if argv and argv[0] in ("cls", "moco") else "cls"
    rest = argv[1:] if argv and argv[0] in ("cls", "moco") else argv
    B = int(rest[0]) if rest else (192 if target == "cls" else 128)
    outdir = rest[1] if len(rest) > 1 else f"/tmp/profile_{target}"
    n_steps = N_STEPS_BY_TARGET[target]

    if "--parse-only" not in sys.argv:
        run = (build_cls if target == "cls" else build_moco)(B)
        key = jax.random.PRNGKey(1)
        _, losses = run(key)  # warmup
        float(losses[-1])
        jax.profiler.start_trace(outdir)
        _, losses = run(key)
        float(losses[-1])
        jax.profiler.stop_trace()

    parse_trace(outdir, n_steps, label=f"[{target} B={B}] ")


if __name__ == "__main__":
    main()
