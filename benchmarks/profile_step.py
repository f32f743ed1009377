"""Device-profile the headline classification train step and print the fusion
breakdown (VERDICT r3 #2: profile the post-kernel-port step).

    python benchmarks/profile_step.py [B] [outdir]

Traces one scanned 20-step program, then parses the trace.json.gz directly
(CLAUDE.md: read device-pid events; wall timings of individual jit calls are
unreliable through the relay) and prints the top event groups by device time.
"""

import collections
import glob
import gzip
import json
import sys

import jax


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/profile_step"

    sys.path.insert(0, "/root/repo/benchmarks")
    from bench_batch_sweep import build

    compiled, state, img_u8, labels = build(B)
    key = jax.random.PRNGKey(1)
    _, losses = compiled(state, img_u8, labels, key)  # warmup
    float(losses[-1])

    jax.profiler.start_trace(outdir)
    _, losses = compiled(state, img_u8, labels, key)
    float(losses[-1])
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("no trace written", file=sys.stderr)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    events = trace["traceEvents"]
    # device pid: the process whose thread names mention TensorCore / device
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n or "Device" in n}

    groups = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        args = e.get("args", {}) or {}
        long_name = args.get("long_name", name)
        dur = e.get("dur", 0) / 1e3  # us -> ms
        total += dur
        ln = (long_name + " " + name).lower()
        if "fused_mlp" in ln or ("fusion" in ln and ("gelu" in ln or "dot" in ln)):
            key_ = "mlp/matmul fusions"
        elif "dense_attention" in ln or "window_attention" in ln or \
                "flash" in ln or "custom-call" in ln or "mosaic" in ln:
            key_ = "attention kernels (pallas)"
        elif "dot" in ln or "conv" in ln:
            key_ = "other matmul/conv"
        elif "all-reduce" in ln or "all-gather" in ln or "collective" in ln:
            key_ = "collectives"
        elif "copy" in ln or "transpose" in ln or "pad" in ln or "slice" in ln:
            key_ = "copy/transpose/pad/slice"
        else:
            key_ = "elementwise/other"
        groups[key_] += dur

    n_steps = 20
    print(f"total device time: {total:.1f} ms over {n_steps} steps "
          f"({total / n_steps:.1f} ms/step, B={B})")
    for k, v in groups.most_common():
        print(f"  {k:>28}: {v:8.1f} ms  ({v / n_steps:6.2f} ms/step, "
              f"{100 * v / total:4.1f}%)")

    # top individual ops for the curious
    ops = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            ops[e.get("name", "?")] += e.get("dur", 0) / 1e3
    print("\ntop 15 ops:")
    for k, v in ops.most_common(15):
        print(f"  {v:8.1f} ms  {k[:100]}")


if __name__ == "__main__":
    main()
