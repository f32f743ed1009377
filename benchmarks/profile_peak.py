"""Profile the pure-GEMM peak probe to get device-event truth.

bench_peak.py timed the whole scan step (GEMM + renormalize epilogue) by
wall clock through the relay. This script traces one run of the 8192-square
and the mlp-shaped chains and reports per-op device durations from the
trace, so the GEMM-only achieved TFLOP/s is known without guessing whether
XLA fused the epilogue.

Usage: python benchmarks/profile_peak.py [square|mlp]
"""
import glob
import gzip
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

DT = jnp.bfloat16
STEPS = 20


def trace_events(trace_dir):
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    evs = data["traceEvents"]
    # find device pids (TensorFlow Op style: process with 'TPU' / device in name)
    pid_names = {e["pid"]: e["args"].get("name", "") for e in evs
                 if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e}
    dev_pids = {p for p, n in pid_names.items()
                if ("TPU" in n or "/device" in n.lower()) and "Steps" not in n}
    out = {}
    for e in evs:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            name = e.get("name", "")
            out.setdefault(name, [0.0, 0]).__setitem__(0, out.get(name, [0.0, 0])[0] + e["dur"])
            out[name][1] += 1
    return pid_names, out


def run_square(n=8192):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (n, n)).astype(np.float32), DT)
    w = jnp.asarray(
        rng.normal(0, 1 / np.sqrt(n), (n, n)).astype(np.float32), DT)

    @jax.jit
    def run(x, w):
        def body(x, _):
            y = jax.lax.dot(x, w, preferred_element_type=jnp.float32)
            return (y * (1.0 / np.sqrt(n))).astype(DT), jnp.sum(y[0, :8])
        _, vs = jax.lax.scan(body, x, None, length=STEPS)
        return vs

    float(run(x, w)[-1])
    return lambda: float(run(x, w)[-1]), 2 * n ** 3


def run_mlp():
    M, C, H = 192 * 197, 768, 3072
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (M, C)).astype(np.float32), DT)
    w1 = jnp.asarray(rng.normal(0, 1 / np.sqrt(C), (C, H)).astype(np.float32), DT)
    w2 = jnp.asarray(rng.normal(0, 1 / np.sqrt(H), (H, C)).astype(np.float32), DT)

    @jax.jit
    def run(x, w1, w2):
        def body(x, _):
            h = jax.lax.dot(x, w1, preferred_element_type=jnp.float32).astype(DT)
            y = jax.lax.dot(h, w2, preferred_element_type=jnp.float32)
            return (y * (1.0 / np.sqrt(C))).astype(DT), jnp.sum(y[0, :8])
        _, vs = jax.lax.scan(body, x, None, length=STEPS)
        return vs

    float(run(x, w1, w2)[-1])
    return lambda: float(run(x, w1, w2)[-1]), 2 * M * C * H * 2


def run_dw():
    M, C, H = 192 * 197, 768, 3072
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1 / np.sqrt(M), (M, C)).astype(np.float32), DT)
    g = jnp.asarray(rng.normal(0, 1, (M, H)).astype(np.float32), DT)

    @jax.jit
    def run(x, g):
        def body(g, _):
            dw = jax.lax.dot_general(
                x, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ).astype(DT)
            g2 = jax.lax.dot(x, dw, preferred_element_type=jnp.float32)
            return (g2 * (1.0 / np.sqrt(C))).astype(DT), jnp.sum(g2[0, :8])
        _, vs = jax.lax.scan(body, g, None, length=STEPS)
        return vs

    float(run(x, g)[-1])
    return lambda: float(run(x, g)[-1]), 2 * M * C * H * 2


def run_attn():
    B, Hh, N, D = 192, 12, 197, 64
    G = B * Hh
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (G, N, D)).astype(np.float32), DT)
    k = jnp.asarray(rng.normal(0, 1 / np.sqrt(D), (G, N, D)).astype(np.float32), DT)

    @jax.jit
    def run(q, k):
        def body(q, _):
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            ).astype(DT)
            o = jax.lax.dot_general(
                s, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
            return (o * (1.0 / np.sqrt(N))).astype(DT), jnp.sum(o[0, 0, :8])
        _, vs = jax.lax.scan(body, q, None, length=STEPS)
        return vs

    float(run(q, k)[-1])
    return lambda: float(run(q, k)[-1]), 2 * G * N * N * D * 2


RUNNERS = {"square": run_square, "mlp": run_mlp, "dw": run_dw, "attn": run_attn}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "square"
    fn, flops_per_step = RUNNERS[which]()
    trace_dir = f"/tmp/peak_trace_{which}"
    with jax.profiler.trace(trace_dir):
        fn()
    pid_names, ops = trace_events(trace_dir)
    total_us = sum(v[0] for v in ops.values())
    print(f"device pids: { {p: n for p, n in pid_names.items()} }")
    print(f"{'op':70s} {'total_ms':>9s} {'count':>6s}")
    for name, (dur, cnt) in sorted(ops.items(), key=lambda kv: -kv[1][0])[:15]:
        print(f"{name[:70]:70s} {dur / 1e3:9.3f} {cnt:6d}")
    print(f"\ntotal device time: {total_us / 1e3:.2f} ms for {STEPS} steps"
          f" -> {total_us / 1e3 / STEPS:.3f} ms/step")
    print(f"achieved (total):  {flops_per_step * STEPS / (total_us * 1e-6) / 1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
