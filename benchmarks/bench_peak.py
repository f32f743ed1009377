"""Empirical MXU peak measurement (round-5 MFU-accounting audit).

The round-4 PARITY file normalized per-slice "x% of peak" claims to an
inconsistent peak (~99-110 TFLOP/s in the profile section vs the 197 TFLOP/s
nominal used for the roofline, vs 177.1 TFLOP/s achieved by XLA in the
round-3 MLP A/B). This script settles the question by measuring achieved
TFLOP/s on dependency-chained pure-GEMM loops at several shapes:

  square    : N x N @ N x N (classic peak probe), N in {4096, 8192}
  mlp       : the ViT-B fc1/fc2 shapes at the headline batch
              (M=192*197 tokens, 768->3072->768)
  dW        : gradient-shaped K-large GEMMs ((768,M)@(M,3072) alternated
              with (M,768)@(768,3072) to keep a dependency chain)
  attention : per-head batched small matmuls (B*H=2304 of 197x64 @ 64x197)
              - the shape class the Pallas attention kernels compete with

All bf16 inputs, f32 accumulation (preferred_element_type), scanned inside
one jit so the axon relay's dispatch latency cancels; timed by fetching a
scalar value after the dependency chain (block_until_ready is not a reliable
barrier through this relay). Nominal v5e bf16 peak: 197 TFLOP/s.

MEASURED (round 5). Wall-clock through the relay, then device-event truth
from `profile_peak.py` (wall includes ~27 ms relay dispatch per call, so
short programs read low — trust device events):

    square 8192^3  : 8.26 ms wall -> 6.47 ms GEMM device  = 170 TFLOP/s
    mlp M=37824    : 3.24 ms wall -> 1.86 ms device       = 191.4 TFLOP/s (97%)
    dw             : 3.33 ms wall -> 2.04 ms device       = 175 TFLOP/s
                     (the K-large dW GEMM itself 164 = 83% of nominal)
    attn 197x64    : 1.88 ms wall (12.2 TFLOP/s — shape-starved XLA batched
                     matmul; the production Pallas kernels reach 61 in-model)

Conclusion recorded in docs/PARITY.md: empirical peak ~= nominal (97% on
the model's own MLP shapes); all "% of 197" claims are correctly normalized.

Usage: python benchmarks/bench_peak.py [square|mlp|dw|attn|all]
"""
import sys
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np

DT = jnp.bfloat16
STEPS = 20


def _timed(run, args, flops_per_step, name, reps=3):
    vs = run(*args)
    float(vs[-1])  # compile + settle
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        vs = run(*args)
        float(vs[-1])
        best = min(best, (time.perf_counter() - t0) / STEPS)
    tflops = flops_per_step / best / 1e12
    print(f"{name:55s} {best * 1e3:8.2f} ms/step  {tflops:7.1f} TFLOP/s")
    return tflops


def bench_square(n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (n, n)).astype(np.float32), DT)
    w = jnp.asarray(rng.normal(0, 1 / np.sqrt(n), (n, n)).astype(np.float32), DT)

    @jax.jit
    def run(x, w):
        def body(x, _):
            y = jax.lax.dot(x, w, preferred_element_type=jnp.float32)
            # renormalize cheaply so the chain can't overflow; cast back to bf16
            return (y * (1.0 / np.sqrt(n))).astype(DT), jnp.sum(y[0, :8])
        _, vs = jax.lax.scan(body, x, None, length=STEPS)
        return vs

    return _timed(run, (x, w), 2 * n**3, f"square {n}x{n}x{n} bf16")


def bench_mlp():
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

    flops = 2 * M * C * H * 2  # two GEMMs per step
    return _timed(run, (x, w1, w2), flops, f"mlp fc1+fc2 M={M} 768->3072->768 bf16")


def bench_dw():
    M, C, H = 192 * 197, 768, 3072
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1 / np.sqrt(M), (M, C)).astype(np.float32), DT)
    g = jnp.asarray(rng.normal(0, 1, (M, H)).astype(np.float32), DT)

    @jax.jit
    def run(x, g):
        def body(g, _):
            # dW = x^T @ g : (C,M)@(M,H) — the K-large gradient GEMM shape
            dw = jax.lax.dot_general(
                x, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ).astype(DT)
            # chain: g' = x @ dW : (M,C)@(C,H)
            g2 = jax.lax.dot(x, dw, preferred_element_type=jnp.float32)
            return (g2 * (1.0 / np.sqrt(C))).astype(DT), jnp.sum(g2[0, :8])
        _, vs = jax.lax.scan(body, g, None, length=STEPS)
        return vs

    flops = 2 * M * C * H * 2
    return _timed(run, (x, g), flops, f"dW-shaped (768,{M})@({M},3072) bf16")


def bench_attn():
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
            ).astype(DT)  # (G,N,N)
            o = jax.lax.dot_general(
                s, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )  # (G,N,D)
            return (o * (1.0 / np.sqrt(N))).astype(DT), jnp.sum(o[0, 0, :8])
        _, vs = jax.lax.scan(body, q, None, length=STEPS)
        return vs

    flops = 2 * G * N * N * D * 2
    return _timed(run, (q, k), flops, f"attn-shaped {G}x({N}x{D}@{D}x{N}) bf16")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}")
    results = {}
    if which in ("square", "all"):
        results["square4096"] = bench_square(4096)
        results["square8192"] = bench_square(8192)
    if which in ("mlp", "all"):
        results["mlp"] = bench_mlp()
    if which in ("dw", "all"):
        results["dw"] = bench_dw()
    if which in ("attn", "all"):
        results["attn"] = bench_attn()
    if results:
        peak = max(results.values())
        print(f"\nempirical peak: {peak:.1f} TFLOP/s "
              f"({peak / 197 * 100:.0f}% of v5e nominal 197)")


if __name__ == "__main__":
    main()
