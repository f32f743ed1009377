"""VMEM-resident fused MLP kernel vs XLA (the round-2 verdict's open TODO).

Real dense-task shapes: M = 128*197 tokens, C=768, hidden 3072, bf16 compute,
f32 master weights. Measures value_and_grad over a 12-layer chain (mimics the
per-block invocation pattern of a ViT-B train step), scanned-in-jit like
bench.py so relay dispatch latency cancels out.

Usage: python benchmarks/bench_mlp_kernel.py [xla|fused|both]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import flax.linen as nn

from ssl4gie_tpu.kernels.fused_mlp import fused_mlp

import os
M = int(os.environ.get("MLP_BENCH_M", 128 * 197))
C, H, L = 768, 3072, 12
DT = jnp.bfloat16

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(0, 1, (M, C)).astype(np.float32), DT)
params = [{
    "w1": jnp.asarray(rng.normal(0, 0.02, (C, H)).astype(np.float32)),
    "b1": jnp.zeros((H,), jnp.float32),
    "w2": jnp.asarray(rng.normal(0, 0.02, (H, C)).astype(np.float32)),
    "b2": jnp.zeros((C,), jnp.float32),
} for _ in range(L)]


def xla_layer(x, p):
    h = x @ p["w1"].astype(DT) + p["b1"].astype(DT)
    return nn.gelu(h, approximate=True) @ p["w2"].astype(DT) + p["b2"].astype(DT)


def fused_layer(x, p):
    return fused_mlp(x, p["w1"].astype(DT), p["b1"].astype(DT),
                     p["w2"].astype(DT), p["b2"].astype(DT), True)


def bench(layer, name, n_steps=10):
    def loss(ps, x):
        for p in ps:
            x = x + layer(x, p)          # residual keeps magnitudes sane
        return jnp.sum(x.astype(jnp.float32) ** 2) * 1e-9

    grad_fn = jax.value_and_grad(loss)

    @jax.jit
    def run(ps, x):
        def body(carry, _):
            ps, x = carry
            v, g = grad_fn(ps, x)
            # feed a grad-derived perturbation back in so scan can't hoist
            ps = jax.tree_util.tree_map(lambda p, d: p - 1e-6 * d, ps, g)
            return (ps, x), v
        (ps, _), vs = jax.lax.scan(body, (ps, x), None, length=n_steps)
        return vs

    vs = run(params, x0)
    float(vs[-1])                         # compile + settle
    t0 = time.perf_counter()
    vs = run(params, x0)
    float(vs[-1])
    dt = (time.perf_counter() - t0) / n_steps * 1000
    flops = 6 * M * C * H * L * 2        # 2 fwd + 4 bwd matmuls per layer
    print(f"{name}: {dt:.2f} ms/step ({L} layers fwd+bwd) "
          f"-> {flops / (dt / 1e3) / 1e12:.1f} TFLOP/s effective")
    return dt


which = sys.argv[1] if len(sys.argv) > 1 else "both"
if which in ("xla", "both"):
    bench(xla_layer, "XLA two-matmul MLP")
if which in ("fused", "both"):
    bench(fused_layer, "Pallas fused MLP ")
