"""Isolated windowed-attention benchmark: production kernel vs v2 variant.

Real ViT-Det 1024px shapes: B=2 images, 64x64 token grid, 16x16 windows
(N=256 tokens/window), H=12 heads, Dh=64, bf16, packed (B, GH, GW, 3C) qkv.
Measures value_and_grad over an 8-layer windowed-attention chain (the ViT-Det
step runs 8 windowed blocks), scanned-in-jit like bench.py so relay dispatch
pipelines away.

v2 applies the dense-kernel (bench_attention_kernel.py) findings to the
window kernel (`kernels/window_attention.py`):
  - scale folded into q (elementwise on (N, Dh) instead of (N, N));
  - softmax division applied to the (N, Dh) output, not the (N, N) matrix;
  - backward x^T@y matmuls as dim-0-contraction dot_general (no materialized
    (N, N) / (N, Dh) transposes in VMEM);
  - optional G windows fused per program (launch-overhead amortization).

No masking is needed at all here: windows are exactly 256 = the block size.

Usage: python benchmarks/bench_window_kernel.py [current|v2|v2g2|all]
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssl4gie_tpu.core.xla_options import jit_kwargs
from ssl4gie_tpu.kernels.window_attention import windowed_flash_attention

B = int(os.environ.get("WATTN_BENCH_B", 2))
L = int(os.environ.get("WATTN_BENCH_L", 8))
STEPS = int(os.environ.get("WATTN_BENCH_STEPS", 10))
GH = GW = 64
WS = 16
N = WS * WS
H, Dh = 12, 64
C = H * Dh
SCALE = Dh ** -0.5
DT = jnp.bfloat16

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(0, 1, (B, GH, GW, 3 * C)).astype(np.float32), DT)


def current_layer(qkv):
    return windowed_flash_attention(qkv, H, WS, SCALE)


# ---------------------------------------------------------------------------
# v2 kernels
# ---------------------------------------------------------------------------

def _fwd_kernel_v2(qkv_ref, o_ref, *, num_heads, scale, G):
    ws = qkv_ref.shape[1]
    C3 = qkv_ref.shape[3]
    C = C3 // 3
    Dh = C // num_heads
    N = ws * ws
    dt = qkv_ref.dtype
    for g in range(G):
        for h in range(num_heads):
            qh = qkv_ref[0, :, g * ws:(g + 1) * ws,
                         h * Dh:(h + 1) * Dh].reshape(N, Dh)
            kh = qkv_ref[0, :, g * ws:(g + 1) * ws,
                         C + h * Dh:C + (h + 1) * Dh].reshape(N, Dh)
            vh = qkv_ref[0, :, g * ws:(g + 1) * ws,
                         2 * C + h * Dh:2 * C + (h + 1) * Dh].reshape(N, Dh)
            qs = qh * jnp.asarray(scale, dt)
            s = jnp.dot(qs, kh.T, preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            l = jnp.sum(e, axis=-1, keepdims=True)
            oh = jnp.dot(e.astype(dt), vh,
                         preferred_element_type=jnp.float32) / l
            o_ref[0, :, g * ws:(g + 1) * ws, h * Dh:(h + 1) * Dh] = \
                oh.reshape(ws, ws, Dh).astype(o_ref.dtype)


def _bwd_kernel_v2(qkv_ref, g_ref, dqkv_ref, *, num_heads, scale, G):
    ws = qkv_ref.shape[1]
    C3 = qkv_ref.shape[3]
    C = C3 // 3
    Dh = C // num_heads
    N = ws * ws
    dt = qkv_ref.dtype
    dgT = lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    for g in range(G):
        for h in range(num_heads):
            qh = qkv_ref[0, :, g * ws:(g + 1) * ws,
                         h * Dh:(h + 1) * Dh].reshape(N, Dh)
            kh = qkv_ref[0, :, g * ws:(g + 1) * ws,
                         C + h * Dh:C + (h + 1) * Dh].reshape(N, Dh)
            vh = qkv_ref[0, :, g * ws:(g + 1) * ws,
                         2 * C + h * Dh:2 * C + (h + 1) * Dh].reshape(N, Dh)
            gh = g_ref[0, :, g * ws:(g + 1) * ws,
                       h * Dh:(h + 1) * Dh].reshape(N, Dh)
            qs = qh * jnp.asarray(scale, dt)
            s = jnp.dot(qs, kh.T, preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            pb = p.astype(dt)
            dp = jnp.dot(gh, vh.T, preferred_element_type=jnp.float32)
            delta = jnp.sum(p * dp, axis=-1, keepdims=True)
            ds = (p * (dp - delta)).astype(dt)
            dq = jnp.dot(ds, kh, preferred_element_type=jnp.float32) * scale
            dqkv_ref[0, :, g * ws:(g + 1) * ws, h * Dh:(h + 1) * Dh] = \
                dq.reshape(ws, ws, Dh).astype(dt)
            dqkv_ref[0, :, g * ws:(g + 1) * ws,
                     C + h * Dh:C + (h + 1) * Dh] = \
                dgT(ds, qs).reshape(ws, ws, Dh).astype(dt)
            dqkv_ref[0, :, g * ws:(g + 1) * ws,
                     2 * C + h * Dh:2 * C + (h + 1) * Dh] = \
                dgT(pb, gh).reshape(ws, ws, Dh).astype(dt)


def _mk_v2(G=1):
    """G horizontally-adjacent windows per program (GW/ws must divide by G)."""

    def fwd(qkv):
        Bq, GHq, GWq, C3 = qkv.shape
        C = C3 // 3
        return pl.pallas_call(
            functools.partial(_fwd_kernel_v2, num_heads=H, scale=SCALE, G=G),
            grid=(Bq, GHq // WS, GWq // (WS * G)),
            in_specs=[pl.BlockSpec((1, WS, WS * G, C3),
                                   lambda b, i, j: (b, i, j, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, WS, WS * G, C),
                                   lambda b, i, j: (b, i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bq, GHq, GWq, C), qkv.dtype),
        )(qkv)

    @jax.custom_vjp
    def attn(qkv):
        return fwd(qkv)

    def fwd_vjp(qkv):
        return fwd(qkv), qkv

    def bwd_vjp(qkv, g):
        Bq, GHq, GWq, C3 = qkv.shape
        C = C3 // 3
        dqkv = pl.pallas_call(
            functools.partial(_bwd_kernel_v2, num_heads=H, scale=SCALE, G=G),
            grid=(Bq, GHq // WS, GWq // (WS * G)),
            in_specs=[pl.BlockSpec((1, WS, WS * G, C3),
                                   lambda b, i, j: (b, i, j, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, WS, WS * G, C),
                                   lambda b, i, j: (b, i, j, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, WS, WS * G, C3),
                                   lambda b, i, j: (b, i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bq, GHq, GWq, C3), qkv.dtype),
        )(qkv, g)
        return (dqkv,)

    attn.defvjp(fwd_vjp, bwd_vjp)
    return attn


def bench(layer, name, n_steps=STEPS):
    def loss(x):
        def lyr(x, _):
            o = layer(x) * 0.1
            return x + jnp.concatenate([o, o, o], axis=-1), None
        x, _ = jax.lax.scan(lyr, x, None, length=L)
        return jnp.sum(x.astype(jnp.float32) ** 2) * 1e-9

    grad_fn = jax.value_and_grad(loss)

    @functools.partial(jax.jit, **jit_kwargs("detection"))
    def run(x):
        def body(x, _):
            v, g = grad_fn(x)
            upd = ((1e-6 * v) * g.astype(jnp.float32)).astype(x.dtype)
            return x - upd, v
        _, vs = jax.lax.scan(body, x, None, length=n_steps)
        return vs

    print(f"{name}: compiling...", flush=True)
    tc = time.perf_counter()
    vs = run(x0)
    float(vs[-1])
    print(f"  compiled+1st run in {time.perf_counter() - tc:.0f} s", flush=True)
    t0 = time.perf_counter()
    vs = run(x0)
    float(vs[-1])
    dt = (time.perf_counter() - t0) / n_steps * 1000
    nwin = B * (GH // WS) * (GW // WS)
    attn = 7 * 2 * N * N * Dh * H * nwin * L
    print(f"{name}: {dt:.2f} ms/step ({L} windowed layers fwd+bwd, B={B}) "
          f"-> {attn / (dt / 1e3) / 1e12:.2f} TFLOP/s effective")
    return dt


def check(attn):
    small = x0[:1]
    f0 = current_layer(small)
    f2 = attn(small)
    err_f = float(jnp.max(jnp.abs(f0.astype(jnp.float32) -
                                  f2.astype(jnp.float32))))
    g = jnp.ones_like(f0)
    g0 = jax.vjp(current_layer, small)[1](g)[0]
    g2 = jax.vjp(attn, small)[1](g)[0]
    err_g = float(jnp.max(jnp.abs(g0.astype(jnp.float32) -
                                  g2.astype(jnp.float32))))
    print(f"v2 parity vs current: fwd max|d|={err_f:.3e} "
          f"bwd max|d|={err_g:.3e}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("current", "all"):
        bench(current_layer, "current window kernel")
    if which in ("v2", "all"):
        check(_mk_v2(1))
        bench(_mk_v2(1), "v2 scale-fold G1     ")
    if which in ("v2g2", "all"):
        bench(_mk_v2(2), "v2 scale-fold G2     ")
    if which == "v2g4":
        bench(_mk_v2(4), "v2 scale-fold G4     ")
