"""Fused windowed attention as a Pallas TPU kernel.

The ViTDet windowed blocks (`Models/models.py:155-210`; our reshape-based
equivalent in models/layers.Attention) move the full (B, 4096, 3C) qkv tensor
through two transposes per block to group 16x16 windows — ~19 ms/step of pure
layout copies in the 1024px detection profile. This kernel keeps the feature map
in its natural (B, GH, GW, 3C) grid layout and lets the Pallas BlockSpec carve out
each window directly: grid = (B, GH/ws, GW/ws), one window per program, attention
computed head-by-head in VMEM, output written back in grid layout. No transposes
touch HBM.

Forward-only kernel with custom VJP: the backward recomputes attention per window
(flash-style, cheap at 256 tokens) using the same window-blocked layout.

Round-4 tuning (benchmarks/bench_window_kernel.py, v5e, B=2 x 8 windowed
layers: 10.21 -> 9.51 ms/step, +7%):
  - scale folded into q: one (N, Dh) elementwise multiply replaces the
    (N, N) post-matmul scaling, and the backward reuses the scaled q for dk;
  - softmax kept unnormalized through the p@v matmul; the division lands on
    the (N, Dh) output instead of the (N, N) matrix (4x fewer VPU ops);
  - backward x^T@y products as dimension-0-contraction dot_general — no
    materialized (N, N)/(N, Dh) transposes in VMEM.
G>1 windows per program measured SLOWER (launch overhead already amortized at
G=1 with 2,048 programs; bigger blocks only raised VMEM pressure).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(qkv_ref, o_ref, *, num_heads, scale):
    ws = qkv_ref.shape[1]
    C3 = qkv_ref.shape[3]
    C = C3 // 3
    Dh = C // num_heads
    N = ws * ws
    # per-head lazy slicing keeps VMEM pressure at O(N*Dh) instead of O(N*3C);
    # matmuls run in the input dtype (bf16) with f32 accumulation — upcasting
    # operands first would force 4-8x slower f32 MXU passes
    dt = qkv_ref.dtype
    for h in range(num_heads):
        qh = qkv_ref[0, :, :, h * Dh:(h + 1) * Dh].reshape(N, Dh)
        kh = qkv_ref[0, :, :, C + h * Dh:C + (h + 1) * Dh].reshape(N, Dh)
        vh = qkv_ref[0, :, :, 2 * C + h * Dh:2 * C + (h + 1) * Dh].reshape(N, Dh)
        qs = qh * jnp.asarray(scale, dt)
        s = jnp.dot(qs, kh.T, preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        oh = jnp.dot(e.astype(dt), vh, preferred_element_type=jnp.float32) / l
        o_ref[0, :, :, h * Dh:(h + 1) * Dh] = oh.reshape(ws, ws, Dh).astype(o_ref.dtype)


def _bwd_kernel(qkv_ref, g_ref, dqkv_ref, *, num_heads, scale):
    ws = qkv_ref.shape[1]
    C3 = qkv_ref.shape[3]
    C = C3 // 3
    Dh = C // num_heads
    N = ws * ws
    dt = qkv_ref.dtype
    # x^T @ y as a dimension-0 contraction: Mosaic feeds the MXU directly
    # instead of materializing the transposed operand in VMEM first
    dgT = lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    for h in range(num_heads):
        qh = qkv_ref[0, :, :, h * Dh:(h + 1) * Dh].reshape(N, Dh)
        kh = qkv_ref[0, :, :, C + h * Dh:C + (h + 1) * Dh].reshape(N, Dh)
        vh = qkv_ref[0, :, :, 2 * C + h * Dh:2 * C + (h + 1) * Dh].reshape(N, Dh)
        gh = g_ref[0, :, :, h * Dh:(h + 1) * Dh].reshape(N, Dh)
        qs = qh * jnp.asarray(scale, dt)
        s = jnp.dot(qs, kh.T, preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        pb = p.astype(dt)
        dp = jnp.dot(gh, vh.T, preferred_element_type=jnp.float32)
        ds = (p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))).astype(dt)
        dq = jnp.dot(ds, kh, preferred_element_type=jnp.float32) * scale
        dqkv_ref[0, :, :, h * Dh:(h + 1) * Dh] = \
            dq.reshape(ws, ws, Dh).astype(dqkv_ref.dtype)
        dqkv_ref[0, :, :, C + h * Dh:C + (h + 1) * Dh] = \
            dgT(ds, qs).reshape(ws, ws, Dh).astype(dqkv_ref.dtype)
        dqkv_ref[0, :, :, 2 * C + h * Dh:2 * C + (h + 1) * Dh] = \
            dgT(pb, gh).reshape(ws, ws, Dh).astype(dqkv_ref.dtype)


def _call_fwd(qkv, num_heads, window, scale):
    B, GH, GW, C3 = qkv.shape
    C = C3 // 3
    grid = (B, GH // window, GW // window)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads, scale=scale),
        grid=grid,
        in_specs=[pl.BlockSpec((1, window, window, C3),
                               lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, window, window, C),
                               lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, GH, GW, C), qkv.dtype),
    )(qkv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def windowed_flash_attention(qkv, num_heads: int, window: int, scale: float):
    """qkv: (B, GH, GW, 3C) grid layout -> (B, GH, GW, C)."""
    return _call_fwd(qkv, num_heads, window, scale)


def _wfa_fwd(qkv, num_heads, window, scale):
    return _call_fwd(qkv, num_heads, window, scale), qkv


def _wfa_bwd(num_heads, window, scale, qkv, g):
    B, GH, GW, C3 = qkv.shape
    grid = (B, GH // window, GW // window)
    C = C3 // 3
    dqkv = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads, scale=scale),
        grid=grid,
        in_specs=[pl.BlockSpec((1, window, window, C3),
                               lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, window, window, C),
                               lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, window, window, C3),
                               lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, GH, GW, C3), qkv.dtype),
    )(qkv, g)
    return (dqkv,)


windowed_flash_attention.defvjp(_wfa_fwd, _wfa_bwd)
