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
        s = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        oh = jnp.dot(p, vh, preferred_element_type=jnp.float32)
        o_ref[0, :, :, h * Dh:(h + 1) * Dh] = oh.reshape(ws, ws, Dh).astype(o_ref.dtype)


def _bwd_kernel(qkv_ref, g_ref, dqkv_ref, *, num_heads, scale):
    ws = qkv_ref.shape[1]
    C3 = qkv_ref.shape[3]
    C = C3 // 3
    Dh = C // num_heads
    N = ws * ws
    dt = qkv_ref.dtype
    for h in range(num_heads):
        qh = qkv_ref[0, :, :, h * Dh:(h + 1) * Dh].reshape(N, Dh)
        kh = qkv_ref[0, :, :, C + h * Dh:C + (h + 1) * Dh].reshape(N, Dh)
        vh = qkv_ref[0, :, :, 2 * C + h * Dh:2 * C + (h + 1) * Dh].reshape(N, Dh)
        gh = g_ref[0, :, :, h * Dh:(h + 1) * Dh].reshape(N, Dh)
        s = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        pb = p.astype(dt)
        dv = jnp.dot(pb.T, gh, preferred_element_type=jnp.float32)
        dp = jnp.dot(gh, vh.T, preferred_element_type=jnp.float32)
        ds = (p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))).astype(dt)
        dq = jnp.dot(ds, kh, preferred_element_type=jnp.float32) * scale
        dk = jnp.dot(ds.T, qh, preferred_element_type=jnp.float32) * scale
        dqkv_ref[0, :, :, h * Dh:(h + 1) * Dh] = \
            dq.reshape(ws, ws, Dh).astype(dqkv_ref.dtype)
        dqkv_ref[0, :, :, C + h * Dh:C + (h + 1) * Dh] = \
            dk.reshape(ws, ws, Dh).astype(dqkv_ref.dtype)
        dqkv_ref[0, :, :, 2 * C + h * Dh:2 * C + (h + 1) * Dh] = \
            dv.reshape(ws, ws, Dh).astype(dqkv_ref.dtype)


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
