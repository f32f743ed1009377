"""Fused transformer-MLP kernels (Pallas TPU): fc1 + bias + GELU + fc2 + bias
in one pass with BOTH weight matrices resident in VMEM.

Motivation (v5e profile, ViT-B 224 train step @ B=128): the MLP matmul
fusions are 61 ms of the 119.5 ms device step at ~71% of MXU peak. XLA runs
fc1 and fc2 as two kernels with the (tokens, 4C) hidden activation making a
full HBM round trip between them (write by fc1, read by fc2 = ~310 MB/layer);
the backward reads it twice more (once for the dGELU chain, once to recompute
gelu(h) for dW2). This kernel family keeps the hidden tile in VMEM:

- forward: one kernel computes y = gelu(x @ W1 + b1) @ W2 + b2 per 128-token
  tile with W1 (C x 4C) and W2 (4C x C) resident (~9 MB bf16 for ViT-B),
  writing the pre-GELU hidden h exactly once (it is the autodiff residual
  either way) — eliminates the fc2 read of h;
- backward `dh`+`g` fusion: one kernel reads h once and emits BOTH
  dh = gelu'(h) * (dy @ W2^T) and g = gelu(h), so the three remaining grads
  (dx, dW1, dW2) are clean full-size GEMMs XLA already runs near peak.

Token tiles are 128 rows because the dense-task token count (B*197) is
divisible by 128 but not 256; weights use a constant index map so Mosaic
fetches them once and streams token tiles past them. All matmuls take bf16
inputs with f32 accumulation.

Why not tile the hidden dim instead? A (token, hidden) grid either refetches
the W tiles per token tile (j fastest: ~1.8 GB/layer of weight traffic) or
needs non-consecutive output-block revisiting (i fastest), which Pallas
forbids. Full-resident weights fit ViT-B (9 MB) and ViT-S (2.4 MB); larger
models would need the j-fastest variant with an f32 HBM accumulator.

Reference math: the timm MLP inside every ViT block (`Models/models.py`
block MLPs); this is a performance re-expression — the parameter tree and
values are unchanged (see models/layers.Mlp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _tile_m(M: int) -> int:
    """Token rows per program: 256 when the token count allows (better MXU
    utilisation, measured 161 vs 159 TFLOP/s isolated), else 128 (dense-task
    B*197 counts are divisible by 128 only)."""
    if M % 256 == 0:
        return 256
    if M % 128 == 0:
        return 128
    raise ValueError(f"fused_mlp needs token count % 128 == 0, got {M}")


def _gelu_f32(h, approximate: bool):
    # matches flax nn.gelu on an f32 input
    if approximate:
        return 0.5 * h * (1.0 + jnp.tanh(0.7978845608028654 *
                                         (h + 0.044715 * h * h * h)))
    return 0.5 * h * (1.0 + jax.lax.erf(h * 0.7071067811865476))


def _dgelu_f32(h, approximate: bool):
    if approximate:
        t = jnp.tanh(0.7978845608028654 * (h + 0.044715 * h * h * h))
        dt = (1.0 - t * t) * 0.7978845608028654 * (1.0 + 3 * 0.044715 * h * h)
        return 0.5 * (1.0 + t) + 0.5 * h * dt
    cdf = 0.5 * (1.0 + jax.lax.erf(h * 0.7071067811865476))
    pdf = jnp.exp(-0.5 * h * h) * 0.3989422804014327   # 1/sqrt(2*pi)
    return cdf + h * pdf


# --------------------------------------------------------------------- fwd

def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref, h_ref,
                *, approximate):
    h = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    h_ref[:] = h.astype(h_ref.dtype)            # pre-GELU residual (one write)
    g = _gelu_f32(h, approximate).astype(x_ref.dtype)
    y = jnp.dot(g, w2_ref[:], preferred_element_type=jnp.float32)
    y_ref[:] = (y + b2_ref[:].astype(jnp.float32)).astype(y_ref.dtype)


def _mlp_fwd(x2, w1, b1, w2, b2, *, approximate):
    M, C = x2.shape
    Hd = w1.shape[1]
    tm = _tile_m(M)
    y, h = pl.pallas_call(
        functools.partial(_fwd_kernel, approximate=approximate),
        grid=(M // tm,),
        in_specs=[
            pl.BlockSpec((tm, C), lambda i: (i, 0)),              # x
            pl.BlockSpec((C, Hd), lambda i: (0, 0)),              # W1 (resident)
            pl.BlockSpec((1, Hd), lambda i: (0, 0)),              # b1
            pl.BlockSpec((Hd, C), lambda i: (0, 0)),              # W2 (resident)
            pl.BlockSpec((1, C), lambda i: (0, 0)),               # b2
        ],
        out_specs=[
            pl.BlockSpec((tm, C), lambda i: (i, 0)),              # y
            pl.BlockSpec((tm, Hd), lambda i: (i, 0)),             # h residual
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, C), x2.dtype),
            jax.ShapeDtypeStruct((M, Hd), x2.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x2, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    return y, h


# --------------------------------------------------------------------- bwd

def _bwd_kernel(h_ref, dy_ref, w2_ref, dh_ref, g_ref, *, approximate):
    h = h_ref[:].astype(jnp.float32)
    g_ref[:] = _gelu_f32(h, approximate).astype(g_ref.dtype)
    # dg = dy @ W2^T: contract over C without materializing the transpose
    dg = jax.lax.dot_general(dy_ref[:], w2_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dh_ref[:] = (dg * _dgelu_f32(h, approximate)).astype(dh_ref.dtype)


def _mlp_bwd_fused(h, dy, w2, *, approximate):
    """One read of h -> (dh, g). dx/dW1/dW2 stay as XLA GEMMs."""
    M, Hd = h.shape
    C = dy.shape[1]
    tm = _tile_m(M)
    dh, g = pl.pallas_call(
        functools.partial(_bwd_kernel, approximate=approximate),
        grid=(M // tm,),
        in_specs=[
            pl.BlockSpec((tm, Hd), lambda i: (i, 0)),             # h
            pl.BlockSpec((tm, C), lambda i: (i, 0)),              # dy
            pl.BlockSpec((Hd, C), lambda i: (0, 0)),              # W2 (resident)
        ],
        out_specs=[
            pl.BlockSpec((tm, Hd), lambda i: (i, 0)),
            pl.BlockSpec((tm, Hd), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, Hd), h.dtype),
            jax.ShapeDtypeStruct((M, Hd), h.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(h, dy, w2)
    return dh, g


# ------------------------------------------------------------ public entry

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_mlp(x, w1, b1, w2, b2, approximate: bool = True):
    """y = gelu(x @ w1 + b1) @ w2 + b2, fused on TPU.

    x: (..., C); w1 (C, H); w2 (H, C). The flattened token count must be a
    multiple of 128 — ViT callers always satisfy this (B * N per-image grids).
    """
    y, _ = _fused_fwd_vjp(x, w1, b1, w2, b2, approximate)
    return y


def _fused_fwd_vjp(x, w1, b1, w2, b2, approximate):
    lead = x.shape[:-1]
    C = x.shape[-1]
    x2 = x.reshape(-1, C)
    y, h = _mlp_fwd(x2, w1, b1, w2, b2, approximate=approximate)
    return y.reshape(*lead, C), (x2, h, w1, w2, lead)


def _fused_bwd_vjp(approximate, res, dy):
    x2, h, w1, w2, lead = res
    C = x2.shape[1]
    dy2 = dy.reshape(-1, C)
    dh, g = _mlp_bwd_fused(h, dy2, w2, approximate=approximate)
    # clean GEMMs — XLA runs these near peak (bf16 in, f32 accum)
    db2 = jnp.sum(dy2.astype(jnp.float32), axis=0).astype(w2.dtype)
    dw2 = jax.lax.dot_general(g, dy2, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32).astype(w2.dtype)
    db1 = jnp.sum(dh.astype(jnp.float32), axis=0).astype(w1.dtype)
    dw1 = jax.lax.dot_general(x2, dh, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32).astype(w1.dtype)
    dx = jnp.dot(dh, w1.T).reshape(*lead, C)
    return dx, dw1, db1, dw2, db2


fused_mlp.defvjp(_fused_fwd_vjp, _fused_bwd_vjp)
