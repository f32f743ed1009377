"""Blockwise (flash-style) attention as Pallas TPU kernels, with custom VJP.

Purpose (SURVEY §2.8/§5.7): the reference's attention is a plain quadratic
softmax(QK^T)V (`Models/models.py:202-206`); at detection's 4,096 tokens the full
(N, N) score matrix would round-trip HBM. These kernels keep Q-block x full-K
score tiles in VMEM: per (batch*head, q-block) program, K/V for the head (<= 4k x
64 = 1 MB fp32) are resident in VMEM, scores never touch HBM, and the backward
recomputes probabilities from the saved logsumexp (standard flash backward).

Layout: q, k, v are (BH, N, D) with BH = batch*heads folded; D padded to 128 lanes
by the caller (ViT-B heads are D=64 — we pad to 128; zero-padding K columns does
not change QK^T, zero V columns produce zero outputs that are sliced away).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q_BLOCK = 256


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)                     # (Bq, D)
    k = k_ref[0].astype(jnp.float32)                     # (N, D)
    v = v_ref[0].astype(jnp.float32)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale   # (Bq, N)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32) / l
    o_ref[0] = o.astype(o_ref.dtype)
    # lse stored broadcast over 8 sublanes to satisfy TPU (8, 128) tiling
    lse = m[:, 0] + jnp.log(l[:, 0])
    lse_ref[0] = jnp.broadcast_to(lse[None, :], (8, lse.shape[0]))


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *,
                   scale):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * scale
    dq_ref[0] = jnp.dot(ds, k, preferred_element_type=jnp.float32
                        ).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)                     # (N, D) full
    k = k_ref[0].astype(jnp.float32)                     # (Bk, D) block
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (N, Bk)
    p = jnp.exp(s - lse)
    dv_ref[0] = jnp.dot(p.T, do, preferred_element_type=jnp.float32
                        ).astype(dv_ref.dtype)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)        # (N, Bk)
    ds = p * (dp - delta) * scale
    dk_ref[0] = jnp.dot(ds.T, q, preferred_element_type=jnp.float32
                        ).astype(dk_ref.dtype)


def _pad_d(x):
    d = x.shape[-1]
    if d % 128 == 0:
        return x, d
    pad = 128 - d % 128
    return jnp.pad(x, ((0, 0), (0, 0), (0, pad))), d


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float):
    """q, k, v: (BH, N, D) -> (BH, N, D). Non-causal full attention."""
    o, _ = _flash_fwd(q, k, v, scale)
    return o


def _flash_fwd(q, k, v, scale):
    qp, d0 = _pad_d(q)
    kp, _ = _pad_d(k)
    vp, _ = _pad_d(v)
    BH, N, D = qp.shape
    nq = N // Q_BLOCK
    grid = (BH, nq)
    out_shape = (jax.ShapeDtypeStruct((BH, N, D), q.dtype),
                 jax.ShapeDtypeStruct((BH, 8, N), jnp.float32))
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Q_BLOCK, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Q_BLOCK, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Q_BLOCK), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
    )(qp, kp, vp)
    return o[..., :d0], (qp, kp, vp, o, lse, d0)


def _flash_fwd_vjp(q, k, v, scale):
    o, res = _flash_fwd(q, k, v, scale)
    return o, res


def _flash_bwd_vjp(scale, res, g):
    qp, kp, vp, o, lse, d0 = res
    BH, N, D = qp.shape
    gp, _ = _pad_d(g)
    delta = jnp.sum(gp.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[:, None, :], (BH, 8, N))

    nq = N // Q_BLOCK
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale),
        grid=(BH, nq),
        in_specs=[
            pl.BlockSpec((1, Q_BLOCK, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q_BLOCK, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Q_BLOCK), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Q_BLOCK), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q_BLOCK, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, N, D), qp.dtype),
    )(qp, kp, vp, gp, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale),
        grid=(BH, nq),
        in_specs=[
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q_BLOCK, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q_BLOCK, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, N), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, N), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Q_BLOCK, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q_BLOCK, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((BH, N, D), kp.dtype),
                   jax.ShapeDtypeStruct((BH, N, D), vp.dtype)),
    )(qp, kp, vp, gp, lse, delta)

    d0_slice = lambda x: x[..., :d0] if d0 != D else x
    return d0_slice(dq), d0_slice(dk), d0_slice(dv)


flash_attention.defvjp(_flash_fwd_vjp, _flash_bwd_vjp)


def flash_attention_heads(q, k, v, scale: float):
    """Adapter matching models.layers.plain_attention: q,k,v (B, H, N, Dh)."""
    B, H, N, Dh = q.shape
    fold = lambda x: x.reshape(B * H, N, Dh)
    o = flash_attention(fold(q), fold(k), fold(v), scale)
    return o.reshape(B, H, N, Dh)
