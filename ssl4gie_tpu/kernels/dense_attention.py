"""Fused short-sequence multi-head attention on packed QKV (Pallas TPU).

Motivation (measured on v5e, ViT-B 224 px train step, B=128, N=197): XLA's
materialized (B, 12, 197, 197) softmax costs ~32 ms/step plus ~14 ms of head
split/merge transposes; routing the generic flash kernel (kernels/
flash_attention.py) at this length added ~16 ms of pad/slice copies and still
left the transposes. This kernel removes all of it:

- input is the raw `Dense(3C)` output, (B, N, 3C) with columns
  [q_0..q_{H-1} | k_0..k_{H-1} | v_0..v_{H-1}], each head Dh wide — no XLA
  reshape/transpose/pad on either side of the kernel (the 64-lane in-kernel
  head slices are register shifts, not HBM traffic);
- the whole sequence fits in one VMEM block (N <= 512), so the backward
  recomputes the softmax from the qkv residual instead of saving lse/delta;
- out-of-bounds block rows (N=197 -> 256-row block) are zeroed in-kernel;
  padded key columns are masked to -1e30 before the softmax. All matmuls run
  in the input dtype (bf16) with f32 accumulation.

The reference computes the same math eagerly in torch (`Models/models.py:202-206`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_FUSED_SEQ = 512


def _block_len(n: int) -> int:
    return max(128, -(-n // 128) * 128)


def _img_group(B: int) -> int:
    """Images fused per program: amortizes program-launch overhead over more
    MXU work (a single 197-token image is only ~0.2 ms of matmul). G=4 blows
    the ~14 MB scoped VMEM budget in the backward (qkv+do+dqkv blocks)."""
    return 2 if B % 2 == 0 else 1


def _fwd_kernel(qkv_ref, o_ref, *, H, Dh, scale, n, G):
    C = H * Dh
    dt = qkv_ref.dtype
    Nb = qkv_ref.shape[1]
    row1 = jax.lax.broadcasted_iota(jnp.int32, (Nb, Dh), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Nb, Nb), 1)
    for g in range(G):
        blk = qkv_ref[g]                                    # (Nb, 3C)
        for h in range(H):
            q = blk[:, h * Dh:(h + 1) * Dh]
            k = blk[:, C + h * Dh:C + (h + 1) * Dh]
            # v's OOB rows must be zeroed: padded columns of p are exactly zero,
            # but 0 * garbage(NaN) would poison p @ v. k needs no zeroing (its
            # garbage lands in masked score columns).
            v = jnp.where(row1 < n,
                          blk[:, 2 * C + h * Dh:2 * C + (h + 1) * Dh], 0)
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
            s = jnp.where(col < n, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(dt), v, preferred_element_type=jnp.float32) / l
            o_ref[g, :, h * Dh:(h + 1) * Dh] = o.astype(dt)


def _bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, H, Dh, scale, n, G):
    C = H * Dh
    dt = qkv_ref.dtype
    Nb = qkv_ref.shape[1]
    row1 = jax.lax.broadcasted_iota(jnp.int32, (Nb, Dh), 0)
    row = jax.lax.broadcasted_iota(jnp.int32, (Nb, Nb), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Nb, Nb), 1)
    for g in range(G):
        blk = qkv_ref[g]
        dob = do_ref[g]
        for h in range(H):
            # zero every OOB row: all four tensors feed matmuls against tensors
            # whose matching slots are zero — 0 * NaN must not occur.
            q = jnp.where(row1 < n, blk[:, h * Dh:(h + 1) * Dh], 0)
            k = jnp.where(row1 < n, blk[:, C + h * Dh:C + (h + 1) * Dh], 0)
            v = jnp.where(row1 < n,
                          blk[:, 2 * C + h * Dh:2 * C + (h + 1) * Dh], 0)
            do = jnp.where(row1 < n, dob[:, h * Dh:(h + 1) * Dh], 0)
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
            s = jnp.where((row < n) & (col < n), s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)      # true softmax rows
            p = jnp.where(row < n, p, 0.0)
            dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
            delta = jnp.sum(p * dp, axis=-1, keepdims=True)  # = rowsum(do * o)
            ds = (p * (dp - delta) * scale).astype(dt)
            pb = p.astype(dt)
            # x^T @ y as a dim-0 contraction — lets Mosaic feed the MXU
            # directly instead of materializing the (Nb, Nb) transpose in VMEM
            dgT = lambda a, b: jax.lax.dot_general(
                a, b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dqkv_ref[g, :, h * Dh:(h + 1) * Dh] = jnp.dot(
                ds, k, preferred_element_type=jnp.float32).astype(dt)
            dqkv_ref[g, :, C + h * Dh:C + (h + 1) * Dh] = dgT(ds, q).astype(dt)
            dqkv_ref[g, :, 2 * C + h * Dh:2 * C + (h + 1) * Dh] = \
                dgT(pb, do).astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_qkv_attention(qkv, num_heads: int, scale: float):
    """qkv: (B, N, 3*H*Dh) packed [all-q | all-k | all-v] -> (B, N, H*Dh)."""
    return _fused_fwd(qkv, num_heads, scale)


def _fused_fwd(qkv, num_heads, scale):
    B, N, C3 = qkv.shape
    C = C3 // 3
    Dh = C // num_heads
    Nb = _block_len(N)
    G = _img_group(B)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, H=num_heads, Dh=Dh, scale=scale, n=N,
                          G=G),
        grid=(B // G,),
        in_specs=[pl.BlockSpec((G, Nb, C3), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, Nb, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
    )(qkv)
    return out


def _fused_fwd_vjp(qkv, num_heads, scale):
    return _fused_fwd(qkv, num_heads, scale), qkv


def _fused_bwd_vjp(num_heads, scale, qkv, g):
    B, N, C3 = qkv.shape
    C = C3 // 3
    Dh = C // num_heads
    Nb = _block_len(N)
    G = _img_group(B)
    dqkv = pl.pallas_call(
        functools.partial(_bwd_kernel, H=num_heads, Dh=Dh, scale=scale, n=N,
                          G=G),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, Nb, C3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Nb, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, Nb, C3), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C3), qkv.dtype),
    )(qkv, g)
    return (dqkv,)


fused_qkv_attention.defvjp(_fused_fwd_vjp, _fused_bwd_vjp)
