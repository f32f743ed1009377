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
  recomputes the softmax from the qkv residual instead of saving lse/delta.

Round-4 rewrite (the A/B-sweep winner, `benchmarks/bench_attention_kernel.py`
v3: 49.8 ms vs 53.5 ms for the round-2 kernel over 12 ViT-B layers fwd+bwd):
- blocks are trimmed to the 16-row sublane multiple (N=197 -> 208 rows, not
  256): 19% less row work on every matmul;
- no (Nb, Nb) column masks: k/v out-of-bounds ROWS are zeroed with a cheap
  (Nb, Dh) mask, which makes padded score columns exactly q·0 = 0, and the
  softmax denominator is corrected analytically, l = sum(exp(s-m)) -
  pad·exp(-m);
- the 1/sqrt(Dh) scale is folded into q once instead of rescaling the
  (Nb, Nb) score matrix.
All matmuls run in the input dtype (bf16) with f32 accumulation.

Measured and REJECTED beyond v3 (same harness, 12-layer fwd+bwd chain, B=128):
- v4 "save-p backward" (fwd writes the normalized softmax matrix so bwd skips
  the s-recompute, one fewer matmul and no bwd exp): 61.8 ms vs v3's 51.0 —
  the (B, H, 208, 208) bf16 residual costs more in HBM round-trip + VMEM
  block pressure than the recompute it saves;
- G=4 at the 208-row block (v3g44): 51.1 ms — tie; the 34% lower VMEM
  pressure vs the already-rejected Nb=256 G=4 does not change the outcome.

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
    """Sublane-trimmed block length: the next multiple of 16 rows (bf16
    sublane tile), floored at 128 — 208 for ViT-B's N=197."""
    return max(128, -(-n // 16) * 16)


def _img_group(B: int) -> int:
    """Images fused per program: amortizes program-launch overhead over more
    MXU work (a single 197-token image is only ~0.2 ms of matmul). G=4 was
    measured equal-or-slower for both fwd and bwd (bench v2g4/v2g44)."""
    return 2 if B % 2 == 0 else 1


def _fwd_kernel(qkv_ref, o_ref, *, H, Dh, scale, n, G):
    C = H * Dh
    dt = qkv_ref.dtype
    Nb = qkv_ref.shape[1]
    pad = float(Nb - n)
    row1 = jax.lax.broadcasted_iota(jnp.int32, (Nb, Dh), 0)
    for g in range(G):
        blk = qkv_ref[g]                                    # (Nb, 3C)
        for h in range(H):
            q = blk[:, h * Dh:(h + 1) * Dh] * jnp.asarray(scale, dt)
            # zeroing k's OOB rows makes padded score COLUMNS exactly 0 (so no
            # (Nb, Nb) mask is needed); v's OOB rows are zeroed so the nonzero
            # padded p columns hit zero v rows. Garbage q rows only corrupt
            # output rows >= n, which the (B, N, C) block write discards.
            k = jnp.where(row1 < n, blk[:, C + h * Dh:C + (h + 1) * Dh], 0)
            v = jnp.where(row1 < n,
                          blk[:, 2 * C + h * Dh:2 * C + (h + 1) * Dh], 0)
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            # the pad columns each contribute exp(0 - m); subtract analytically
            l = jnp.sum(p, axis=-1, keepdims=True) - pad * jnp.exp(-m)
            o = jnp.dot(p.astype(dt), v, preferred_element_type=jnp.float32) / l
            o_ref[g, :, h * Dh:(h + 1) * Dh] = o.astype(dt)


def _bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, H, Dh, scale, n, G):
    C = H * Dh
    dt = qkv_ref.dtype
    Nb = qkv_ref.shape[1]
    pad = float(Nb - n)
    row1 = jax.lax.broadcasted_iota(jnp.int32, (Nb, Dh), 0)
    for g in range(G):
        blk = qkv_ref[g]
        dob = do_ref[g]
        for h in range(H):
            # q/do OOB rows are zeroed too: both feed row-contractions (dk/dv)
            # where garbage rows would poison valid outputs.
            qs = jnp.where(row1 < n,
                           blk[:, h * Dh:(h + 1) * Dh], 0) * jnp.asarray(scale, dt)
            k = jnp.where(row1 < n, blk[:, C + h * Dh:C + (h + 1) * Dh], 0)
            v = jnp.where(row1 < n,
                          blk[:, 2 * C + h * Dh:2 * C + (h + 1) * Dh], 0)
            do = jnp.where(row1 < n, dob[:, h * Dh:(h + 1) * Dh], 0)
            s = jnp.dot(qs, k.T, preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            l = jnp.sum(e, axis=-1, keepdims=True) - pad * jnp.exp(-m)
            p = e / l
            # padded p columns = exp(-m)/l != 0, but dp's padded columns are 0
            # (v rows zeroed) so delta is exact; ds's nonzero padded columns
            # hit k's zero rows in dq; garbage dk/dv padded ROWS are discarded
            # by the (B, N, 3C) block write.
            dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
            delta = jnp.sum(p * dp, axis=-1, keepdims=True)  # = rowsum(do * o)
            ds = (p * (dp - delta)).astype(dt)
            pb = p.astype(dt)
            # x^T @ y as a dim-0 contraction — lets Mosaic feed the MXU
            # directly instead of materializing the (Nb, Nb) transpose in VMEM
            dgT = lambda a, b: jax.lax.dot_general(
                a, b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # dq = scale * (ds_true @ k); dk = ds_true^T @ (scale*q) = ds^T @ qs
            dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
            dqkv_ref[g, :, h * Dh:(h + 1) * Dh] = dq.astype(dt)
            dqkv_ref[g, :, C + h * Dh:C + (h + 1) * Dh] = dgT(ds, qs).astype(dt)
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
