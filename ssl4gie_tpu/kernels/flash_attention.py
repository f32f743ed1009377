"""Blockwise (flash-style) attention as Pallas TPU kernels, with custom VJP.

Purpose (SURVEY §2.8/§5.7): the reference's attention is a plain quadratic
softmax(QK^T)V (`Models/models.py:202-206`); at detection's 4,096 tokens the full
(N, N) score matrix would round-trip HBM, and even at the dense tasks' 197 tokens
XLA's materialized (B, 12, 197, 197) softmax costs ~32 ms of a 146 ms ViT-B train
step at B=128. These kernels keep Q-block x full-K score tiles in VMEM: scores
never touch HBM, and the backward recomputes probabilities from the saved
logsumexp (standard flash backward).

Two shape regimes, one code path:
- long sequences (detection, N=4096): one (batch*head) per program; per-program
  matmul work is large so grid overhead is negligible.
- short sequences (dense tasks, N=197 padded to one 256 block): G heads are
  batched per program (static python loop over G in-kernel) — at N=256/D=64 a
  single head is ~34 MFLOP and program launch overhead would dominate (measured:
  the G=1 kernel LOST to plain XLA end-to-end, 546 vs 640 img/s).

Layout: q, k, v are (BH, N, D) with BH = batch*heads folded. D stays at the
native 64 lanes (no 128-padding): the MXU contracts 128 at a time either way,
but unpadded tensors halve the HBM traffic. N is padded to a Q_BLOCK multiple
by the caller with `n_valid` masking padded key columns in the forward; padded
query rows need no masking anywhere (their outputs are sliced away and their
zero upstream grads keep them out of dk/dv).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q_BLOCK = 256
MAX_HEAD_GROUP = 16      # heads fused per program for short sequences
SHORT_SEQ = 512          # <=: use head-grouped single-block kernels


def _mask_cols(s, n_valid):
    if n_valid is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, -1e30)
    return s


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, n_valid, G):
    # Matmuls take the input dtype (bf16 from the model) with f32 accumulation —
    # upcasting operands first would force 4-8x slower f32 MXU passes. Softmax
    # statistics stay in f32.
    dt = q_ref.dtype
    for g in range(G):
        q, k, v = q_ref[g], k_ref[g], v_ref[g]           # (Bq, D), (N, D), (N, D)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (Bq, N)
        s = _mask_cols(s, n_valid)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(dt), v, preferred_element_type=jnp.float32) / l
        o_ref[g] = o.astype(o_ref.dtype)
        # lse stored broadcast over 8 sublanes to satisfy TPU (8, 128) tiling
        lse = m[:, 0] + jnp.log(l[:, 0])
        lse_ref[g] = jnp.broadcast_to(lse[None, :], (8, lse.shape[0]))


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *,
                   scale, n_valid, G):
    # Padded key columns MUST be masked before exponentiating, mirroring the
    # forward: for those columns s=0 and p=exp(-lse), which overflows to inf
    # when a row's valid logits are all below ~-87 (lse < -87) and then makes
    # dq NaN via inf*0 against the zero-padded k (ADVICE r2).
    dt = q_ref.dtype
    for g in range(G):
        q, k, v, do = q_ref[g], k_ref[g], v_ref[g], do_ref[g]
        lse = lse_ref[g, 0][:, None]
        delta = delta_ref[g, 0][:, None]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        s = _mask_cols(s, n_valid)
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = (p * (dp - delta) * scale).astype(dt)
        dq_ref[g] = jnp.dot(ds, k, preferred_element_type=jnp.float32
                            ).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale, n_valid, G):
    # Padded query rows need no mask: their upstream grads (do) are zero, so
    # dp = delta = 0 and ds = 0 for those rows.
    del n_valid
    dt = q_ref.dtype
    for g in range(G):
        q, k, v, do = q_ref[g], k_ref[g], v_ref[g], do_ref[g]   # q/do (N, D) full
        lse = lse_ref[g, 0][:, None]
        delta = delta_ref[g, 0][:, None]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (N, Bk)
        p = jnp.exp(s - lse).astype(dt)
        dv_ref[g] = jnp.dot(p.T, do, preferred_element_type=jnp.float32
                            ).astype(dv_ref.dtype)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)        # (N, Bk)
        ds = (p.astype(jnp.float32) * (dp - delta) * scale).astype(dt)
        dk_ref[g] = jnp.dot(ds.T, q, preferred_element_type=jnp.float32
                            ).astype(dk_ref.dtype)


def _pad_d(x):
    d = x.shape[-1]
    if d % 64 == 0:
        return x, d
    pad = 64 - d % 64
    return jnp.pad(x, ((0, 0), (0, 0), (0, pad))), d


def _head_group(BH: int, N: int) -> int:
    if N > SHORT_SEQ:
        return 1
    g = 1
    for cand in range(min(MAX_HEAD_GROUP, BH), 0, -1):
        if BH % cand == 0:
            g = cand
            break
    return g


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, scale: float, n_valid=None):
    """q, k, v: (BH, N, D) -> (BH, N, D). Non-causal full attention.

    N must be a multiple of Q_BLOCK; when the true sequence is shorter the
    caller zero-pads to N and passes the true length as `n_valid`."""
    o, _ = _flash_fwd(q, k, v, scale, n_valid)
    return o


def _flash_fwd(q, k, v, scale, n_valid=None):
    qp, d0 = _pad_d(q)
    kp, _ = _pad_d(k)
    vp, _ = _pad_d(v)
    BH, N, D = qp.shape
    G = _head_group(BH, N)
    nq = N // Q_BLOCK
    grid = (BH // G, nq)
    out_shape = (jax.ShapeDtypeStruct((BH, N, D), q.dtype),
                 jax.ShapeDtypeStruct((BH, 8, N), jnp.float32))
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_valid=n_valid, G=G),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, Q_BLOCK, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((G, Q_BLOCK, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 8, Q_BLOCK), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
    )(qp, kp, vp)
    return o[..., :d0], (qp, kp, vp, o, lse, d0)


def _flash_fwd_vjp(q, k, v, scale, n_valid):
    o, res = _flash_fwd(q, k, v, scale, n_valid)
    return o, res


def _flash_bwd_vjp(scale, n_valid, res, g):
    qp, kp, vp, o, lse, d0 = res
    BH, N, D = qp.shape
    gp, _ = _pad_d(g)
    delta = jnp.sum(gp.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[:, None, :], (BH, 8, N))

    G = _head_group(BH, N)
    nq = N // Q_BLOCK
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, n_valid=n_valid, G=G),
        grid=(BH // G, nq),
        in_specs=[
            pl.BlockSpec((G, Q_BLOCK, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Q_BLOCK, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 8, Q_BLOCK), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 8, Q_BLOCK), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, Q_BLOCK, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, N, D), qp.dtype),
    )(qp, kp, vp, gp, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, n_valid=n_valid, G=G),
        grid=(BH // G, nq),
        in_specs=[
            pl.BlockSpec((G, N, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Q_BLOCK, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Q_BLOCK, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 8, N), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 8, N), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((G, Q_BLOCK, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Q_BLOCK, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((BH, N, D), kp.dtype),
                   jax.ShapeDtypeStruct((BH, N, D), vp.dtype)),
    )(qp, kp, vp, gp, lse, delta)

    d0_slice = lambda x: x[..., :d0] if d0 != D else x
    return d0_slice(dq), d0_slice(dk), d0_slice(dv)


flash_attention.defvjp(_flash_fwd_vjp, _flash_bwd_vjp)


def flash_attention_heads(q, k, v, scale: float):
    """Adapter matching models.layers.plain_attention: q,k,v (B, H, N, Dh).

    Sequences that are not a multiple of Q_BLOCK (ViT-B's 197 dense tokens)
    are zero-padded up to it and masked via `n_valid`; the XLA pad/slice
    copies are cheap next to the (N, N) HBM round-trips they replace."""
    B, H, N, Dh = q.shape
    fold = lambda x: x.reshape(B * H, N, Dh)
    if N % Q_BLOCK == 0:
        o = flash_attention(fold(q), fold(k), fold(v), scale)
        return o.reshape(B, H, N, Dh)
    npad = Q_BLOCK - N % Q_BLOCK
    pad = lambda x: jnp.pad(fold(x), ((0, 0), (0, npad), (0, 0)))
    o = flash_attention(pad(q), pad(k), pad(v), scale, N)
    return o[:, :N].reshape(B, H, N, Dh)
