"""Isolated dense-attention benchmark: fused Pallas kernel vs XLA reference.

Real ViT-B 224 dense-task shapes: B=128 images, N=197 tokens, H=12 heads,
Dh=64, bf16, packed (B, N, 3C) qkv input. Measures value_and_grad over a
12-layer attention-only chain (mirrors the per-block invocation pattern of a
ViT-B train step), scanned-in-jit like bench.py so relay dispatch cancels.

FLOP accounting uses REAL N (197): fwd 2 matmuls + bwd 5 matmuls per head,
each 2*N^2*Dh. The padded-to-256 kernel executes (256/197)^2 = 1.69x that,
so 'effective TFLOP/s' is useful-work throughput, directly comparable across
padding strategies.

Usage: python benchmarks/bench_attention_kernel.py
           [xla|fused|v2|v2g4|v3|v2g44|v3g44|v4|both]   (default: both)
"""
import os
import sys
import time

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssl4gie_tpu.core.xla_options import jit_kwargs
from ssl4gie_tpu.kernels.dense_attention import fused_qkv_attention

B = int(os.environ.get("ATTN_BENCH_B", 128))
L = int(os.environ.get("ATTN_BENCH_L", 12))
STEPS = int(os.environ.get("ATTN_BENCH_STEPS", 10))
N, H, Dh = 197, 12, 64
C = H * Dh
SCALE = Dh ** -0.5
DT = jnp.bfloat16

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(0, 1, (B, N, 3 * C)).astype(np.float32), DT)


def fused_layer(qkv):
    return fused_qkv_attention(qkv, H, SCALE)


def xla_layer(qkv):
    """Reference XLA path: reshape/transpose heads, materialized softmax."""
    q, k, v = jnp.split(qkv, 3, axis=-1)
    def heads(t):
        return t.reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
    q, k, v = heads(q), heads(k), heads(v)
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * SCALE
    p = jax.nn.softmax(s, axis=-1).astype(DT)
    o = jnp.einsum("bhnm,bhmd->bhnd", p, v)
    return o.transpose(0, 2, 1, 3).reshape(B, N, C)


# ---------------------------------------------------------------------------
# v2 kernel: narrow masks + scale-folded-into-q + l-correction (no (Nb,Nb)
# selects). Padded score columns are EXACTLY zero because k's OOB rows are
# zeroed, so the true row sum is sum(exp(s-m)) - (Nb-n)*exp(-m); garbage in
# padded OUTPUT rows is discarded by the (N-row) block write.
# ---------------------------------------------------------------------------

def _fwd_kernel_v2(qkv_ref, o_ref, *, H, Dh, scale, n, G):
    C = H * Dh
    dt = qkv_ref.dtype
    Nb = qkv_ref.shape[1]
    pad = float(Nb - n)
    row1 = jax.lax.broadcasted_iota(jnp.int32, (Nb, Dh), 0)
    for g in range(G):
        blk = qkv_ref[g]
        for h in range(H):
            q = blk[:, h * Dh:(h + 1) * Dh] * jnp.asarray(scale, dt)
            k = jnp.where(row1 < n, blk[:, C + h * Dh:C + (h + 1) * Dh], 0)
            v = jnp.where(row1 < n,
                          blk[:, 2 * C + h * Dh:2 * C + (h + 1) * Dh], 0)
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True) - pad * jnp.exp(-m)
            o = jnp.dot(p.astype(dt), v, preferred_element_type=jnp.float32) / l
            o_ref[g, :, h * Dh:(h + 1) * Dh] = o.astype(dt)


def _bwd_kernel_v2(qkv_ref, do_ref, dqkv_ref, *, H, Dh, scale, n, G):
    C = H * Dh
    dt = qkv_ref.dtype
    Nb = qkv_ref.shape[1]
    pad = float(Nb - n)
    row1 = jax.lax.broadcasted_iota(jnp.int32, (Nb, Dh), 0)
    for g in range(G):
        blk = qkv_ref[g]
        dob = do_ref[g]
        for h in range(H):
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
            # (v rows zeroed) so delta is exact; ds garbage columns hit k's
            # zero rows in dq; garbage dk/dv padded ROWS are discarded by the
            # block write.
            dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
            delta = jnp.sum(p * dp, axis=-1, keepdims=True)
            ds = (p * (dp - delta)).astype(dt)
            pb = p.astype(dt)
            dgT = lambda a, b: jax.lax.dot_general(
                a, b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
            dqkv_ref[g, :, h * Dh:(h + 1) * Dh] = dq.astype(dt)
            dqkv_ref[g, :, C + h * Dh:C + (h + 1) * Dh] = dgT(ds, qs).astype(dt)
            dqkv_ref[g, :, 2 * C + h * Dh:2 * C + (h + 1) * Dh] = \
                dgT(pb, do).astype(dt)


def _mk_v2(fwd_G=2, bwd_G=2, Nb=256):

    def fwd(qkv):
        Bq = qkv.shape[0]
        G = fwd_G if Bq % fwd_G == 0 else 1
        return pl.pallas_call(
            functools.partial(_fwd_kernel_v2, H=H, Dh=Dh, scale=SCALE, n=N,
                              G=G),
            grid=(Bq // G,),
            in_specs=[pl.BlockSpec((G, Nb, 3 * C), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((G, Nb, C), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bq, N, C), qkv.dtype),
        )(qkv)

    @jax.custom_vjp
    def attn(qkv):
        return fwd(qkv)

    def fwd_vjp(qkv):
        return fwd(qkv), qkv

    def bwd_vjp(qkv, g):
        Bq = qkv.shape[0]
        G = bwd_G if Bq % bwd_G == 0 else 1
        dqkv = pl.pallas_call(
            functools.partial(_bwd_kernel_v2, H=H, Dh=Dh, scale=SCALE, n=N,
                              G=G),
            grid=(Bq // G,),
            in_specs=[
                pl.BlockSpec((G, Nb, 3 * C), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, Nb, C), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, Nb, 3 * C), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bq, N, 3 * C), qkv.dtype),
        )(qkv, g)
        return (dqkv,)

    attn.defvjp(fwd_vjp, bwd_vjp)
    return attn


# ---------------------------------------------------------------------------
# v4: fwd additionally SAVES the normalized softmax matrix p (bf16) so the bwd
# skips the s-recompute entirely — one fewer matmul and no exp/max/sum VPU work
# per head, at the cost of a (B, H, Nb, Nb) bf16 residual (~2 MB/program extra
# HBM write + read). The pad-correction analysis is unchanged: saved p's padded
# columns are nonzero but dp's padded columns are 0 (v rows zeroed), garbage
# dk/dv padded rows are discarded by the block write.
# ---------------------------------------------------------------------------

def _fwd_kernel_v4(qkv_ref, o_ref, p_ref, *, H, Dh, scale, n, G):
    C = H * Dh
    dt = qkv_ref.dtype
    Nb = qkv_ref.shape[1]
    pad = float(Nb - n)
    row1 = jax.lax.broadcasted_iota(jnp.int32, (Nb, Dh), 0)
    for g in range(G):
        blk = qkv_ref[g]
        for h in range(H):
            q = blk[:, h * Dh:(h + 1) * Dh] * jnp.asarray(scale, dt)
            k = jnp.where(row1 < n, blk[:, C + h * Dh:C + (h + 1) * Dh], 0)
            v = jnp.where(row1 < n,
                          blk[:, 2 * C + h * Dh:2 * C + (h + 1) * Dh], 0)
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            l = jnp.sum(e, axis=-1, keepdims=True) - pad * jnp.exp(-m)
            p = e / l
            pb = p.astype(dt)
            o = jnp.dot(pb, v, preferred_element_type=jnp.float32)
            o_ref[g, :, h * Dh:(h + 1) * Dh] = o.astype(dt)
            p_ref[g, h] = pb


def _bwd_kernel_v4(qkv_ref, p_ref, do_ref, dqkv_ref, *, H, Dh, scale, n, G):
    C = H * Dh
    dt = qkv_ref.dtype
    Nb = qkv_ref.shape[1]
    row1 = jax.lax.broadcasted_iota(jnp.int32, (Nb, Dh), 0)
    for g in range(G):
        blk = qkv_ref[g]
        dob = do_ref[g]
        for h in range(H):
            qs = jnp.where(row1 < n,
                           blk[:, h * Dh:(h + 1) * Dh], 0) * jnp.asarray(scale, dt)
            k = jnp.where(row1 < n, blk[:, C + h * Dh:C + (h + 1) * Dh], 0)
            v = jnp.where(row1 < n,
                          blk[:, 2 * C + h * Dh:2 * C + (h + 1) * Dh], 0)
            do = jnp.where(row1 < n, dob[:, h * Dh:(h + 1) * Dh], 0)
            pb = p_ref[g, h]
            p = pb.astype(jnp.float32)
            dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
            delta = jnp.sum(p * dp, axis=-1, keepdims=True)
            ds = (p * (dp - delta)).astype(dt)
            dgT = lambda a, b: jax.lax.dot_general(
                a, b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
            dqkv_ref[g, :, h * Dh:(h + 1) * Dh] = dq.astype(dt)
            dqkv_ref[g, :, C + h * Dh:C + (h + 1) * Dh] = dgT(ds, qs).astype(dt)
            dqkv_ref[g, :, 2 * C + h * Dh:2 * C + (h + 1) * Dh] = \
                dgT(pb, do).astype(dt)


def _mk_v4(fwd_G=2, bwd_G=2, Nb=208):

    def fwd(qkv):
        Bq = qkv.shape[0]
        G = fwd_G if Bq % fwd_G == 0 else 1
        o, p = pl.pallas_call(
            functools.partial(_fwd_kernel_v4, H=H, Dh=Dh, scale=SCALE, n=N,
                              G=G),
            grid=(Bq // G,),
            in_specs=[pl.BlockSpec((G, Nb, 3 * C), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((G, Nb, C), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, H, Nb, Nb), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Bq, N, C), qkv.dtype),
                jax.ShapeDtypeStruct((Bq, H, Nb, Nb), qkv.dtype),
            ],
        )(qkv)
        return o, p

    @jax.custom_vjp
    def attn(qkv):
        return fwd(qkv)[0]

    def fwd_vjp(qkv):
        o, p = fwd(qkv)
        return o, (qkv, p)

    def bwd_vjp(res, g):
        qkv, p = res
        Bq = qkv.shape[0]
        G = bwd_G if Bq % bwd_G == 0 else 1
        dqkv = pl.pallas_call(
            functools.partial(_bwd_kernel_v4, H=H, Dh=Dh, scale=SCALE, n=N,
                              G=G),
            grid=(Bq // G,),
            in_specs=[
                pl.BlockSpec((G, Nb, 3 * C), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, H, Nb, Nb), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, Nb, C), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, Nb, 3 * C), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bq, N, 3 * C), qkv.dtype),
        )(qkv, p, g)
        return (dqkv,)

    attn.defvjp(fwd_vjp, bwd_vjp)
    return attn


def bench(layer, name, n_steps=STEPS):
    def loss(x):
        # tile-glue (a cheap copy, ~0.3 ms/layer) instead of a mixing matmul:
        # a C->3C glue GEMM would be 267 GFLOP/layer fwd+bwd and swamp the
        # 53 GFLOP/layer of attention being measured. Layers run under scan
        # so only ONE layer body is compiled (relay compiles are slow).
        def lyr(x, _):
            o = layer(x) * 0.1
            return x + jnp.concatenate([o, o, o], axis=-1), None
        x, _ = jax.lax.scan(lyr, x, None, length=L)
        return jnp.sum(x.astype(jnp.float32) ** 2) * 1e-9

    grad_fn = jax.value_and_grad(loss)

    # production classification program runs under the 48 MiB scoped-VMEM cap;
    # measure kernels under the same conditions (also lets bwd G=4 fit)
    @functools.partial(jax.jit, **jit_kwargs("classification"))
    def run(x):
        def body(x, _):
            v, g = grad_fn(x)
            upd = ((1e-6 * v) * g.astype(jnp.float32)).astype(x.dtype)
            return x - upd, v                    # grad-dependent: no hoisting
        _, vs = jax.lax.scan(body, x, None, length=n_steps)
        return vs

    print(f"{name}: compiling...", flush=True)
    tc = time.perf_counter()
    vs = run(x0)
    float(vs[-1])                                # compile + settle
    print(f"  compiled+1st run in {time.perf_counter() - tc:.0f} s", flush=True)
    t0 = time.perf_counter()
    vs = run(x0)
    float(vs[-1])
    dt = (time.perf_counter() - t0) / n_steps * 1000
    # attention-only matmul FLOPs at real N (excludes the wmix chain glue)
    attn = 7 * 2 * N * N * Dh * H * B * L
    print(f"{name}: {dt:.2f} ms/step ({L} attn layers fwd+bwd, B={B}) "
          f"-> {attn / (dt / 1e3) / 1e12:.2f} TFLOP/s effective (attn only)")
    return dt


def check_v2(attn=None):
    """Numerical parity of a variant vs the current kernel (fwd + grads).
    Runs jitted under the production 48 MiB scoped-VMEM cap — eager pallas
    calls get the 16 MiB default, which the larger variants exceed."""
    attn = attn or _mk_v2()
    small = x0[:8]

    @functools.partial(jax.jit, **jit_kwargs("classification"))
    def both(small):
        f0 = fused_layer(small)
        f2 = attn(small)
        g = jnp.ones_like(f0)
        g0 = jax.vjp(fused_layer, small)[1](g)[0]
        g2 = jax.vjp(attn, small)[1](g)[0]
        err_f = jnp.max(jnp.abs(f0.astype(jnp.float32) -
                                f2.astype(jnp.float32)))
        err_g = jnp.max(jnp.abs(g0.astype(jnp.float32) -
                                g2.astype(jnp.float32)))
        return err_f, err_g

    err_f, err_g = both(small)
    print(f"variant parity vs current: fwd max|d|={float(err_f):.3e} "
          f"bwd max|d|={float(err_g):.3e}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    do_check = os.environ.get("ATTN_CHECK", "1") == "1"   # remote-compile cost
    if which in ("xla", "both"):
        bench(xla_layer, "XLA transpose+softmax")
    if which in ("fused", "both"):
        bench(fused_layer, "Pallas fused dense  ")
    if which in ("v2", "both"):
        if do_check:
            check_v2()
        bench(_mk_v2(2, 2), "v2 narrow-mask G2/2 ")
    if which == "v2g4":
        if do_check:
            check_v2()
        bench(_mk_v2(4, 2), "v2 narrow-mask G4/2 ")
    if which == "v3":
        # sublane-trimmed blocks: 208 rows (13x16) instead of 256 — 19% less
        # row work if Mosaic tolerates the 208-lane score matrices
        if do_check:
            check_v2(_mk_v2(2, 2, Nb=208))
        bench(_mk_v2(2, 2, Nb=208), "v3 208-row G2/2     ")
    if which == "v2g44":
        # bwd G=4 needs ~22 MB of double-buffered blocks: only fits under the
        # 48 MiB scoped-VMEM cap (now applied to the timed jit above)
        bench(_mk_v2(4, 4), "v2 narrow-mask G4/4 ")
    if which == "v3g44":
        # G=4 retry at the trimmed 208-row block: the VMEM pressure that sank
        # v2g44 at Nb=256 is 34% lower here
        if do_check:
            check_v2(_mk_v2(4, 4, Nb=208))
        bench(_mk_v2(4, 4, Nb=208), "v3 208-row G4/4     ")
    if which == "v4":
        # save-p backward: one fewer bwd matmul, no bwd exp/max/sum, at the
        # cost of a (B, H, 208, 208) bf16 residual through HBM
        if do_check:
            check_v2(_mk_v4(2, 2))
        bench(_mk_v4(2, 2), "v4 save-p G2/2      ")
