"""Paeth 3-shear rotation as a Pallas TPU kernel (VMEM-resident shears).

The XLA version (`data/augment.rotate_nearest_shear`) runs 22 roll+select
passes over HBM (~7 ms per 128x224px batch in bf16 on v5e). Here the whole
padded canvas of one image lives in VMEM (224 x 320*3 bf16 = 0.42 MB) and the
same binary-decomposed shifts become VPU-speed register rolls.

Layout: the caller flattens (B, H, W, C) to (B, H, W*C); a lane roll by k
pixels is a roll by k*C elements, and per-lane quantities (pass B's column
shifts, validity masks) are derived from lane_index // C in-kernel. The rot90
fold stays in XLA (a (H, W) transpose cannot be expressed on the flattened
view); only the three shear passes — all the roll/select traffic — move into
VMEM. Shift magnitudes are data-dependent (per-image angle) but the roll
AMOUNTS are static powers of two; selects use masks computed from broadcasted
iota, so Mosaic sees fully static control flow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nbits(lo, hi):
    return max(1, int(np.ceil(np.log2(hi - lo + 1))))


def _kernel(trig_ref, g_ref, o_ref, *, H, W, C, P, Wp, fill):
    """One image per program. trig_ref: full (B, 2) f32 [alpha, beta], scalar-
    prefetched to SMEM. g_ref: (1, H, Wp*C) padded canvas; o_ref: (1, H, W*C)."""
    c = (H - 1) / 2.0
    b = pl.program_id(0)
    alpha = trig_ref[b, 0]
    beta = trig_ref[b, 1]

    dt = g_ref.dtype
    # tpu.rotate supports only 32-bit data: shear in f32 registers (HBM side
    # stays in the caller's dtype)
    x = g_ref[0].astype(jnp.float32)                        # (H, Wp*C)
    shape = x.shape
    rowf = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    jx = lane // C - P                                      # logical x in [-P, W+P)

    s1 = jnp.round(alpha * (rowf - c)).astype(jnp.int32)    # (H, *) row shift
    s2 = jnp.round(beta * (jx.astype(jnp.float32) - c)).astype(jnp.int32)
    S2 = int(np.ceil(np.sin(np.pi / 4) * (W / 2.0 - 0.5 + P)))

    def roll(v, s, axis):
        # pltpu.roll == jnp.roll for s >= 0; fold negative shifts mod N
        n = v.shape[axis]
        return pltpu.roll(v, s % n, axis)

    def roll_select(v, u, axis, nbits, step):
        # v[i] <- v[(i + s) mod N] with s = u + lo already folded to u >= 0;
        # `step` scales lane rolls to pixel units (C elements per pixel)
        for j in range(nbits):
            bit = ((u >> j) & 1) == 1
            v = jnp.where(bit, roll(v, -(1 << j) * step, axis), v)
        return v

    # pass A (x-shear): tA[y, j] = x[y, (j + s1(y)) mod Wp]
    lo1 = -(P - 1)
    t = roll(x, -lo1 * C, 1)
    t = roll_select(t, s1 - lo1, 1, _nbits(lo1, P - 1), C)
    src1 = jx + s1
    t = jnp.where((src1 >= 0) & (src1 < W), t, fill)

    # pass B (y-shear): tB[y, j] = tA[(y + s2(j)) mod H, j]
    t = roll(t, S2, 0)
    t = roll_select(t, s2 + S2, 0, _nbits(-S2, S2), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    src2 = rowi + s2
    t = jnp.where((src2 >= 0) & (src2 < H), t, fill)

    # pass C (x-shear): out[y, x] = tB[y, x + P + s1(y)] (always in canvas)
    t = roll(t, -C, 1)
    t = roll_select(t, P + s1 - 1, 1, _nbits(1, 2 * P - 1), C)
    o_ref[0] = t[:, :W * C].astype(dt)


def shear_rotate_pallas(g, alpha, beta, P: int, fill: float):
    """g: (B, H, W, C) already rot90-folded; alpha/beta: (B,) shear factors
    (tan(r/2), -sin(r)). Returns the rotated (B, H, W, C).

    The kernel keeps ~5 live f32 copies of the (H, Wp*C) canvas in VMEM; when
    that exceeds the ~14 MB scoped budget (seg's 352px canvas with 5 stacked
    channels) the channels are split into groups and rotated in separate
    pallas_calls (identical shifts — the per-image trig is shared)."""
    B, H, W, C = g.shape
    Wp_pix = -(-(W + 2 * P) // 128) * 128
    budget = 14 * 1024 * 1024
    per_chan = H * Wp_pix * 4 * 5
    cg = max(1, min(C, budget // per_chan))
    if cg < C:
        outs = [shear_rotate_pallas(g[..., i:i + cg], alpha, beta, P, fill)
                for i in range(0, C, cg)]
        return jnp.concatenate(outs, axis=-1)
    # lane rolls need the flattened width to be a 128-lane multiple; since
    # gcd(C, 128) pixels must stay whole, round the padded canvas up to a
    # multiple of 128 pixels (circular wrap stays mask-safe at any Wp >= W+2P)
    Wp = -(-(W + 2 * P) // 128) * 128
    pad_l = jnp.full((B, H, P, C), fill, g.dtype)
    pad_r = jnp.full((B, H, Wp - W - P, C), fill, g.dtype)
    gp = jnp.concatenate([pad_l, g, pad_r], axis=2).reshape(B, H, Wp * C)
    trig = jnp.stack([alpha, beta], axis=-1).astype(jnp.float32)   # (B, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Wp * C), lambda b, trig: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W * C), lambda b, trig: (b, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, C=C, P=P, Wp=Wp, fill=fill),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W * C), g.dtype),
    )(trig, gp)
    return out.reshape(B, H, W, C)
