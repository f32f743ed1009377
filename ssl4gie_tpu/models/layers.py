"""Shared transformer building blocks (Flax linen).

Covers the behavior of the reference's timm-ViT blocks (`Models/models.py:262-357`),
the ViTDet-style windowed attention (`Models/models.py:155-210`), and the 2-D sin-cos
position embedding used by MoCo v3 / MAE (`Models/moco_v3/vits.py:53-69`,
`Models/mae/util/pos_embed.py:20-67`). Implementations are TPU-first: attention via a
single batched einsum (or the Pallas flash kernel for long sequences), windowing via
reshape rather than the reference's gather-permutation, static shapes throughout.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int,
                            cls_token: bool = False) -> np.ndarray:
    """Fixed 2-D sin-cos position embedding, (grid*grid [+1], embed_dim), float32.

    Behavioral match of MAE `util/pos_embed.py:get_2d_sincos_pos_embed` and MoCo v3's
    `build_2d_sincos_position_embedding` (both produce the same lattice; MAE orders
    [h-part, w-part] per token with sin/cos halves per axis).
    """
    assert embed_dim % 4 == 0
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)            # w varies fastest
    grid = np.stack(grid, axis=0).reshape(2, -1)  # (2, H*W): [w, h]

    def embed_1d(pos, dim):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb_h = embed_1d(grid[1], embed_dim // 2)
    emb_w = embed_1d(grid[0], embed_dim // 2)
    pos = np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)
    if cls_token:
        pos = np.concatenate([np.zeros((1, embed_dim), np.float32), pos], axis=0)
    return pos


def interpolate_pos_embed(pos_embed: jnp.ndarray, src_grid: int, dst_grid: int,
                          has_cls: bool = True, method: str = "bilinear") -> jnp.ndarray:
    """Resize the grid part of a (1, N[+1], D) position embedding.

    The reference interpolates 14x14 -> 64x64 bilinearly with align_corners=True for
    1024-px detection (`Models/models.py:310-323`) and bicubically on checkpoint load
    (`Models/mae/util/pos_embed.py:75-96`).
    """
    cls = pos_embed[:, :1] if has_cls else None
    grid = pos_embed[:, 1:] if has_cls else pos_embed
    d = grid.shape[-1]
    grid = grid.reshape(1, src_grid, src_grid, d)
    if method == "bilinear":
        from ssl4gie_tpu.ops.resize import resize_bilinear_ac
        grid = resize_bilinear_ac(grid, dst_grid, dst_grid)
    else:
        grid = jax.image.resize(grid, (1, dst_grid, dst_grid, d), method=method)
    grid = grid.reshape(1, dst_grid * dst_grid, d)
    if cls is not None:
        return jnp.concatenate([cls, grid], axis=1)
    return grid


# timm ViT initialization: trunc_normal(0.02) Linear kernels, zero biases
# (`timm _init_vit_weights`); MAE/MoCo override with xavier_uniform
# (`models_mae.py:86-92`, `moco_v3/vits.py:31-47`) via `kernel_init`.
TIMM_INIT = nn.initializers.truncated_normal(0.02)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gelu_dense(h, kernel, bias, approximate):
    """gelu(h) @ kernel + bias with a leaner autodiff residual: only the
    PRE-gelu activation is saved; the backward recomputes gelu(h) (elementwise)
    instead of keeping a second (B, N, 4*dim) tensor alive. Unlike a remat
    wrapper this leaves the forward fc1+gelu+fc2 XLA fusions untouched."""
    g = nn.gelu(h, approximate=approximate)
    return g @ kernel + bias


def _gelu_dense_fwd(h, kernel, bias, approximate):
    return _gelu_dense(h, kernel, bias, approximate), (h, kernel)


def _gelu_dense_bwd(approximate, res, dy):
    h, kernel = res
    g, vjp_gelu = jax.vjp(lambda t: nn.gelu(t, approximate=approximate), h)
    dk = jnp.einsum("...i,...o->io", g, dy).astype(kernel.dtype)
    db = jnp.sum(dy.reshape(-1, dy.shape[-1]), axis=0)
    dg = dy @ kernel.T
    (dh,) = vjp_gelu(dg)
    return dh, dk, db


_gelu_dense.defvjp(_gelu_dense_fwd, _gelu_dense_bwd)


class _GeluDense(nn.Module):
    """Dense layer applied to gelu(input) via `_gelu_dense` (its param tree is
    identical to nn.Dense so checkpoints/converters see the usual fc2)."""
    features: int
    approximate: bool
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = TIMM_INIT

    @nn.compact
    def __call__(self, h):
        kernel = self.param("kernel", self.kernel_init,
                            (h.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return _gelu_dense(h.astype(self.dtype), kernel.astype(self.dtype),
                           bias.astype(self.dtype), self.approximate)


class _DenseParams(nn.Module):
    """Parameter holder with nn.Dense's exact tree ({kernel, bias}, same init
    order) for paths that consume the weights directly (fused_mlp kernel)."""
    features: int
    kernel_init: Callable = TIMM_INIT

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param("kernel", self.kernel_init,
                            (in_dim, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


# opt-in: VMEM-resident fused fc1+gelu+fc2 Pallas kernel (kernels/fused_mlp)
# instead of XLA's two-fusion MLP. Checkpoint tree and math are identical.
_FUSED_MLP = os.environ.get("SSL4GIE_FUSED_MLP", "0") == "1"


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = TIMM_INIT

    @nn.compact
    def __call__(self, x):
        tokens = x.size // x.shape[-1]
        if _FUSED_MLP and self.dtype == jnp.bfloat16 and tokens % 128 == 0:
            # bf16-only: the fused kernel always uses tanh GELU, which is the
            # bf16 default below anyway (one-ULP parity, see comment)
            w1, b1 = _DenseParams(self.hidden_dim, self.kernel_init,
                                  name="fc1")(x.shape[-1])
            w2, b2 = _DenseParams(self.out_dim, self.kernel_init,
                                  name="fc2")(self.hidden_dim)
            from ssl4gie_tpu.kernels.fused_mlp import fused_mlp
            return fused_mlp(x.astype(self.dtype), w1.astype(self.dtype),
                             b1.astype(self.dtype), w2.astype(self.dtype),
                             b2.astype(self.dtype), True)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     kernel_init=self.kernel_init, name="fc1")(x)
        # exact erf GELU in f32 (reference timm parity, converter tests at
        # 2e-4); tanh GELU under bf16 compute, where the two differ by at most
        # one bf16 ULP (max |diff| 4.7e-4 in f32; 40% of values shift one ULP)
        # and the erf rational costs ~7 ms/step of the ViT-B v5e train step
        # (measured 982 -> 1038 img/s).
        return _GeluDense(self.out_dim,
                          approximate=self.dtype == jnp.bfloat16,
                          dtype=self.dtype, kernel_init=self.kernel_init,
                          name="fc2")(x)


def tp_constrain(x, axes):
    """Pin an activation's layout under the ambient training mesh.

    Two GSPMD propagation failure modes meet here, both surfacing as
    "[SPMD] Involuntary full rematerialization" (replicate + repartition) on
    every block's softmax broadcast/div/reduce:
    - under --tensor-parallel, propagation cannot move the attention
      intermediates from batch-sharded-over-everything to the head-sharded
      layout the column-sharded qkv produces; constraining them to
      P("data", "model", ...) keeps the whole attention partitioned head-wise
      with zero collectives;
    - under --fsdp, the row-sharded (over "data") qkv/proj kernels leak their
      parameter sharding into the attention activations, conflicting with the
      batch's own "data" sharding; pinning the activations batch-sharded keeps
      ZeRO's all-gathers on the WEIGHTS where they belong.
    Axis names absent from (or trivial in) the ambient mesh degrade to None,
    so the same spec serves TP, DP, and FSDP. No-op when no multi-device mesh
    is registered (single chip / tests); callers never invoke this inside
    shard_map (the Pallas dispatch seam), where constraints on manual axes are
    illegal."""
    mesh = _PALLAS_MESH
    if mesh is None or mesh.size == 1:
        return x
    axes = tuple(a if (a in mesh.axis_names and mesh.shape[a] > 1
                       and x.shape[i] % mesh.shape[a] == 0) else None
                 for i, a in enumerate(axes))
    if all(a is None for a in axes):
        # pinning fully-replicated would itself force an all-gather — and this
        # is the normal case for indivisible shapes (model.init's batch-1
        # trace, ragged eval tails)
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*axes)))


def plain_attention(q, k, v, scale: float):
    """Reference attention math ((q@k^T)*scale -> softmax -> @v,
    `Models/models.py:202-206`) as one fused XLA computation.
    q,k,v: (..., H, N, Dh)."""
    if q.ndim == 4:   # (B, H, N, Dh): batch over data, heads over model (TP)
        spec = ("data", "model", None, None)
        q = tp_constrain(q, spec)
        k = tp_constrain(k, spec)
        v = tp_constrain(v, spec)
    attn = jnp.einsum("...hnd,...hmd->...hnm", q, k) * scale
    if q.ndim == 4:
        attn = tp_constrain(attn, ("data", "model", None, None))
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    if q.ndim == 4:
        attn = tp_constrain(attn, ("data", "model", None, None))
    out = jnp.einsum("...hnm,...hmd->...hnd", attn, v)
    if q.ndim == 4:
        out = tp_constrain(out, ("data", "model", None, None))
    return out


FLASH_MIN_SEQ = 1024   # blockwise kernel for long sequences (detection)
FUSED_MIN_SEQ = 160    # packed-QKV single-block kernel for dense tasks (197)


def pallas_backend() -> str:
    """Indirection over jax.default_backend() for Pallas dispatch sites —
    tests monkeypatch THIS (patching jax.default_backend itself leaks into
    JAX internals and can trigger a real TPU-backend lookup)."""
    return jax.default_backend()


# The ambient training mesh, registered by the builders (tasks/build.py,
# ssl/pretrain.py). When set, Pallas calls shard over ITS "data" axis —
# matching the batch's actual layout — instead of an ad-hoc 1-D mesh over all
# devices (which would force reshards under a 2-D (data, model) mesh).
_PALLAS_MESH = None


def set_pallas_mesh(mesh) -> None:
    global _PALLAS_MESH
    _PALLAS_MESH = mesh if mesh is not None and "data" in mesh.axis_names \
        else None


def shard_pallas_over_batch(fn, batch_size: int, in_ndims, out_ndim: int):
    """Make a Pallas kernel call legal under a multi-device data mesh.

    Mosaic custom calls cannot be auto-partitioned by GSPMD — XLA raises
    "Mosaic kernels cannot be automatically partitioned. Please wrap the call
    in a shard_map" whenever num_devices > 1 (jax tpu_custom_call.py). On one
    device (the bench/profiling configuration) `fn` is returned unchanged; on
    a multi-device mesh the call is wrapped in shard_map over dim 0 of every
    operand (in_ndims: rank per positional operand) along the ambient mesh's
    "data" axis (replicated over any other axes), so each device runs the
    kernel on its local batch shard — exactly the manual form of the
    batch-parallel grid. Returns None if the batch does not divide the
    data-axis size (caller falls back to the plain XLA formulation)."""
    from jax.sharding import Mesh, PartitionSpec as P
    mesh = _PALLAS_MESH
    if mesh is None:
        devs = jax.devices()
        if len(devs) == 1:
            return fn
        mesh = Mesh(np.array(devs), ("data",))
    elif mesh.size == 1:
        return fn
    if batch_size % mesh.shape["data"] != 0:
        return None
    batch0 = lambda nd: P("data", *([None] * (nd - 1)))
    in_specs = tuple(batch0(nd) for nd in in_ndims)
    # check_vma=False: pallas out_shape ShapeDtypeStructs carry no varying-
    # mesh-axes annotation, which the default vma check rejects
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=batch0(out_ndim), check_vma=False)


def default_attention(q, k, v, scale: float):
    """Dispatch: Pallas flash kernel for long sequences on TPU (detection's 4,096
    global-attention tokens), plain fused XLA otherwise. Short dense sequences
    (197 tokens) never reach here on TPU — Attention routes their packed QKV
    through kernels.dense_attention without splitting heads."""
    n = q.shape[-2]
    if (n >= FLASH_MIN_SEQ and n % 256 == 0 and q.ndim == 4
            and pallas_backend() == "tpu"):
        from ssl4gie_tpu.kernels.flash_attention import flash_attention_heads
        call = shard_pallas_over_batch(
            functools.partial(flash_attention_heads, scale=scale),
            q.shape[0], (4, 4, 4), 4)
        if call is not None:
            return call(q, k, v)
    return plain_attention(q, k, v, scale)


class Attention(nn.Module):
    """Multi-head self-attention with optional non-overlapping windowing.

    Windowing (`window_size` tokens per side) replaces the reference's
    index-permutation `WindowedAttention` (`Models/models.py:155-210`) with a pure
    reshape: (B, Hg, Wg, C) -> (B*nw, ws*ws, C). Same math, no gathers — XLA keeps
    everything tiled on the MXU.
    """
    dim: int
    num_heads: int
    window_size: Optional[int] = None   # in grid units (16 for ViTDet 1024px)
    dtype: jnp.dtype = jnp.float32
    attn_fn: Optional[Callable] = None  # pluggable kernel (Pallas flash attn)
    kernel_init: Callable = TIMM_INIT

    @nn.compact
    def __call__(self, x, grid_hw: Optional[tuple] = None):
        B, N, C = x.shape
        H = self.num_heads
        Dh = C // H
        scale = Dh ** -0.5

        qkv = nn.Dense(3 * C, dtype=self.dtype, kernel_init=self.kernel_init,
                       name="qkv")(x)

        if (self.window_size is not None and self.attn_fn is None
                and pallas_backend() == "tpu"):
            # fused Pallas path: windows are carved by BlockSpec from the natural
            # grid layout — no transpose copies through HBM
            from ssl4gie_tpu.kernels.window_attention import \
                windowed_flash_attention
            gh, gw = grid_hw
            call = shard_pallas_over_batch(
                lambda g: windowed_flash_attention(g, H, self.window_size,
                                                   scale), B, (4,), 4)
            if call is not None:
                out = call(qkv.reshape(B, gh, gw, 3 * C)).reshape(B, N, C)
                return nn.Dense(C, dtype=self.dtype,
                                kernel_init=self.kernel_init, name="proj")(out)

        if (self.window_size is None and self.attn_fn is None
                and FUSED_MIN_SEQ <= N <= 512
                and pallas_backend() == "tpu"):
            # dense tasks (N=197): one Pallas program per image consumes the
            # packed (B, N, 3C) qkv — no head-split transposes, no pad/slice
            from ssl4gie_tpu.kernels.dense_attention import fused_qkv_attention
            call = shard_pallas_over_batch(
                lambda g: fused_qkv_attention(g, H, scale), B, (3,), 3)
            if call is not None:
                out = call(qkv)
                return nn.Dense(C, dtype=self.dtype,
                                kernel_init=self.kernel_init, name="proj")(out)

        if self.window_size is not None:
            gh, gw = grid_hw
            ws = self.window_size
            nh, nw = gh // ws, gw // ws
            # (B, N, 3C) -> (B*nh*nw, ws*ws, 3C)
            qkv = qkv.reshape(B, nh, ws, nw, ws, 3 * C)
            qkv = qkv.transpose(0, 1, 3, 2, 4, 5).reshape(B * nh * nw, ws * ws, 3 * C)
            Bw, Nw = qkv.shape[:2]
        else:
            Bw, Nw = B, N

        qkv = qkv.reshape(Bw, Nw, 3, H, Dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        fn = self.attn_fn or default_attention
        out = fn(q, k, v, scale)                      # (Bw, H, Nw, Dh)
        out = out.transpose(0, 2, 1, 3).reshape(Bw, Nw, C)

        if self.window_size is not None:
            gh, gw = grid_hw
            ws = self.window_size
            nh, nw = gh // ws, gw // ws
            out = out.reshape(B, nh, nw, ws, ws, C)
            out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, N, C)

        return nn.Dense(C, dtype=self.dtype, kernel_init=self.kernel_init,
                        name="proj")(out)


def drop_path(key, x, rate: float):
    """Stochastic depth on a residual branch (timm `DropPath`): per-sample
    Bernoulli keep with 1/keep rescaling (`scale_by_keep=True`, the timm
    default the MAE finetune recipe inherits via `--drop_path`,
    `Models/mae/main_finetune.py:57,229`)."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return jnp.where(mask, x / keep, jnp.zeros((), x.dtype))


class Block(nn.Module):
    """Pre-norm transformer block (timm layout: norm1/attn/norm2/mlp).

    drop_path_rate > 0 enables stochastic depth on both residual branches
    (train only; needs a "dropout" rng), like timm's `Block(drop_path=...)`
    used by the MAE finetune recipe."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    window_size: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    attn_fn: Optional[Callable] = None
    kernel_init: Callable = TIMM_INIT
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(self, x, grid_hw: Optional[tuple] = None,
                 train: bool = False):
        sd = self.drop_path_rate > 0 and train
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = Attention(self.dim, self.num_heads, window_size=self.window_size,
                      dtype=self.dtype, attn_fn=self.attn_fn,
                      kernel_init=self.kernel_init, name="attn")(h, grid_hw)
        if sd:
            h = drop_path(self.make_rng("dropout"), h, self.drop_path_rate)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        # NOTE: rematting the MLP (checkpoint_dots, recompute-GELU-in-backward)
        # was measured SLOWER end-to-end on v5e (821 vs 969 img/s) — the remat
        # boundary breaks XLA's fc1+gelu fusion — so the block stays plain.
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                kernel_init=self.kernel_init, name="mlp")(h)
        if sd:
            h = drop_path(self.make_rng("dropout"), h, self.drop_path_rate)
        return x + h


class ConvStem(nn.Module):
    """4-stage conv patchify for the MoCo v3 `vit_conv_*` variants
    (`Models/moco_v3/vits.py:75-115`, after "Early Convolutions Help
    Transformers See Better"): 4x (3x3 stride-2 conv, no bias -> BN -> ReLU)
    with channels E/8 -> E/4 -> E/2 -> E, then a 1x1 conv projection. Total
    stride 16, same output grid as the 16x16 PatchEmbed."""
    embed_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, H, W, 3) NHWC
        assert self.embed_dim % 8 == 0
        d = self.embed_dim // 8
        for l in range(4):
            x = nn.Conv(d, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"conv{l}")(x)
            # torch BatchNorm2d defaults: momentum 0.1 (flax 0.9), eps 1e-5
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name=f"bn{l}")(x)
            x = nn.relu(x)
            d *= 2
        x = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name="proj")(x)
        B, gh, gw, C = x.shape
        return x.reshape(B, gh * gw, C), (gh, gw)


class PatchEmbed(nn.Module):
    """Conv patchify (16x16 stride-16): one big MXU matmul after im2col by XLA.
    xavier-uniform over the flattened (p*p*3, D) view, like MAE/MoCo
    (`models_mae.py:74-76`)."""
    patch_size: int = 16
    embed_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3) NHWC
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    kernel_init=nn.initializers.xavier_uniform(),
                    dtype=self.dtype, name="proj")(x)
        B, gh, gw, C = x.shape
        return x.reshape(B, gh * gw, C), (gh, gw)
