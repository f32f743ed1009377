"""ViT-B/16 backbone with head / dense / det modes.

One Flax module replaces the reference's three near-identical wrappers
(`VisionTransformer_from_Any` `Models/models.py:262-357`, `ViT_from_MAE` `:360-475`,
`ViT_from_MoCoV3` `:478-578`): the pretraining-provenance differences (learned vs fixed
sin-cos position embeddings, projector heads) are collapsed into init + the checkpoint
converter (`ssl4gie_tpu/convert`).

Modes:
- pooled: cls token or spatial mean (`out_token`), optional linear head
  (`Models/models.py:349-356`).
- dense:  tap token sequences after blocks 2,5,8,11 for the DPT decoder
  (`Models/models.py:332-337`).
- det:    no cls token; 1024-px input -> 64x64 grid; bilinear pos-embed interpolation
  14x14 -> 64x64; windowed (16x16) attention in blocks 0,1,3,4,6,7,9,10 and global
  attention in 2,5,8,11; returns the final (B, 64, 64, C) feature map for the FPN
  (`Models/models.py:282-285,306-323`).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ssl4gie_tpu.models.layers import (Attention, Block, ConvStem, Mlp,
                                       PatchEmbed, get_2d_sincos_pos_embed,
                                       interpolate_pos_embed)

DENSE_TAPS = (2, 5, 8, 11)
GLOBAL_ATTN_BLOCKS = (2, 5, 8, 11)   # det mode: the rest are 16x16-windowed
DET_WINDOW = 16


class ViTBackbone(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    mode: str = "pooled"               # pooled | dense | det
    # pooled-mode output: cls | spatial (post-norm patch mean) | global_pool
    # (MAE finetune recipe: PRE-norm patch mean + separate fc_norm,
    #  `Models/mae/models_vit.py:20-53` — the final `norm` is deleted there)
    out_token: str = "cls"
    pos_embed_type: str = "learned"    # learned | sincos (MoCo v3 / MAE)
    stem: str = "patch"                # patch | conv (MoCo v3 vit_conv_*)
    dense_taps: Sequence[int] = DENSE_TAPS
    dtype: jnp.dtype = jnp.float32
    attn_fn: Optional[Callable] = None  # pluggable attention kernel
    # stochastic depth: per-block rates linspace(0, rate, depth) like timm
    # (`Models/mae/main_finetune.py:229` -> models_vit drop_path_rate)
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        # `train` only drives the ConvStem BatchNorm; the reference ViT configs
        # have no dropout.
        det = self.mode == "det"
        grid = self.img_size // self.patch_size

        if self.stem == "conv":
            x, (gh, gw) = ConvStem(self.embed_dim, dtype=self.dtype,
                                   name="patch_embed")(x, train)
        else:
            x, (gh, gw) = PatchEmbed(self.patch_size, self.embed_dim,
                                     dtype=self.dtype, name="patch_embed")(x)
        B, N, C = x.shape

        # Position embedding always stored at the pretraining grid (14x14 + cls) so
        # checkpoints load unchanged; det interpolates at forward time like the
        # reference (`Models/models.py:310-323`).
        base_grid = 14
        if self.pos_embed_type == "sincos":
            init = lambda key, shape, dtype=jnp.float32: jnp.asarray(
                get_2d_sincos_pos_embed(self.embed_dim, base_grid, cls_token=True)
            )[None]
            pos_embed = self.param("pos_embed", init,
                                   (1, base_grid * base_grid + 1, self.embed_dim))
        else:
            pos_embed = self.param(
                "pos_embed", nn.initializers.truncated_normal(0.02),
                (1, base_grid * base_grid + 1, self.embed_dim))

        if det:
            pe = interpolate_pos_embed(pos_embed.astype(jnp.float32), base_grid, gh,
                                       has_cls=True, method="bilinear")
            x = x + pe[:, 1:].astype(self.dtype)   # cls dropped (`models.py:307`)
        else:
            cls_token = self.param("cls_token", nn.initializers.zeros,
                                   (1, 1, self.embed_dim))
            cls = jnp.broadcast_to(cls_token.astype(self.dtype), (B, 1, C))
            x = jnp.concatenate([cls, x], axis=1)
            if (gh, gw) != (base_grid, base_grid):
                pe = interpolate_pos_embed(pos_embed.astype(jnp.float32), base_grid,
                                           gh, has_cls=True, method="bilinear")
            else:
                pe = pos_embed
            x = x + pe.astype(self.dtype)

        taps = []
        for i in range(self.depth):
            window = DET_WINDOW if (det and i not in GLOBAL_ATTN_BLOCKS) else None
            dpr = self.drop_path_rate * i / max(self.depth - 1, 1)
            x = Block(self.embed_dim, self.num_heads, self.mlp_ratio,
                      window_size=window, dtype=self.dtype, attn_fn=self.attn_fn,
                      drop_path_rate=dpr,
                      name=f"blocks_{i}")(x, (gh, gw), train=train)
            if self.mode == "dense" and i in self.dense_taps:
                taps.append(x)

        if self.mode == "dense":
            return taps                      # list of (B, 1+N, C), cls included; no norm

        if self.mode == "pooled" and self.out_token == "global_pool":
            # pre-norm patch-token mean + fc_norm; the final `norm` layer is
            # never created, matching `models_vit.py:31` (`del self.norm`)
            x = jnp.mean(x[:, 1:], axis=1)
            return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                name="fc_norm")(x)

        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if det:
            # norm IS applied before the FPN (`models.py:336` det path returns norm(x))
            return x.reshape(B, gh, gw, C)
        if self.out_token == "spatial":
            return jnp.mean(x[:, 1:], axis=1)
        return x[:, 0]


class ViTClassifier(nn.Module):
    """ViT backbone + linear head (`lin_head`, `Models/models.py:295,349-356`).

    probe_bn: the MAE linear-probe "BN-before-head" hack — a non-affine
    BatchNorm1d(eps=1e-6) over the pooled features (`main_linprobe.py:221-222`).
    Stats are global-batch under GSPMD, i.e. SyncBN, like the DDP reference."""
    num_classes: int
    out_token: str = "cls"
    pos_embed_type: str = "learned"
    img_size: int = 224
    dtype: jnp.dtype = jnp.float32
    attn_fn: Optional[Callable] = None
    probe_bn: bool = False
    drop_path_rate: float = 0.0    # MAE finetune recipe --drop_path (0.1)
    # backbone size knobs (ViT-B defaults; the dryrun uses a shallow variant)
    depth: int = 12
    embed_dim: int = 768
    num_heads: int = 12

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ViTBackbone(img_size=self.img_size, mode="pooled",
                           out_token=self.out_token,
                           pos_embed_type=self.pos_embed_type, dtype=self.dtype,
                           attn_fn=self.attn_fn,
                           drop_path_rate=self.drop_path_rate,
                           depth=self.depth, embed_dim=self.embed_dim,
                           num_heads=self.num_heads,
                           name="backbone")(x, train)
        feat = feat.astype(jnp.float32)
        if self.probe_bn:
            feat = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-6, use_bias=False, use_scale=False,
                                name="head_bn")(feat)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="lin_head")(
            feat)
