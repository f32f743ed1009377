"""MoCo v3 pretraining — TPU-native.

Behavioral match of the vendored `Models/moco_v3/moco/builder.py`:
base + momentum encoders (ViT-B/16 with fixed sin-cos pos embed and stop-grad patch
embed re-enabled, or ResNet50), SimCLR-style projector MLP (3-layer for ViT, 2-layer
for RN50, BatchNorm between layers + affine-free last BN), 2-layer predictor, EMA
momentum update (`:57-61`), and the symmetric InfoNCE loss (`contrastive_loss`,
`:63-73`).

TPU redesign of the distributed parts: the reference's `concat_all_gather` +
rank-offset labels (`:126-137`) collapse into a *global-batch* einsum under GSPMD —
with the batch sharded over the mesh's data axis, `q @ k.T` over the full batch IS
the all-gathered logits matrix and `labels = arange(N_global)`; XLA inserts the
collectives over ICI. BatchNorm in the MLP heads likewise gets SyncBN semantics for
free (global-batch statistics).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ssl4gie_tpu.models.resnet import ResNet50
from ssl4gie_tpu.models.vit import ViTBackbone


class MLPHead(nn.Module):
    """`_build_mlp` (`builder.py:36-52`): Linear(no bias) [+BN+ReLU]*; last layer
    optionally followed by affine-free BN."""
    num_layers: int
    mlp_dim: int
    out_dim: int
    last_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for l in range(self.num_layers):
            d2 = self.out_dim if l == self.num_layers - 1 else self.mlp_dim
            x = nn.Dense(d2, use_bias=False, dtype=self.dtype, name=f"fc{l}")(x)
            if l < self.num_layers - 1:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype, name=f"bn{l}")(x)
                x = nn.relu(x)
            elif self.last_bn:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, use_bias=False, use_scale=False,
                                 dtype=self.dtype, name=f"bn{l}")(x)
        return x


# MoCo v3 ViT size presets (`Models/moco_v3/vits.py:117-144`): the conv-stem
# variants drop one transformer block ("minus one ViT block"); vit_small keeps
# 12 heads at dim 384 (head_dim 32), unlike timm's 6-head ViT-S.
VIT_PRESETS = {
    "vit_b":      dict(embed_dim=768, depth=12, num_heads=12, stem="patch"),
    "vit_s":      dict(embed_dim=384, depth=12, num_heads=12, stem="patch"),
    "vit_conv_s": dict(embed_dim=384, depth=11, num_heads=12, stem="conv"),
    "vit_conv_b": dict(embed_dim=768, depth=11, num_heads=12, stem="conv"),
}


class MoCoEncoder(nn.Module):
    """backbone + projector. Same param naming as the finetune backbones so the
    pretrained encoder transfers 1:1 (projector dropped, like `convert_to_deit`).

    MoCo v3's --stop-grad-conv1 (random frozen patch projection, `vits.py:49-51`)
    is realized in the pretrain driver as an optimizer mask zeroing the
    backbone/patch_embed updates (ssl/pretrain.py); the finetune side re-enables
    those grads like the reference (`Models/models.py:510-511`) simply by training
    them.
    """
    arch: str = "vit_b"               # vit_b | vit_s | vit_conv_s | vit_conv_b | resnet50
    dim: int = 256
    mlp_dim: int = 4096
    dtype: jnp.dtype = jnp.float32
    attn_fn: Optional[Callable] = None   # plain_attention under TP

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.arch in VIT_PRESETS:
            feat = ViTBackbone(mode="pooled", out_token="cls",
                               pos_embed_type="sincos", dtype=self.dtype,
                               attn_fn=self.attn_fn,
                               **VIT_PRESETS[self.arch],
                               name="backbone")(x, train)
            proj = MLPHead(3, self.mlp_dim, self.dim, last_bn=True,
                           dtype=self.dtype, name="projector")
        else:
            feat = ResNet50(mode="pooled", dtype=self.dtype, name="backbone")(x, train)
            proj = MLPHead(2, self.mlp_dim, self.dim, last_bn=True,
                           dtype=self.dtype, name="projector")
        return proj(feat.astype(self.dtype), train)


class MoCoPredictor(nn.Module):
    dim: int = 256
    mlp_dim: int = 4096
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return MLPHead(2, self.mlp_dim, self.dim, last_bn=True, dtype=self.dtype,
                       name="predictor")(x, train)


def contrastive_loss(q, k, temperature: float = 1.0):
    """Symmetric-half InfoNCE over the global batch (`builder.py:63-73`)."""
    q = q / (jnp.linalg.norm(q, axis=1, keepdims=True) + 1e-12)
    k = k / (jnp.linalg.norm(k, axis=1, keepdims=True) + 1e-12)
    logits = jnp.einsum("nc,mc->nm", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / temperature
    n = logits.shape[0]
    labels = jnp.arange(n)
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    return loss * 2.0 * temperature


class MoCoState(struct.PyTreeNode):
    """Train state carrying base params, EMA momentum params, and both BN stats."""
    step: jnp.ndarray
    params: Any                      # {'encoder': ..., 'predictor': ...}
    momentum_params: Any             # EMA copy of params['encoder']
    batch_stats: Any                 # {'encoder': ..., 'predictor': ...}
    momentum_batch_stats: Any
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def make_moco_train_step(encoder: MoCoEncoder, predictor: MoCoPredictor,
                         temperature: float = 0.2):
    """Returns jitted (state, x1, x2, momentum) -> (state, metrics).
    x1/x2: the two augmented views (global batch, sharded over data). The LR
    schedule lives inside the optimizer (optax schedule on state.step); the MoCo
    momentum m is the host-computed per-iteration cosine (`main_moco.py:431-434`)."""

    def apply_enc(params, stats, x, train):
        out, mut = encoder.apply({"params": params, "batch_stats": stats}, x,
                                 train=train, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    def train_step(state: MoCoState, x1, x2, m):
        # EMA momentum update BEFORE key computation (`builder.py:90`)
        new_mom = jax.tree_util.tree_map(
            lambda pm, pb: pm * m + pb.astype(pm.dtype) * (1.0 - m),
            state.momentum_params, state.params["encoder"])

        k1, mom_stats = apply_enc(new_mom, state.momentum_batch_stats, x1, True)
        k2, mom_stats = apply_enc(new_mom, mom_stats, x2, True)
        k1 = jax.lax.stop_gradient(k1)
        k2 = jax.lax.stop_gradient(k2)

        def loss_fn(params):
            q1, enc_stats = apply_enc(params["encoder"],
                                      state.batch_stats["encoder"], x1, True)
            q2, enc_stats = apply_enc(params["encoder"], enc_stats, x2, True)
            pq1, pred_stats = predictor.apply(
                {"params": params["predictor"],
                 "batch_stats": state.batch_stats["predictor"]},
                q1, train=True, mutable=["batch_stats"])
            pq2, pred_stats2 = predictor.apply(
                {"params": params["predictor"], "batch_stats": pred_stats["batch_stats"]},
                q2, train=True, mutable=["batch_stats"])
            loss = (contrastive_loss(pq1, k2, temperature)
                    + contrastive_loss(pq2, k1, temperature))
            return loss, {"encoder": enc_stats,
                          "predictor": pred_stats2["batch_stats"]}

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  momentum_params=new_mom,
                                  batch_stats=new_stats,
                                  momentum_batch_stats=mom_stats,
                                  opt_state=new_opt)
        # grad_norm reported like the reference's NativeScalerWithGradNormCount
        # (`Models/mae/util/misc.py:251-292`; main_moco.py logs through it too)
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return jax.jit(train_step, donate_argnums=(0,))
