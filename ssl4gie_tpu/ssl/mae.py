"""MAE (masked autoencoder) pretraining — TPU-native.

Behavioral match of the vendored `Models/mae/models_mae.py` (MaskedAutoencoderViT):
ViT-B/16 encoder on the 25% kept patches, 512-wide/8-deep decoder with mask-token
re-insertion and argsort unshuffle, per-patch MSE on masked patches with optional
per-patch pixel normalization (`forward_loss`, `models_mae.py:198-214`). Fixed 2-D
sin-cos position embeddings for both encoder and decoder (`:65-72`).

TPU design notes: masking keeps static shapes (len_keep fixed at trace time);
shuffle/unshuffle are `take_along_axis` gathers like the reference's torch.gather —
at (B, 196) scale these are cheap. The noise argsort ranks via jax.random.uniform.
The whole loss is one jitted program; encoder params transfer 1:1 into the
finetuning ViTBackbone (same module names).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ssl4gie_tpu.models.layers import Block, PatchEmbed, get_2d_sincos_pos_embed


def patchify(imgs, p: int = 16):
    """(B, H, W, 3) NHWC -> (B, L, p*p*3), matching `models_mae.patchify`
    (token pixel order: p-row, p-col, channel)."""
    B, H, W, C = imgs.shape
    h, w = H // p, W // p
    x = imgs.reshape(B, h, p, w, p, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)          # (B, h, w, p, p, C)
    return x.reshape(B, h * w, p * p * C)


def unpatchify(x, p: int = 16):
    B, L, D = x.shape
    h = w = int(L ** 0.5)
    C = D // (p * p)
    x = x.reshape(B, h, w, p, p, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, h * p, w * p, C)


def _permute_tokens(x, ids):
    """x (B, L, D) -> x[ids] (B, K, D) via a permutation one-hot matmul.

    TPU gathers cost ~11 ns/element (the take_along_axis version made the MAE
    train step gather-bound: 237 img/s); a (B, K, L) one-hot contraction runs
    on the MXU and its backward is another matmul instead of a scatter."""
    L = x.shape[1]
    onehot = (ids[..., None] == jnp.arange(L)[None, None, :]).astype(x.dtype)
    return jnp.einsum("bkl,bld->bkd", onehot, x)


def random_masking(rng, x, mask_ratio: float):
    """Per-sample shuffle by argsort of uniform noise (`models_mae.py:123-148`).
    Returns (x_masked, mask, ids_restore); mask: 0=keep, 1=removed."""
    B, L, D = x.shape
    len_keep = int(L * (1 - mask_ratio))
    noise = jax.random.uniform(rng, (B, L))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    x_masked = _permute_tokens(x, ids_keep)
    mask = jnp.ones((B, L), x.dtype).at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)   # (B, L) scalar map
    return x_masked, mask, ids_restore


# Size presets matching the reference factories (`Models/mae/models_mae.py:
# 223-250`: mae_vit_{base,large,huge}_patch{16,16,14}_dec512d8b). All share the
# 512-wide / 8-deep / 16-head decoder. SSL4GIE's published recipe uses vit_b.
MAE_SIZES = {
    "vit_b": dict(patch_size=16, embed_dim=768, depth=12, num_heads=12),
    "vit_l": dict(patch_size=16, embed_dim=1024, depth=24, num_heads=16),
    "vit_h": dict(patch_size=14, embed_dim=1280, depth=32, num_heads=16),
}


class MAE(nn.Module):
    """Encoder+decoder; returns (loss, pred, mask)."""
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    norm_pix_loss: bool = True
    mask_ratio: float = 0.75
    dtype: jnp.dtype = jnp.float32
    # pluggable attention (e.g. plain_attention under tensor parallelism,
    # where the Pallas kernels' custom calls have no SPMD partitioning rule)
    attn_fn: Optional[Callable] = None
    # activation rematerialization per block (jax.checkpoint): trades ~30%
    # recompute for O(depth) -> O(1) residual memory — the lever that fits
    # vit_l/vit_h pretraining batches in HBM. Param tree is unchanged, so
    # checkpoints transfer 1:1. Default off: on ViT-B the remat boundary was
    # measured slower (breaks XLA's fc1+gelu fusion, see models/layers.py).
    remat: bool = False

    @nn.compact
    def __call__(self, imgs, train: bool = True, rng: Optional[jax.Array] = None):
        if rng is None:
            rng = self.make_rng("mask")
        grid = self.img_size // self.patch_size
        L = grid * grid

        pos_embed = jnp.asarray(get_2d_sincos_pos_embed(
            self.embed_dim, grid, cls_token=True))[None]          # fixed, not learned
        dec_pos_embed = jnp.asarray(get_2d_sincos_pos_embed(
            self.decoder_embed_dim, grid, cls_token=True))[None]

        # ---- encoder (module names match ViTBackbone for 1:1 weight transfer)
        x, _ = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype,
                          name="patch_embed")(imgs)
        x = x + pos_embed[:, 1:].astype(self.dtype)
        x, mask, ids_restore = random_masking(rng, x, self.mask_ratio)

        cls_token = self.param("cls_token", nn.initializers.normal(0.02),
                               (1, 1, self.embed_dim))
        cls = (cls_token + pos_embed[:, :1]).astype(self.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (x.shape[0], 1, self.embed_dim)),
                             x], axis=1)
        xavier = nn.initializers.xavier_uniform()   # MAE inits all Linears xavier
        Blk = nn.remat(Block) if self.remat else Block
        for i in range(self.depth):
            x = Blk(self.embed_dim, self.num_heads, self.mlp_ratio,
                    dtype=self.dtype, kernel_init=xavier, attn_fn=self.attn_fn,
                    name=f"blocks_{i}")(x)
        latent = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)

        # ---- decoder (`forward_decoder`, models_mae.py:172-196)
        y = nn.Dense(self.decoder_embed_dim, dtype=self.dtype,
                     name="decoder_embed")(latent)
        mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                (1, 1, self.decoder_embed_dim))
        B = y.shape[0]
        n_masked = L + 1 - y.shape[1]
        mask_tokens = jnp.broadcast_to(mask_token.astype(self.dtype),
                                       (B, n_masked, self.decoder_embed_dim))
        y_ = jnp.concatenate([y[:, 1:], mask_tokens], axis=1)
        y_ = _permute_tokens(y_, ids_restore)                          # unshuffle
        y = jnp.concatenate([y[:, :1], y_], axis=1)
        y = y + dec_pos_embed.astype(self.dtype)
        for i in range(self.decoder_depth):
            y = Blk(self.decoder_embed_dim, self.decoder_num_heads, self.mlp_ratio,
                    dtype=self.dtype, kernel_init=xavier, attn_fn=self.attn_fn,
                    name=f"decoder_blocks_{i}")(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="decoder_norm")(y)
        pred = nn.Dense(self.patch_size ** 2 * 3, dtype=jnp.float32,
                        name="decoder_pred")(y.astype(jnp.float32))
        pred = pred[:, 1:]

        # ---- loss (`forward_loss`, models_mae.py:198-214)
        target = patchify(imgs.astype(jnp.float32), self.patch_size)
        if self.norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True)
            # torch .var() is unbiased (ddof=1) — parity matters at p*p*3=768 dims
            var = target.var(axis=-1, keepdims=True, ddof=1)
            target = (target - mean) / (var + 1e-6) ** 0.5
        loss = ((pred - target) ** 2).mean(axis=-1)
        mask_f = mask.astype(jnp.float32)
        loss = (loss * mask_f).sum() / mask_f.sum()
        return loss, pred, mask
