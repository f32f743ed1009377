"""End-to-end checkpoint-converter fidelity: a full timm-named ViT-B-style torch
state dict (small dims for speed) is converted to Flax params and the complete
forward pass (conv patchify + cls/pos + blocks + final norm + cls-token output)
must match an independent torch-ops implementation within 1e-4 (SURVEY §4 (c))."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ssl4gie_tpu.convert.torch_names import vit_torch_to_flax
from ssl4gie_tpu.models.vit import ViTBackbone

C, DEPTH, HEADS, IMG, P = 64, 3, 4, 224, 16  # grid 14x14 + cls = 197 tokens
# (the backbone stores pos_embed at the pretraining 14x14 grid — using 224px keeps
# the forward interpolation-free for exact parity)


def make_torch_sd(rng):
    sd = {}
    sd["patch_embed.proj.weight"] = rng.normal(0, 0.05, (C, 3, P, P)).astype(np.float32)
    sd["patch_embed.proj.bias"] = rng.normal(0, 0.02, C).astype(np.float32)
    sd["cls_token"] = rng.normal(0, 0.02, (1, 1, C)).astype(np.float32)
    grid = IMG // P
    sd["pos_embed"] = rng.normal(0, 0.02, (1, grid * grid + 1, C)).astype(np.float32)
    for i in range(DEPTH):
        pre = f"blocks.{i}."
        sd[pre + "norm1.weight"] = rng.normal(1, 0.05, C).astype(np.float32)
        sd[pre + "norm1.bias"] = rng.normal(0, 0.05, C).astype(np.float32)
        sd[pre + "attn.qkv.weight"] = rng.normal(0, 0.05, (3 * C, C)).astype(np.float32)
        sd[pre + "attn.qkv.bias"] = rng.normal(0, 0.02, 3 * C).astype(np.float32)
        sd[pre + "attn.proj.weight"] = rng.normal(0, 0.05, (C, C)).astype(np.float32)
        sd[pre + "attn.proj.bias"] = rng.normal(0, 0.02, C).astype(np.float32)
        sd[pre + "norm2.weight"] = rng.normal(1, 0.05, C).astype(np.float32)
        sd[pre + "norm2.bias"] = rng.normal(0, 0.05, C).astype(np.float32)
        sd[pre + "mlp.fc1.weight"] = rng.normal(0, 0.05, (4 * C, C)).astype(np.float32)
        sd[pre + "mlp.fc1.bias"] = rng.normal(0, 0.02, 4 * C).astype(np.float32)
        sd[pre + "mlp.fc2.weight"] = rng.normal(0, 0.05, (C, 4 * C)).astype(np.float32)
        sd[pre + "mlp.fc2.bias"] = rng.normal(0, 0.02, C).astype(np.float32)
    sd["norm.weight"] = rng.normal(1, 0.05, C).astype(np.float32)
    sd["norm.bias"] = rng.normal(0, 0.05, C).astype(np.float32)
    return sd


def torch_vit_forward(sd, img_nchw):
    t = lambda k: torch.tensor(sd[k])
    x = F.conv2d(torch.tensor(img_nchw), t("patch_embed.proj.weight"),
                 t("patch_embed.proj.bias"), stride=P)
    B, c, gh, gw = x.shape
    x = x.flatten(2).transpose(1, 2)                      # (B, N, C)
    cls = t("cls_token").expand(B, -1, -1)
    x = torch.cat([cls, x], dim=1) + t("pos_embed")
    for i in range(DEPTH):
        pre = f"blocks.{i}."
        h = F.layer_norm(x, (C,), t(pre + "norm1.weight"), t(pre + "norm1.bias"),
                         eps=1e-6)
        qkv = h @ t(pre + "attn.qkv.weight").T + t(pre + "attn.qkv.bias")
        N = h.shape[1]
        qkv = qkv.reshape(B, N, 3, HEADS, C // HEADS).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = (q @ k.transpose(-2, -1)) * (C // HEADS) ** -0.5
        a = a.softmax(dim=-1)
        h = (a @ v).transpose(1, 2).reshape(B, N, C)
        h = h @ t(pre + "attn.proj.weight").T + t(pre + "attn.proj.bias")
        x = x + h
        h = F.layer_norm(x, (C,), t(pre + "norm2.weight"), t(pre + "norm2.bias"),
                         eps=1e-6)
        h = F.gelu(h @ t(pre + "mlp.fc1.weight").T + t(pre + "mlp.fc1.bias"))
        h = h @ t(pre + "mlp.fc2.weight").T + t(pre + "mlp.fc2.bias")
        x = x + h
    x = F.layer_norm(x, (C,), t("norm.weight"), t("norm.bias"), eps=1e-6)
    return x[:, 0].numpy()                                # cls token


def test_full_vit_converter_forward_parity():
    rng = np.random.default_rng(0)
    sd = make_torch_sd(rng)
    img = rng.normal(0, 1, (2, IMG, IMG, 3)).astype(np.float32)

    ref = torch_vit_forward(sd, img.transpose(0, 3, 1, 2))

    model = ViTBackbone(img_size=IMG, patch_size=P, embed_dim=C, depth=DEPTH,
                        num_heads=HEADS, mode="pooled", out_token="cls")
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img))
    update, n = vit_torch_to_flax({k: torch.tensor(v) for k, v in sd.items()},
                                  depth=DEPTH)
    assert n == 4 + DEPTH * 12 + 2
    # base-grid pos embed in our module is 14x14+1; for this test grid (2x2) we
    # bypass by building params directly from the update
    from ssl4gie_tpu.convert.loaders import _merge, jax_to_mutable
    params = jax_to_mutable(dict(variables["params"]))
    n_merged = _merge(params, update)
    assert n_merged == n
    out = model.apply({"params": params}, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)
