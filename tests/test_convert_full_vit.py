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


def test_global_pool_fc_norm_forward_parity():
    """MAE finetune recipe (`Models/mae/models_vit.py:20-53`): pre-norm mean
    over patch tokens + a separate fc_norm (the final `norm` is deleted)."""
    rng = np.random.default_rng(1)
    sd = make_torch_sd(rng)
    del sd["norm.weight"], sd["norm.bias"]
    sd["fc_norm.weight"] = rng.normal(1, 0.05, C).astype(np.float32)
    sd["fc_norm.bias"] = rng.normal(0, 0.05, C).astype(np.float32)
    img = rng.normal(0, 1, (2, IMG, IMG, 3)).astype(np.float32)

    # torch forward: blocks as in torch_vit_forward but global_pool output
    t = lambda k: torch.tensor(sd[k])
    x = F.conv2d(torch.tensor(img.transpose(0, 3, 1, 2)),
                 t("patch_embed.proj.weight"), t("patch_embed.proj.bias"),
                 stride=P)
    B = x.shape[0]
    x = x.flatten(2).transpose(1, 2)
    x = torch.cat([t("cls_token").expand(B, -1, -1), x], dim=1) + t("pos_embed")
    for i in range(DEPTH):
        x = _torch_block(sd, f"blocks.{i}.", x)
    pooled = x[:, 1:, :].mean(dim=1)
    ref = F.layer_norm(pooled, (C,), t("fc_norm.weight"), t("fc_norm.bias"),
                       eps=1e-6).numpy()

    model = ViTBackbone(img_size=IMG, patch_size=P, embed_dim=C, depth=DEPTH,
                        num_heads=HEADS, mode="pooled", out_token="global_pool")
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img))
    assert "norm" not in variables["params"]          # del self.norm parity
    assert "fc_norm" in variables["params"]
    update, n = vit_torch_to_flax({k: torch.tensor(v) for k, v in sd.items()},
                                  depth=DEPTH)
    from ssl4gie_tpu.convert.loaders import _merge, jax_to_mutable
    params = jax_to_mutable(dict(variables["params"]))
    assert _merge(params, update) == n
    out = model.apply({"params": params}, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def _torch_block(sd, pre, x):
    t = lambda k: torch.tensor(sd[k])
    B, N, c = x.shape
    h = F.layer_norm(x, (c,), t(pre + "norm1.weight"), t(pre + "norm1.bias"),
                     eps=1e-6)
    qkv = h @ t(pre + "attn.qkv.weight").T + t(pre + "attn.qkv.bias")
    qkv = qkv.reshape(B, N, 3, HEADS, c // HEADS).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    a = ((q @ k.transpose(-2, -1)) * (c // HEADS) ** -0.5).softmax(dim=-1)
    h = (a @ v).transpose(1, 2).reshape(B, N, c)
    h = h @ t(pre + "attn.proj.weight").T + t(pre + "attn.proj.bias")
    x = x + h
    h = F.layer_norm(x, (c,), t(pre + "norm2.weight"), t(pre + "norm2.bias"),
                     eps=1e-6)
    h = F.gelu(h @ t(pre + "mlp.fc1.weight").T + t(pre + "mlp.fc1.bias"))
    return x + (h @ t(pre + "mlp.fc2.weight").T + t(pre + "mlp.fc2.bias"))


def test_convstem_converter_forward_parity():
    """MoCo v3 vit_conv_* stem (`Models/moco_v3/vits.py:75-115`): 4x (3x3/s2
    conv -> BN -> ReLU) + 1x1 proj, converted with running stats, eval mode."""
    rng = np.random.default_rng(2)
    E = 64                                            # divisible by 8
    sd = {}
    dims = [3, E // 8, E // 4, E // 2, E]
    for l, idx in enumerate((0, 3, 6, 9)):
        sd[f"patch_embed.proj.{idx}.weight"] = rng.normal(
            0, 0.1, (dims[l + 1], dims[l], 3, 3)).astype(np.float32)
        sd[f"patch_embed.proj.{idx+1}.weight"] = rng.normal(
            1, 0.05, dims[l + 1]).astype(np.float32)
        sd[f"patch_embed.proj.{idx+1}.bias"] = rng.normal(
            0, 0.05, dims[l + 1]).astype(np.float32)
        sd[f"patch_embed.proj.{idx+1}.running_mean"] = rng.normal(
            0, 0.05, dims[l + 1]).astype(np.float32)
        sd[f"patch_embed.proj.{idx+1}.running_var"] = rng.uniform(
            0.5, 1.5, dims[l + 1]).astype(np.float32)
    sd["patch_embed.proj.12.weight"] = rng.normal(0, 0.1, (E, E, 1, 1)).astype(
        np.float32)
    sd["patch_embed.proj.12.bias"] = rng.normal(0, 0.02, E).astype(np.float32)
    img = rng.normal(0, 1, (2, 224, 224, 3)).astype(np.float32)

    x = torch.tensor(img.transpose(0, 3, 1, 2))
    for l, idx in enumerate((0, 3, 6, 9)):
        x = F.conv2d(x, torch.tensor(sd[f"patch_embed.proj.{idx}.weight"]),
                     None, stride=2, padding=1)
        x = F.batch_norm(x, torch.tensor(sd[f"patch_embed.proj.{idx+1}.running_mean"]),
                         torch.tensor(sd[f"patch_embed.proj.{idx+1}.running_var"]),
                         torch.tensor(sd[f"patch_embed.proj.{idx+1}.weight"]),
                         torch.tensor(sd[f"patch_embed.proj.{idx+1}.bias"]),
                         training=False, eps=1e-5)
        x = F.relu(x)
    x = F.conv2d(x, torch.tensor(sd["patch_embed.proj.12.weight"]),
                 torch.tensor(sd["patch_embed.proj.12.bias"]))
    ref = x.flatten(2).transpose(1, 2).numpy()        # (B, 196, E)

    from ssl4gie_tpu.convert.loaders import _merge, jax_to_mutable
    from ssl4gie_tpu.convert.torch_names import convstem_batch_stats
    from ssl4gie_tpu.models.layers import ConvStem
    stem = ConvStem(embed_dim=E)
    variables = stem.init(jax.random.PRNGKey(0), jnp.asarray(img), False)
    update, n = vit_torch_to_flax({k: torch.tensor(v) for k, v in sd.items()},
                                  depth=0)
    params = jax_to_mutable(dict(variables["params"]))
    assert _merge(params["patch_embed"]
                  if "patch_embed" in params else params,
                  update["patch_embed"]) == n
    stats_up, n_stats = convstem_batch_stats(sd)
    assert n_stats == 8
    stats = jax_to_mutable(dict(variables["batch_stats"]))
    assert _merge(stats, stats_up["patch_embed"]) == n_stats
    out, (gh, gw) = stem.apply({"params": params, "batch_stats": stats},
                               jnp.asarray(img), False)
    assert (gh, gw) == (14, 14)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_moco_vit_preset_param_counts():
    """vit_s / vit_conv_s / vit_conv_b wiring (`vits.py:117-144`): parameter
    counts computed from the reference module structure."""
    from ssl4gie_tpu.ssl.moco_v3 import VIT_PRESETS

    def block_params(E):
        return (2 * E + 3 * E * E + 3 * E          # norm1 + qkv
                + E * E + E + 2 * E                # proj + norm2
                + E * 4 * E + 4 * E + 4 * E * E + E)   # fc1 + fc2

    def stem_params(E, stem):
        if stem == "patch":
            return 16 * 16 * 3 * E + E
        dims = [3, E // 8, E // 4, E // 2, E]
        conv = sum(dims[l] * dims[l + 1] * 9 for l in range(4))
        bn = sum(2 * d for d in dims[1:])
        return conv + bn + E * E + E               # + 1x1 proj

    for arch, p in VIT_PRESETS.items():
        E, D = p["embed_dim"], p["depth"]
        expected = (stem_params(E, p["stem"]) + E       # + cls_token
                    + (14 * 14 + 1) * E                 # pos_embed
                    + D * block_params(E) + 2 * E)      # + final norm
        model = ViTBackbone(mode="pooled", out_token="cls",
                            pos_embed_type="sincos", **p)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32))
        count = sum(int(np.prod(v.shape)) for v in
                    jax.tree_util.tree_leaves(variables["params"]))
        assert count == expected, (arch, count, expected)
