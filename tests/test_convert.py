"""Checkpoint-converter tests: torch-layout state dicts -> Flax params, with
numerical forward parity of a transformer block against an independent torch
implementation of the timm block semantics (validates qkv packing order, GELU type,
LayerNorm eps, scale)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ssl4gie_tpu.convert.torch_names import (resnet_torch_to_flax, strip_prefixes,
                                             vit_torch_to_flax)
from ssl4gie_tpu.models.layers import Block


def _torch_block_forward(x, w, num_heads):
    """timm Block semantics in raw torch ops (pre-norm, exact GELU, eps=1e-6)."""
    import torch.nn.functional as F
    t = torch.tensor
    h = F.layer_norm(x, (x.shape[-1],), t(w["norm1.weight"]), t(w["norm1.bias"]),
                     eps=1e-6)
    B, N, C = h.shape
    qkv = h @ t(w["attn.qkv.weight"]).T + t(w["attn.qkv.bias"])
    qkv = qkv.reshape(B, N, 3, num_heads, C // num_heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q @ k.transpose(-2, -1)) * (C // num_heads) ** -0.5
    attn = attn.softmax(dim=-1)
    h = (attn @ v).transpose(1, 2).reshape(B, N, C)
    h = h @ t(w["attn.proj.weight"]).T + t(w["attn.proj.bias"])
    x = x + h
    h = F.layer_norm(x, (x.shape[-1],), t(w["norm2.weight"]), t(w["norm2.bias"]),
                     eps=1e-6)
    h = h @ t(w["mlp.fc1.weight"]).T + t(w["mlp.fc1.bias"])
    h = F.gelu(h)
    h = h @ t(w["mlp.fc2.weight"]).T + t(w["mlp.fc2.bias"])
    return x + h


def test_block_forward_parity_with_torch():
    rng = np.random.default_rng(0)
    C, H, N, B = 64, 4, 10, 2
    w = {
        "norm1.weight": rng.normal(1, 0.1, C).astype(np.float32),
        "norm1.bias": rng.normal(0, 0.1, C).astype(np.float32),
        "attn.qkv.weight": rng.normal(0, 0.05, (3 * C, C)).astype(np.float32),
        "attn.qkv.bias": rng.normal(0, 0.05, 3 * C).astype(np.float32),
        "attn.proj.weight": rng.normal(0, 0.05, (C, C)).astype(np.float32),
        "attn.proj.bias": rng.normal(0, 0.05, C).astype(np.float32),
        "norm2.weight": rng.normal(1, 0.1, C).astype(np.float32),
        "norm2.bias": rng.normal(0, 0.1, C).astype(np.float32),
        "mlp.fc1.weight": rng.normal(0, 0.05, (4 * C, C)).astype(np.float32),
        "mlp.fc1.bias": rng.normal(0, 0.05, 4 * C).astype(np.float32),
        "mlp.fc2.weight": rng.normal(0, 0.05, (C, 4 * C)).astype(np.float32),
        "mlp.fc2.bias": rng.normal(0, 0.05, C).astype(np.float32),
    }
    x = rng.normal(0, 1, (B, N, C)).astype(np.float32)

    ref = _torch_block_forward(torch.tensor(x), w, H).numpy()

    sd = {f"blocks.0.{k}": torch.tensor(v) for k, v in w.items()}
    update, n = vit_torch_to_flax(sd, depth=1)
    assert n == 12

    m = Block(C, H)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree_util.tree_map(lambda a: a, variables["params"])
    params = {**update["blocks_0"]}
    ours = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_strip_prefixes():
    sd = {"module.base_encoder.patch_embed.proj.weight": 1,
          "module.base_encoder.head.weight": 2}
    out = strip_prefixes(sd)
    assert "patch_embed.proj.weight" in out and "head.weight" in out
    wrapped = {"model": {"pos_embed": 3}}
    assert "pos_embed" in strip_prefixes(wrapped)


def test_resnet_conversion_covers_full_model():
    """Build a torch-layout RN50 sd with correct shapes and check every conv/bn in our
    Flax tree is covered and shape-compatible."""
    from ssl4gie_tpu.models.resnet import ResNet50
    m = ResNet50(mode="pooled")
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    sd = {}
    def add_conv(name, o, i, k):
        sd[name + ".weight"] = torch.zeros(o, i, k, k)
    def add_bn(name, c):
        for suf, val in [("weight", torch.ones(c)), ("bias", torch.zeros(c)),
                         ("running_mean", torch.zeros(c)),
                         ("running_var", torch.ones(c))]:
            sd[f"{name}.{suf}"] = val

    add_conv("conv1", 64, 3, 7); add_bn("bn1", 64)
    in_ch = 64
    for stage, (nb, w) in enumerate(zip((3, 4, 6, 3), (64, 128, 256, 512))):
        for b in range(nb):
            pre = f"layer{stage+1}.{b}"
            add_conv(pre + ".conv1", w, in_ch if b == 0 else w * 4, 1)
            add_bn(pre + ".bn1", w)
            add_conv(pre + ".conv2", w, w, 3); add_bn(pre + ".bn2", w)
            add_conv(pre + ".conv3", w * 4, w, 1); add_bn(pre + ".bn3", w * 4)
            if b == 0:
                add_conv(pre + ".downsample.0", w * 4, in_ch, 1)
                add_bn(pre + ".downsample.1", w * 4)
        in_ch = w * 4

    p_up, s_up, n = resnet_torch_to_flax(sd)

    # every leaf in our params must be covered by the conversion (except nothing)
    def count_leaves(t):
        return len(jax.tree_util.tree_leaves(t))
    assert count_leaves(p_up) == count_leaves(variables["params"])
    assert count_leaves(s_up) == count_leaves(variables["batch_stats"])

    # shapes line up
    flat_ours = jax.tree_util.tree_leaves_with_path(variables["params"])
    def get(tree, path):
        d = tree
        for p in path:
            d = d[p.key]
        return d
    for path, leaf in flat_ours:
        conv = get(p_up, path)
        assert tuple(conv.shape) == tuple(leaf.shape), path
