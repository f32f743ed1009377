"""PyTorch state-dict -> Flax param-tree conversion tables.

Handles the reference's checkpoint formats (SURVEY §5.4):
- timm/MAE/MoCo-v3 ViT-B/16 encoder state dicts (`Models/models.py:417-425,491-506`),
  with MAE decoder_* keys dropped (the reference deletes them, `:395-399`) and MoCo
  DDP prefixes stripped (`convert_to_deit.py:24-39`);
- torchvision ResNet50 state dicts (supervised URL ckpt, Barlow Twins / MoCo-RN50
  plain dicts, `Models/models.py:70-80`).

Weight layout conversions: torch Conv (O,I,kh,kw) -> flax (kh,kw,I,O); Linear (O,I) ->
(I,O); LayerNorm/BN weight->scale; BN running stats -> batch_stats collection.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _t(x):
    return np.asarray(x)


def conv_w(x):
    return _t(x).transpose(2, 3, 1, 0)


def linear_w(x):
    return _t(x).transpose(1, 0)


def strip_prefixes(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip DDP / MoCo wrappers: 'module.base_encoder.' (full MoCo ckpt),
    'module.' (plain DDP), and unwrap {'model': sd} / {'state_dict': sd}."""
    for wrapper in ("model", "state_dict"):
        if wrapper in sd and isinstance(sd[wrapper], dict):
            sd = sd[wrapper]
    out = {}
    for k, v in sd.items():
        for pre in ("module.base_encoder.", "module.", "base_encoder."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        out[k] = v
    return out


# ------------------------------------------------------------------ ViT

def vit_torch_to_flax(sd: Dict, depth: int = 12) -> Tuple[Dict, int]:
    """timm-named ViT encoder sd -> params for models.vit.ViTBackbone.
    Returns (params_update, n_loaded). Ignores decoder_*/head/projector keys like the
    reference's name-filtered partial load (`load_my_state_dict`, models.py:417-425)."""
    p: Dict = {}
    n = 0

    def put(dst_path, value):
        nonlocal n
        d = p
        for k in dst_path[:-1]:
            d = d.setdefault(k, {})
        d[dst_path[-1]] = value
        n += 1

    if "patch_embed.proj.weight" in sd:
        put(("patch_embed", "proj", "kernel"), conv_w(sd["patch_embed.proj.weight"]))
        put(("patch_embed", "proj", "bias"), _t(sd["patch_embed.proj.bias"]))
    elif "patch_embed.proj.0.weight" in sd:
        # MoCo v3 ConvStem (`vits.py:75-115`): nn.Sequential indices
        # 0/3/6/9 = 3x3 convs, 1/4/7/10 = BNs, 12 = the 1x1 projection
        for l, idx in enumerate((0, 3, 6, 9)):
            put(("patch_embed", f"conv{l}", "kernel"),
                conv_w(sd[f"patch_embed.proj.{idx}.weight"]))
            put(("patch_embed", f"bn{l}", "scale"),
                _t(sd[f"patch_embed.proj.{idx + 1}.weight"]))
            put(("patch_embed", f"bn{l}", "bias"),
                _t(sd[f"patch_embed.proj.{idx + 1}.bias"]))
        put(("patch_embed", "proj", "kernel"),
            conv_w(sd["patch_embed.proj.12.weight"]))
        put(("patch_embed", "proj", "bias"), _t(sd["patch_embed.proj.12.bias"]))
    if "cls_token" in sd:
        put(("cls_token",), _t(sd["cls_token"]))
    if "pos_embed" in sd:
        put(("pos_embed",), _t(sd["pos_embed"]))
    for i in range(depth):
        pre = f"blocks.{i}."
        if pre + "norm1.weight" not in sd:
            continue
        blk = f"blocks_{i}"
        put((blk, "norm1", "scale"), _t(sd[pre + "norm1.weight"]))
        put((blk, "norm1", "bias"), _t(sd[pre + "norm1.bias"]))
        put((blk, "attn", "qkv", "kernel"), linear_w(sd[pre + "attn.qkv.weight"]))
        put((blk, "attn", "qkv", "bias"), _t(sd[pre + "attn.qkv.bias"]))
        put((blk, "attn", "proj", "kernel"), linear_w(sd[pre + "attn.proj.weight"]))
        put((blk, "attn", "proj", "bias"), _t(sd[pre + "attn.proj.bias"]))
        put((blk, "norm2", "scale"), _t(sd[pre + "norm2.weight"]))
        put((blk, "norm2", "bias"), _t(sd[pre + "norm2.bias"]))
        put((blk, "mlp", "fc1", "kernel"), linear_w(sd[pre + "mlp.fc1.weight"]))
        put((blk, "mlp", "fc1", "bias"), _t(sd[pre + "mlp.fc1.bias"]))
        put((blk, "mlp", "fc2", "kernel"), linear_w(sd[pre + "mlp.fc2.weight"]))
        put((blk, "mlp", "fc2", "bias"), _t(sd[pre + "mlp.fc2.bias"]))
    if "norm.weight" in sd:
        put(("norm", "scale"), _t(sd["norm.weight"]))
        put(("norm", "bias"), _t(sd["norm.bias"]))
    if "fc_norm.weight" in sd:
        # MAE finetune global_pool variant (`models_vit.py:28-31`): the final
        # norm is replaced by fc_norm applied after pre-norm pooling
        put(("fc_norm", "scale"), _t(sd["fc_norm.weight"]))
        put(("fc_norm", "bias"), _t(sd["fc_norm.bias"]))
    return p, n


def convstem_batch_stats(sd: Dict) -> Tuple[Dict, int]:
    """Running mean/var of the ConvStem BNs -> batch_stats for
    models.layers.ConvStem (companion to the param conversion above)."""
    stats: Dict = {}
    n = 0
    for l, idx in enumerate((1, 4, 7, 10)):
        k = f"patch_embed.proj.{idx}"
        if k + ".running_mean" not in sd:
            continue
        d = stats.setdefault("patch_embed", {}).setdefault(f"bn{l}", {})
        d["mean"] = _t(sd[k + ".running_mean"])
        d["var"] = _t(sd[k + ".running_var"])
        n += 2
    return stats, n


def vit_flax_from_augreg_npz(npz) -> Tuple[Dict, int]:
    """timm AugReg .npz (JAX-era big_vision naming) -> ViTBackbone params.
    Used for supervised-ImageNet ViT (`Models/models.py:286-290`)."""
    p: Dict = {}
    n = 0

    def put(path, value):
        nonlocal n
        d = p
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = np.asarray(value)
        n += 1

    get = lambda k: npz[k]
    put(("patch_embed", "proj", "kernel"), get("embedding/kernel"))
    put(("patch_embed", "proj", "bias"), get("embedding/bias"))
    put(("cls_token",), get("cls"))
    put(("pos_embed",), get("Transformer/posembed_input/pos_embedding"))
    i = 0
    while f"Transformer/encoderblock_{i}/LayerNorm_0/scale" in npz:
        pre = f"Transformer/encoderblock_{i}/"
        blk = f"blocks_{i}"
        put((blk, "norm1", "scale"), get(pre + "LayerNorm_0/scale"))
        put((blk, "norm1", "bias"), get(pre + "LayerNorm_0/bias"))
        att = pre + "MultiHeadDotProductAttention_1/"
        d = npz[att + "query/kernel"].shape[0]
        qkv_k = np.concatenate([npz[att + a + "/kernel"].reshape(d, d)
                                for a in ("query", "key", "value")], axis=1)
        qkv_b = np.concatenate([npz[att + a + "/bias"].reshape(d)
                                for a in ("query", "key", "value")])
        put((blk, "attn", "qkv", "kernel"), qkv_k)
        put((blk, "attn", "qkv", "bias"), qkv_b)
        put((blk, "attn", "proj", "kernel"), npz[att + "out/kernel"].reshape(d, d))
        put((blk, "attn", "proj", "bias"), npz[att + "out/bias"])
        put((blk, "norm2", "scale"), get(pre + "LayerNorm_2/scale"))
        put((blk, "norm2", "bias"), get(pre + "LayerNorm_2/bias"))
        put((blk, "mlp", "fc1", "kernel"), get(pre + "MlpBlock_3/Dense_0/kernel"))
        put((blk, "mlp", "fc1", "bias"), get(pre + "MlpBlock_3/Dense_0/bias"))
        put((blk, "mlp", "fc2", "kernel"), get(pre + "MlpBlock_3/Dense_1/kernel"))
        put((blk, "mlp", "fc2", "bias"), get(pre + "MlpBlock_3/Dense_1/bias"))
        i += 1
    put(("norm", "scale"), get("Transformer/encoder_norm/scale"))
    put(("norm", "bias"), get("Transformer/encoder_norm/bias"))
    return p, n


# ------------------------------------------------------------------ ResNet50

def resnet_torch_to_flax(sd: Dict,
                         stage_sizes=(3, 4, 6, 3)) -> Tuple[Dict, Dict, int]:
    """torchvision ResNet50 sd -> (params, batch_stats, n_loaded) for models.resnet.
    The classifier 'fc' is skipped (the reference replaces it with Identity,
    `Models/models.py:77`)."""
    params: Dict = {}
    stats: Dict = {}
    n = 0

    def put(tree, path, value):
        nonlocal n
        d = tree
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = np.asarray(value)
        n += 1

    def bn(src, dst):
        put(params, dst + ("scale",), sd[src + ".weight"])
        put(params, dst + ("bias",), sd[src + ".bias"])
        put(stats, dst + ("mean",), sd[src + ".running_mean"])
        put(stats, dst + ("var",), sd[src + ".running_var"])

    put(params, ("conv1", "kernel"), conv_w(sd["conv1.weight"]))
    bn("bn1", ("bn1",))
    for stage, nb in enumerate(stage_sizes):
        for b in range(nb):
            src = f"layer{stage+1}.{b}"
            dst = f"layer{stage+1}_{b}"
            for c in (1, 2, 3):
                put(params, (dst, f"conv{c}", "kernel"),
                    conv_w(sd[f"{src}.conv{c}.weight"]))
                bn(f"{src}.bn{c}", (dst, f"bn{c}"))
            if f"{src}.downsample.0.weight" in sd:
                put(params, (dst, "downsample_conv", "kernel"),
                    conv_w(sd[f"{src}.downsample.0.weight"]))
                bn(f"{src}.downsample.1", (dst, "downsample_bn"))
    return params, stats, n
