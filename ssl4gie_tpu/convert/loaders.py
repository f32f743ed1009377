"""High-level pretrained-weight loading into an initialized Flax param tree.

Dispatch mirrors the reference factories (`utils.py:4-81`) + per-task build()
wiring: the SSL/imagenet weights land in the *backbone/encoder* subtree of whatever
task model was built (classifier / DPT dense / DeepLabV3+ / detector)."""

from __future__ import annotations

import copy
import os
from typing import Any, Dict

import numpy as np

from ssl4gie_tpu.convert.torch_names import (resnet_torch_to_flax, strip_prefixes,
                                             vit_flax_from_augreg_npz,
                                             vit_torch_to_flax)


def _load_torch_sd(path: str) -> Dict[str, np.ndarray]:
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        sd = strip_prefixes(obj)
    else:
        sd = strip_prefixes(obj.state_dict())
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items() if hasattr(v, "shape")}


def merge_into(params: Any, update: Dict, subtree: str = None) -> Any:
    """Copy matching leaves of `update` into (a copy of) `params[subtree]`.
    Shape-checked; missing keys in params are ignored (partial load, like the
    reference's `load_my_state_dict`)."""
    params = copy.deepcopy(jax_to_mutable(params))
    root = params[subtree] if subtree else params
    n_loaded = _merge(root, update)
    return params, n_loaded


def jax_to_mutable(tree):
    if hasattr(tree, "unfreeze"):
        return tree.unfreeze()
    if isinstance(tree, dict):
        return {k: jax_to_mutable(v) for k, v in tree.items()}
    return tree


def _merge(dst: Dict, src: Dict, path=()) -> int:
    n = 0
    for k, v in src.items():
        if k not in dst:
            continue
        if isinstance(v, dict):
            n += _merge(dst[k], v, path + (k,))
        else:
            cur = dst[k]
            if tuple(cur.shape) != tuple(v.shape):
                raise ValueError(f"shape mismatch at {'/'.join(path + (k,))}: "
                                 f"{cur.shape} vs {v.shape}")
            dst[k] = np.asarray(v, dtype=np.asarray(cur).dtype)
            n += 1
    return n


def _backbone_key(params: Dict) -> str:
    for k in ("backbone", "encoder"):
        if k in params:
            return k
    return None


def load_orbax_encoder(path: str, params, subtree: str = "backbone",
                       batch_stats=None):
    """Load one of OUR pretraining / converter checkpoints (Orbax format:
    {'params': {'backbone': ...}, ['batch_stats': ...], 'meta': ...}).
    Returns (params, n) or (params, batch_stats, n) when batch_stats given."""
    import orbax.checkpoint as ocp
    restored = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    enc = restored["params"]
    src = enc.get("backbone", enc)
    new_params, n = merge_into(params, jax_to_mutable(src), subtree)
    if batch_stats is None:
        return new_params, n
    stats_src = restored.get("batch_stats") or {}
    stats_src = stats_src.get("backbone", stats_src) if stats_src else {}
    if stats_src:
        batch_stats, n2 = merge_into(batch_stats, jax_to_mutable(stats_src),
                                     subtree)
        n += n2
    return new_params, batch_stats, n



def load_pretrained(cfg, params, batch_stats=None):
    """Load cfg.checkpoint (external torch SSL ckpt, or one of our Orbax pretrain
    dirs) into the model's backbone/encoder subtree. Returns (params, batch_stats)."""
    from ssl4gie_tpu.core.config import Architecture
    key = _backbone_key(jax_to_mutable(params))
    if os.path.isdir(cfg.checkpoint):
        if batch_stats:
            new_params, new_stats, n = load_orbax_encoder(
                cfg.checkpoint, params, key, batch_stats)
        else:
            new_params, n = load_orbax_encoder(cfg.checkpoint, params, key)
            new_stats = batch_stats
        print(f"Loaded {n} tensors from Orbax pretrain ckpt {cfg.checkpoint}")
        return new_params, new_stats
    if cfg.architecture == Architecture.VIT_B:
        new_params, n = load_vit_encoder(cfg.checkpoint, params, key)
        print(f"Loaded {n} converted tensors from {cfg.checkpoint}")
        return new_params, batch_stats
    new_params, new_stats, n = load_resnet_encoder(cfg.checkpoint, params,
                                                   batch_stats or {}, key)
    print(f"Loaded {n} converted tensors from {cfg.checkpoint}")
    return new_params, new_stats


def load_vit_encoder(path: str, params, subtree: str = "backbone"):
    sd = _load_torch_sd(path)
    update, n = vit_torch_to_flax(sd)
    new_params, n_merged = merge_into(params, update, subtree)
    return new_params, n_merged


def load_resnet_encoder(path: str, params, batch_stats, subtree: str = "backbone"):
    sd = _load_torch_sd(path)
    p_up, s_up, _ = resnet_torch_to_flax(sd)
    new_params, n_p = merge_into(params, p_up, subtree)
    new_stats, n_s = merge_into(batch_stats, s_up, subtree)
    return new_params, new_stats, n_p + n_s


def load_imagenet_supervised(cfg, params):
    """Supervised-ImageNet init. Requires a local file (no egress): set
    SSL4GIE_IMAGENET_VIT_NPZ / SSL4GIE_IMAGENET_RN50_PTH env vars to the
    timm-AugReg npz / torchvision resnet50 ckpt the reference downloads
    (`Models/models.py:286-290,70-75`)."""
    from ssl4gie_tpu.core.config import Architecture
    if cfg.architecture == Architecture.VIT_B:
        path = os.environ.get("SSL4GIE_IMAGENET_VIT_NPZ")
        if not path:
            raise FileNotFoundError("set SSL4GIE_IMAGENET_VIT_NPZ (no egress here)")
        update, n = vit_flax_from_augreg_npz(np.load(path))
        new_params, _ = merge_into(params, update,
                                   _backbone_key(jax_to_mutable(params)))
        return new_params
    path = os.environ.get("SSL4GIE_IMAGENET_RN50_PTH")
    if not path:
        raise FileNotFoundError("set SSL4GIE_IMAGENET_RN50_PTH (no egress here)")
    sd = _load_torch_sd(path)
    p_up, s_up, _ = resnet_torch_to_flax(sd)
    new_params, _ = merge_into(params, p_up, _backbone_key(jax_to_mutable(params)))
    return new_params
