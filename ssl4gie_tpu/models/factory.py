"""Model registry / factory — the TPU-native successor of the reference's backbone
facade (`utils.py:4-81`) plus the per-task model wiring in each train_*.py build().

`build_model(task, architecture, ...)` returns a Flax module; pretrained-weight
loading is handled separately by `ssl4gie_tpu/convert` (checkpoint converters), which
is where the provenance differences (MAE vs MoCo v3 vs Barlow Twins vs
torchvision/timm supervised) live.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from ssl4gie_tpu.core.config import Architecture, Pretraining, SSLFramework, Task
from ssl4gie_tpu.models.deeplabv3plus import DeepLabV3Plus
from ssl4gie_tpu.models.dpt import DPTDecoder
from ssl4gie_tpu.models.resnet import (ResNetClassifier, ResNetDepthModel,
                                       ResNet50)
from ssl4gie_tpu.models.vit import ViTBackbone, ViTClassifier


class ViTDenseModel(nn.Module):
    """ViT-B/16 + DPT decoder (seg logits or depth sigmoid), matching the reference's
    dense mode (`Models/models.py:301,340-343`)."""
    num_classes: int = 1
    dense: str = "seg"
    pos_embed_type: str = "learned"
    img_size: int = 224
    dtype: jnp.dtype = jnp.float32
    attn_fn: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps = ViTBackbone(img_size=self.img_size, mode="dense",
                           pos_embed_type=self.pos_embed_type, dtype=self.dtype,
                           attn_fn=self.attn_fn, name="backbone")(x, train)
        return DPTDecoder(num_classes=self.num_classes, dense=self.dense,
                          dtype=self.dtype, name="decoder")(taps, train)


def pos_embed_type_for(pretraining: Pretraining,
                       framework: Optional[SSLFramework]) -> str:
    """MoCo v3 and MAE checkpoints carry fixed 2-D sin-cos position embeddings
    (`Models/moco_v3/vits.py:53-69`, `Models/mae/models_mae.py:65-72`); supervised
    timm and random init use learned embeddings."""
    if framework in (SSLFramework.MAE, SSLFramework.MOCOV3):
        return "sincos"
    return "learned"


def build_model(task: Task, architecture: Architecture, *, num_classes: int = 1,
                pretraining: Pretraining = Pretraining.RANDOM,
                framework: Optional[SSLFramework] = None,
                out_token: str = "cls", img_size: int = 224,
                dtype: jnp.dtype = jnp.float32,
                probe_bn: bool = False,
                drop_path: float = 0.0,
                attn_fn: Optional[Callable] = None) -> nn.Module:
    pet = pos_embed_type_for(pretraining, framework)
    vit = architecture == Architecture.VIT_B
    if drop_path > 0 and not (vit and task == Task.CLASSIFICATION):
        # the reference only threads drop_path_rate into the MAE finetune ViT
        # (`Models/mae/main_finetune.py:229`); no other model family takes it
        raise ValueError("--drop-path applies to ViT classification only")

    if task == Task.CLASSIFICATION:
        if vit:
            return ViTClassifier(num_classes=num_classes, out_token=out_token,
                                 pos_embed_type=pet, img_size=img_size,
                                 dtype=dtype, probe_bn=probe_bn,
                                 drop_path_rate=drop_path,
                                 attn_fn=attn_fn)
        return ResNetClassifier(num_classes=num_classes, dtype=dtype)

    if task == Task.SEGMENTATION:
        if vit:
            return ViTDenseModel(num_classes=1, dense="seg", pos_embed_type=pet,
                                 img_size=img_size, dtype=dtype, attn_fn=attn_fn)
        # RN50 segmentation goes through DeepLabV3+ like the reference
        # (`train_segmentation.py:153`), not the custom decoder.
        return DeepLabV3Plus(num_classes=1, dtype=dtype)

    if task == Task.DEPTH:
        if vit:
            return ViTDenseModel(num_classes=1, dense="depth", pos_embed_type=pet,
                                 img_size=img_size, dtype=dtype, attn_fn=attn_fn)
        return ResNetDepthModel(dtype=dtype)

    if task == Task.DETECTION:
        from ssl4gie_tpu.models.faster_rcnn import build_detector
        return build_detector(architecture, pos_embed_type=pet, img_size=img_size,
                              dtype=dtype)

    raise ValueError(f"unknown task {task}")
