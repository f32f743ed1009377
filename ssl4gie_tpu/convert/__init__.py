"""Checkpoint converters: external PyTorch/timm formats -> Flax param trees.

Covers the five source formats the reference consumes (SURVEY §5.4):
MoCo v3 (DDP-wrapped, `convert_to_deit.py` stripped), MAE (`ckpt["model"]`),
Barlow Twins / MoCo-RN50 plain state dicts, torchvision supervised RN50 URL ckpt,
and timm AugReg npz for supervised ViT.
"""

from ssl4gie_tpu.convert.loaders import (load_imagenet_supervised,  # noqa: F401
                                         load_pretrained)
