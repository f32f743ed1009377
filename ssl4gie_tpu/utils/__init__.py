"""Reference-API compatibility facade.

Mirrors the reference's `utils.py` factory names (`utils.py:4-81`) so code written
against the reference can be migrated mechanically. Each returns (module, params,
batch_stats) with the pretrained weights already converted+loaded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _init(model, img_size=224, with_dropout=False):
    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng}
    if with_dropout:
        rngs["dropout"] = rng
    variables = jax.jit(functools.partial(model.init, train=False))(
        rngs, jnp.zeros((1, img_size, img_size, 3), jnp.float32))
    return variables["params"], variables.get("batch_stats", {})


def _build(arch, head, num_classes, dense, det, out_token="cls",
           pos_embed_type="learned", fixed_size=None):
    from ssl4gie_tpu.models.deeplabv3plus import DeepLabV3Plus
    from ssl4gie_tpu.models.factory import ViTDenseModel
    from ssl4gie_tpu.models.faster_rcnn import FasterRCNN
    from ssl4gie_tpu.models.resnet import (ResNetClassifier, ResNetDepthModel,
                                           ResNet50)
    from ssl4gie_tpu.models.vit import ViTBackbone, ViTClassifier

    img_size = fixed_size or 224
    if det:
        return FasterRCNN(arch=arch, image_size=img_size,
                          pos_embed_type=pos_embed_type), img_size
    if arch == "vit_b":
        if dense:
            return ViTDenseModel(num_classes=num_classes, dense=dense,
                                 pos_embed_type=pos_embed_type,
                                 img_size=img_size), img_size
        if head:
            return ViTClassifier(num_classes=num_classes, out_token=out_token,
                                 pos_embed_type=pos_embed_type,
                                 img_size=img_size), img_size
        return ViTBackbone(img_size=img_size, mode="pooled",
                           out_token=out_token,
                           pos_embed_type=pos_embed_type), img_size
    if dense == "depth":
        return ResNetDepthModel(), img_size
    if dense == "seg":
        return DeepLabV3Plus(num_classes=1), img_size
    if head:
        return ResNetClassifier(num_classes=num_classes), img_size
    return ResNet50(mode="pooled"), img_size


def _load(model, weight_path, arch, img_size, with_dropout):
    params, batch_stats = _init(model, img_size, with_dropout)
    if weight_path is not None:
        from ssl4gie_tpu.convert.loaders import (load_resnet_encoder,
                                                 load_vit_encoder)
        key = "backbone" if "backbone" in params else \
            ("encoder" if "encoder" in params else None)
        if arch == "vit_b":
            params, _ = load_vit_encoder(weight_path, params, key)
        else:
            params, batch_stats, _ = load_resnet_encoder(weight_path, params,
                                                         batch_stats, key)
    return model, params, batch_stats


def get_BarlowTwins_backbone(weight_path, head, num_classes, frozen, dense):
    model, s = _build("resnet50", head, num_classes, dense, det=False)
    return _load(model, weight_path, "resnet50", s, dense == "seg")


def get_MAE_backbone(weight_path, head, num_classes, frozen, dense, det,
                     fixed_size=None, out_token="cls"):
    model, s = _build("vit_b", head, num_classes, dense, det, out_token,
                      pos_embed_type="sincos", fixed_size=fixed_size)
    return _load(model, weight_path, "vit_b", s, dense == "seg")


def get_MoCoV3_backbone(weight_path, arch, head, num_classes, frozen, dense, det,
                        fixed_size=None, out_token="cls"):
    pet = "sincos" if arch == "vit_b" else "learned"
    model, s = _build(arch, head, num_classes, dense, det, out_token,
                      pos_embed_type=pet, fixed_size=fixed_size)
    return _load(model, weight_path, arch, s, dense == "seg")


def get_ImageNet_or_random_ResNet(head, num_classes, frozen, dense,
                                  ImageNet_weights):
    model, s = _build("resnet50", head, num_classes, dense, det=False)
    import os
    path = os.environ.get("SSL4GIE_IMAGENET_RN50_PTH") if ImageNet_weights else None
    if ImageNet_weights and not path:
        raise FileNotFoundError("set SSL4GIE_IMAGENET_RN50_PTH (no egress)")
    return _load(model, path, "resnet50", s, dense == "seg")


def get_ImageNet_or_random_ViT(head, num_classes, frozen, dense, det,
                               ImageNet_weights, fixed_size=None,
                               out_token="cls"):
    model, s = _build("vit_b", head, num_classes, dense, det, out_token,
                      fixed_size=fixed_size)
    params, batch_stats = _init(model, s, dense == "seg")
    if ImageNet_weights:
        import os
        import numpy as np
        from ssl4gie_tpu.convert.loaders import merge_into, jax_to_mutable
        from ssl4gie_tpu.convert.torch_names import vit_flax_from_augreg_npz
        path = os.environ.get("SSL4GIE_IMAGENET_VIT_NPZ")
        if not path:
            raise FileNotFoundError("set SSL4GIE_IMAGENET_VIT_NPZ (no egress)")
        update, _ = vit_flax_from_augreg_npz(np.load(path))
        key = "backbone" if "backbone" in params else None
        params, _ = merge_into(params, update, key)
    return model, params, batch_stats
