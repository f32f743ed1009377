"""DeepLabV3+ with a ResNet50 encoder.

Behavioral match of the smp (segmentation_models_pytorch) DeepLabV3Plus the
reference uses for RN50 segmentation (`Binary_segmentation/train_segmentation.py:153`):
output_stride-16 encoder (dilated layer4), separable-conv ASPP with rates (12,24,36)
+ image pooling, 48-channel high-res skip from layer1, 256-wide decoder, and a 3x3
segmentation head with 4x align-corners upsampling to input resolution. SSL weights
load into the encoder only, like the reference loads into `model.encoder`
(`train_segmentation.py:155,166,173`). Returns logits.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ssl4gie_tpu.models.resnet import BN_EPS, BN_MOMENTUM, ResNet50
from ssl4gie_tpu.ops.resize import resize_bilinear_ac


class SeparableConv(nn.Module):
    features: int
    kernel: int = 3
    dilation: int = 1
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        pad = (self.kernel // 2) * self.dilation
        x = nn.Conv(in_ch, (self.kernel, self.kernel), padding=pad,
                    kernel_dilation=(self.dilation,) * 2, feature_group_count=in_ch,
                    use_bias=False, dtype=self.dtype, name="depthwise")(x)
        return nn.Conv(self.features, (1, 1), use_bias=self.use_bias,
                       dtype=self.dtype, name="pointwise")(x)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (smp separable variant)."""
    features: int = 256
    rates: Sequence[int] = (12, 24, 36)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                       dtype=self.dtype, name=name)
        branches = []
        b = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="b0_conv")(x)
        branches.append(nn.relu(bn("b0_bn")(b)))
        for i, r in enumerate(self.rates):
            b = SeparableConv(self.features, 3, dilation=r, dtype=self.dtype,
                              name=f"b{i+1}_conv")(x)
            branches.append(nn.relu(bn(f"b{i+1}_bn")(b)))
        # image pooling branch: global avg -> 1x1 conv -> broadcast back
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                         name="pool_conv")(pooled)
        pooled = nn.relu(bn("pool_bn")(pooled))
        pooled = jnp.broadcast_to(pooled, branches[0].shape)
        branches.append(pooled)

        y = jnp.concatenate(branches, axis=-1)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(y)
        y = nn.relu(bn("project_bn")(y))
        return nn.Dropout(0.5, deterministic=not train)(y)


class DeepLabV3Plus(nn.Module):
    num_classes: int = 1
    decoder_channels: int = 256
    highres_channels: int = 48
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                       dtype=self.dtype, name=name)
        taps = ResNet50(mode="dense", output_stride=16, dtype=self.dtype,
                        name="encoder")(x, train)
        # taps: layer1 (stride 4, 256ch) ... layer4 (stride 16 dilated, 2048ch)
        y = ASPP(self.decoder_channels, dtype=self.dtype, name="aspp")(taps[3], train)
        y = SeparableConv(self.decoder_channels, 3, dtype=self.dtype,
                          name="aspp_post")(y)
        y = nn.relu(bn("aspp_post_bn")(y))
        y = resize_bilinear_ac(y, y.shape[1] * 4, y.shape[2] * 4)

        high = nn.Conv(self.highres_channels, (1, 1), use_bias=False,
                       dtype=self.dtype, name="high_conv")(taps[0])
        high = nn.relu(bn("high_bn")(high))

        y = jnp.concatenate([y, high], axis=-1)
        y = SeparableConv(self.decoder_channels, 3, dtype=self.dtype,
                          name="fuse_conv")(y)
        y = nn.relu(bn("fuse_bn")(y))

        y = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=jnp.float32,
                    name="seg_head")(y.astype(jnp.float32))
        return resize_bilinear_ac(y, y.shape[1] * 4, y.shape[2] * 4)   # logits
