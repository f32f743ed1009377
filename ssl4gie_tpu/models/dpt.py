"""DPT (dense prediction transformer) decoder for ViT segmentation and depth.

Behavioral match of the reference `Models/DPT_decoder.py:315-539` (isl-org/DPT
derived): readout='ignore' (drop cls token), reassemble of the 4 ViT taps to a
stride-4/8/16/32 pyramid at channels [96,192,384,768], 3x3 projections to a 256-wide
fusion path, 4 FeatureFusionBlocks (2 ResidualConvUnits each, add-skip, 2x
align-corners bilinear upsample, 1x1 out conv), and per-task heads:
depth -> ...->Sigmoid in [0,1]; seg -> logits (no sigmoid). BatchNorm is used inside
the RCUs only for seg (`use_bn = dense=='seg'`, `DPT_decoder.py:461`).

All tensors NHWC; upsampling is matmul-based align-corners bilinear (ops/resize.py).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ssl4gie_tpu.models.resnet import BN_EPS, BN_MOMENTUM
from ssl4gie_tpu.ops.resize import upsample2x_ac


class ResidualConvUnit(nn.Module):
    """`ResidualConvUnit_custom` (`DPT_decoder.py:170-233`): relu-conv[-bn] x2 + skip."""
    features: int
    use_bn: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                       dtype=self.dtype, name=name)
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=1, use_bias=not self.use_bn,
                      dtype=self.dtype, name="conv1")(out)
        if self.use_bn:
            out = bn("bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, use_bias=not self.use_bn,
                      dtype=self.dtype, name="conv2")(out)
        if self.use_bn:
            out = bn("bn2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """`FeatureFusionBlock_custom` (`DPT_decoder.py:238-301`)."""
    features: int
    use_bn: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        out = x
        if skip is not None:
            out = out + ResidualConvUnit(self.features, self.use_bn, self.dtype,
                                         name="rcu1")(skip, train)
        out = ResidualConvUnit(self.features, self.use_bn, self.dtype,
                               name="rcu2")(out, train)
        out = upsample2x_ac(out)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype, name="out_conv")(out)


class DPTDecoder(nn.Module):
    """Consumes the 4 ViT tap sequences [(B, 1+N, 768)] -> dense prediction.

    dense='depth' -> (B, H, W, 1) sigmoid output; dense='seg' -> (B, H, W, C) logits.
    """
    num_classes: int = 1
    dense: str = "seg"                       # 'seg' | 'depth'
    vit_features: int = 768
    features: Sequence[int] = (96, 192, 384, 768)
    fusion_features: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, taps, train: bool = False):
        use_bn = self.dense == "seg"
        grid = int(round((taps[0].shape[1] - 1) ** 0.5))   # 14 for 224px

        # Reassemble: readout='ignore' (drop cls) -> (B, g, g, 768) -> per-tap resample
        maps = []
        for i, t in enumerate(taps):
            B = t.shape[0]
            m = t[:, 1:].reshape(B, grid, grid, self.vit_features)
            m = nn.Conv(self.features[i], (1, 1), dtype=self.dtype,
                        name=f"proj{i+1}")(m)
            if i == 0:
                m = nn.ConvTranspose(self.features[i], (4, 4), strides=(4, 4),
                                     dtype=self.dtype, name="resample1")(m)
            elif i == 1:
                m = nn.ConvTranspose(self.features[i], (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name="resample2")(m)
            elif i == 3:
                m = nn.Conv(self.features[i], (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype, name="resample4")(m)
            m = nn.Conv(self.fusion_features, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"layer{i+1}_rn")(m)
            maps.append(m)

        # Fusion cascade: refinenet4 -> 1 (`DPT_decoder.py:529-539`)
        path = FeatureFusionBlock(self.fusion_features, use_bn, self.dtype,
                                  name="refinenet4")(maps[3], None, train)
        path = FeatureFusionBlock(self.fusion_features, use_bn, self.dtype,
                                  name="refinenet3")(path, maps[2], train)
        path = FeatureFusionBlock(self.fusion_features, use_bn, self.dtype,
                                  name="refinenet2")(path, maps[1], train)
        path = FeatureFusionBlock(self.fusion_features, use_bn, self.dtype,
                                  name="refinenet1")(path, maps[0], train)

        if self.dense == "depth":
            out = nn.Conv(self.fusion_features // 2, (3, 3), padding=1,
                          dtype=self.dtype, name="head_conv1")(path)
            out = upsample2x_ac(out)
            out = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                          name="head_conv2")(out)
            out = nn.relu(out)
            out = nn.Conv(1, (1, 1), dtype=jnp.float32, name="head_conv3")(
                out.astype(jnp.float32))
            return nn.sigmoid(out)

        out = nn.Conv(self.fusion_features, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="head_conv1")(path)
        out = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                           epsilon=BN_EPS, dtype=self.dtype, name="head_bn")(out)
        out = nn.relu(out)
        out = nn.Dropout(0.1, deterministic=not train)(out)
        out = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                      name="head_conv2")(out.astype(jnp.float32))
        return upsample2x_ac(out)            # logits
