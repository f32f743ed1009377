"""ResNet50 backbone (+ the reference's custom dense decoder for depth).

Behavioral match of `ResNet_from_Any` (`Models/models.py:63-152`, torchvision
Bottleneck [3,4,6,3], v1.5 stride placement) and its decoder
(`ResNet_Dec_Block`/`ResNet_Dec_Level`, `Models/models.py:16-60`).

TPU notes: NHWC layout; BatchNorm statistics are computed over the *global* batch —
under jit+GSPMD a `mean` over a data-sharded batch is already a cross-chip mean, so
the reference's SyncBatchNorm (`train_*.py` convert_sync_batchnorm) falls out for
free with no axis_name plumbing.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ssl4gie_tpu.ops.resize import upsample2x_ac

BN_MOMENTUM = 0.9   # = 1 - torch momentum 0.1
BN_EPS = 1e-5

# torchvision ResNet init: kaiming_normal(fan_out, relu) on convs
CONV_INIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def extent_mask(x, hw):
    """Zero activations beyond a (h, w) valid extent (dynamic values, static
    shape — no recompiles). Applied BEFORE every spatial-kernel op (7x7/3x3
    conv, 3x3 maxpool) it makes the op's halo see exactly the zeros that
    torchvision's SAME padding provides at the edge of its smaller
    (batch-max) canvas, so in-extent activations match a tight-canvas run
    bit-for-bit. Pointwise ops (1x1 conv, BN, ReLU, residual add) have no
    halo and need no mask. Used by the detection batch-max emulation
    (`models/faster_rcnn.py` content_sizes)."""
    if hw is None:
        return x
    h, w = hw
    H, W = x.shape[1], x.shape[2]
    my = jnp.arange(H) < h
    mx = jnp.arange(W) < w
    return x * (my[:, None] & mx[None, :])[None, :, :, None].astype(x.dtype)


class Bottleneck(nn.Module):
    width: int            # bottleneck width; out channels = 4*width
    strides: int = 1
    downsample: bool = False
    dilation: int = 1     # smp-style dilated stage for DeepLabV3+ output_stride 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask_hw=None):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                       dtype=self.dtype, name=name)
        identity = x
        y = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=CONV_INIT, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = extent_mask(y, mask_hw)     # conv2 is the block's only spatial op
        y = nn.Conv(self.width, (3, 3), strides=(self.strides, self.strides),
                    padding=self.dilation, kernel_dilation=(self.dilation,) * 2,
                    use_bias=False, dtype=self.dtype, kernel_init=CONV_INIT,
                    name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.width * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=CONV_INIT, name="conv3")(y)
        y = bn("bn3")(y)
        if self.downsample:
            identity = nn.Conv(self.width * 4, (1, 1),
                               strides=(self.strides, self.strides), use_bias=False,
                               dtype=self.dtype, kernel_init=CONV_INIT,
                               name="downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNet50(nn.Module):
    """mode='pooled' -> (B, 2048) global-average feature; mode='dense' -> the four
    stage maps [stride 4/8/16/32] for decoders/FPN."""
    mode: str = "pooled"
    output_stride: int = 32   # 16 -> dilate layer4 (smp DeepLabV3+ encoder style)
    dtype: jnp.dtype = jnp.float32
    stage_sizes: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False, mask_hw=None):
        """mask_hw: optional (h, w) valid-content extent at input resolution
        (a /32 multiple) — zeroes the padded region before every spatial op
        so in-extent activations equal a tight-canvas run (see extent_mask;
        detection batch-max emulation). None = normal behavior."""
        def half(hw):
            return None if hw is None else (hw[0] // 2, hw[1] // 2)

        x = extent_mask(x, mask_hw)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, kernel_init=CONV_INIT, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        hw = half(mask_hw)              # stride 2 after the stem conv
        x = extent_mask(x, hw)
        # tight-canvas SAME maxpool pads with -inf where we mask 0; post-ReLU
        # inputs are >= 0, so any window with an in-extent pixel agrees
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        hw = half(hw)                   # stride 4

        taps = []
        widths = (64, 128, 256, 512)
        for stage, (n_blocks, w) in enumerate(zip(self.stage_sizes, widths)):
            dilate = (stage == 3 and self.output_stride == 16)
            for b in range(n_blocks):
                strides = 2 if (stage > 0 and b == 0 and not dilate) else 1
                x = Bottleneck(w, strides=strides, downsample=(b == 0),
                               dilation=2 if dilate else 1,
                               dtype=self.dtype, name=f"layer{stage+1}_{b}"
                               )(x, train, mask_hw=hw)
                if strides == 2:
                    hw = half(hw)
            taps.append(x)

        if self.mode == "dense":
            return taps
        return jnp.mean(x, axis=(1, 2))     # avgpool


class ResNetDecBlock(nn.Module):
    """Bottleneck decoder block (`ResNet_Dec_Block`, `Models/models.py:16-43`)."""
    channels: int
    fusion: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                       dtype=self.dtype, name=name)
        c = self.channels
        if self.fusion:
            identity = nn.Conv(c, (1, 1), dtype=self.dtype, name="id_conv")(x)
            identity = bn("id_bn")(identity)
        else:
            identity = x
        y = nn.Conv(c // 4, (1, 1), dtype=self.dtype, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(c // 4, (3, 3), padding=1, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv3")(y)
        y = bn("bn3")(y)
        return nn.relu(y + identity)


class ResNetDecLevel(nn.Module):
    """chan-reduce + 2x align-corners upsample + concat skip + 3 dec blocks
    (`ResNet_Dec_Level`, `Models/models.py:46-60`)."""
    channels: int
    n_blocks: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_low, x_high, train: bool = False):
        x = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="reduce_conv")(x_low)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="reduce_bn")(x)
        x = upsample2x_ac(x)
        x = jnp.concatenate([x, x_high], axis=-1)
        for i in range(self.n_blocks):
            x = ResNetDecBlock(self.channels, fusion=(i == 0), dtype=self.dtype,
                               name=f"block{i}")(x, train)
        return x


class ResNetDepthModel(nn.Module):
    """ResNet50 encoder + custom decoder + sigmoid head — the reference's depth-only
    dense RN50 path (`Models/models.py:89-104,128-135`). Output (B, H, W, 1) in [0,1]."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps = ResNet50(mode="dense", dtype=self.dtype, name="encoder")(x, train)
        out = ResNetDecLevel(1024, dtype=self.dtype, name="level0")(
            taps[-1], taps[-2], train)
        out = ResNetDecLevel(512, dtype=self.dtype, name="level1")(
            out, taps[-3], train)
        out = ResNetDecLevel(256, dtype=self.dtype, name="level2")(
            out, taps[-4], train)
        # output_conv (`Models/models.py:96-104`)
        out = upsample2x_ac(out)
        out = nn.Conv(128, (3, 3), padding=1, dtype=self.dtype, name="out_conv1")(out)
        out = upsample2x_ac(out)
        out = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype, name="out_conv2")(out)
        out = nn.relu(out)
        out = nn.Conv(1, (1, 1), dtype=jnp.float32, name="out_conv3")(
            out.astype(jnp.float32))
        return nn.sigmoid(out)


class ResNetClassifier(nn.Module):
    """ResNet50 + linear head 2048->n (`lin_head`, `Models/models.py:84`)."""
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ResNet50(mode="pooled", dtype=self.dtype, name="backbone")(x, train)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="lin_head")(
            feat.astype(jnp.float32))
