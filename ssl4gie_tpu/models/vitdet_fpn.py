"""FPNs for the detection backbones.

- ViTDetFPN: the reference's simple feature pyramid (`Models/models.py:213-259`):
  four parallel branches off the final stride-16 ViT map -> strides 32/16/8/4 via
  maxpool / identity / 1 deconv / 2 deconv(+LN+GELU), each projected 768->256 with
  LayerNorm and a 3x3 conv, plus a stride-64 max-pool level. Output order matches
  the reference dict: ["0"=stride4, "1"=8, "2"=16, "3"=32, "pool"=64].
  ln_mode picks the norm: "channel" (shape-agnostic channel-wise LN, the ViTDet
  original and repo default) or "chw" (the reference's full-(C,H,W) LayerNorm on
  fixed canvas shapes, `LayerNormCHW` — use when converting reference-finetuned
  detection checkpoints).
- ResNetFPN: torchvision-style top-down FPN over the RN50 stage maps with an extra
  max-pool level (`fasterrcnn_resnet50_fpn(trainable_backbone_layers=5)` backbone).
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp

from ssl4gie_tpu.models.resnet import ResNet50


class LayerNormCHW(nn.Module):
    """torch `nn.LayerNorm((C, H, W))` semantics on NHWC input: statistics over
    ALL of (H, W, C) per sample, per-ELEMENT affine of shape (H, W, C) — the
    reference's ViTDet_FPN norm (`Models/models.py:219-246`, hardcoded 1024px
    grids). Parameters are stored HWC; a torch (C, H, W) weight converts via
    `np.transpose(w, (1, 2, 0))`. Shape-bound like the reference (the affine is
    created from the traced input shape), so it pins the model to one canvas."""
    epsilon: float = 1e-5   # torch LayerNorm default (reference leaves it)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shape = x.shape[1:]
        scale = self.param("scale", nn.initializers.ones, shape)
        bias = self.param("bias", nn.initializers.zeros, shape)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 3), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


class _Branch(nn.Module):
    out_channels: int = 256
    dtype: jnp.dtype = jnp.float32
    ln_mode: str = "channel"

    def _ln(self, name):
        if self.ln_mode == "chw":
            return LayerNormCHW(dtype=self.dtype, name=name)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="proj")(x)
        x = self._ln("ln1")(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(x)
        return self._ln("ln2")(x)


class ViTDetFPN(nn.Module):
    out_channels: int = 256
    dtype: jnp.dtype = jnp.float32
    # "channel": shape-agnostic channel-wise LN (the ViTDet original; repo
    # default). "chw": the reference's full-(C,H,W) LayerNorm — bit-compatible
    # with reference-finetuned detection checkpoints but canvas-bound.
    ln_mode: str = "channel"

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        """x: (B, H16, W16, 768) final ViT map. Returns [s4, s8, s16, s32, s64]."""
        # stride 32: maxpool 2x
        p32 = nn.max_pool(x, (2, 2), strides=(2, 2))
        p32 = _Branch(self.out_channels, self.dtype, self.ln_mode,
                      name="fpn1")(p32)
        # stride 16: identity
        p16 = _Branch(self.out_channels, self.dtype, self.ln_mode,
                      name="fpn2")(x)
        # stride 8: one 2x deconv
        u8 = nn.ConvTranspose(x.shape[-1], (2, 2), strides=(2, 2),
                              dtype=self.dtype, name="fpn3_deconv")(x)
        p8 = _Branch(self.out_channels, self.dtype, self.ln_mode,
                     name="fpn3")(u8)
        # stride 4: two 2x deconvs with LN+GELU between
        u4 = nn.ConvTranspose(x.shape[-1], (2, 2), strides=(2, 2),
                              dtype=self.dtype, name="fpn4_deconv1")(x)
        if self.ln_mode == "chw":
            u4 = LayerNormCHW(dtype=self.dtype, name="fpn4_ln")(u4)
        else:
            u4 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                              name="fpn4_ln")(u4)
        u4 = nn.gelu(u4, approximate=False)
        u4 = nn.ConvTranspose(u4.shape[-1], (2, 2), strides=(2, 2),
                              dtype=self.dtype, name="fpn4_deconv2")(u4)
        p4 = _Branch(self.out_channels, self.dtype, self.ln_mode,
                     name="fpn4")(u4)
        # pool level (stride 64): stride-2 1x1 maxpool of p32 (`models.py:258`)
        p64 = nn.max_pool(p32, (1, 1), strides=(2, 2))
        return [p4, p8, p16, p32, p64]


class ResNetFPN(nn.Module):
    """RN50 + torchvision FPN: lateral 1x1 + top-down sum + 3x3 output convs,
    extra stride-64 max-pool level."""
    out_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 mask_hw=None) -> List[jnp.ndarray]:
        """mask_hw: optional (h, w) /32-multiple content extent at input
        resolution — batch-max emulation (see resnet.extent_mask). The
        returned levels are then masked to their per-level extents, so the
        RPN head's 3x3 conv and RoIAlign's border bilinear taps read the
        zeros torchvision's smaller canvas would give (lateral/output conv
        BIASES otherwise repopulate the padded region)."""
        from ssl4gie_tpu.models.resnet import extent_mask

        taps = ResNet50(mode="dense", dtype=self.dtype, name="body"
                        )(x, train, mask_hw=mask_hw)
        lvl_hw = (None,) * 4 if mask_hw is None else tuple(
            (mask_hw[0] // s, mask_hw[1] // s) for s in (4, 8, 16, 32))
        laterals = [nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                            name=f"lateral{i}")(t) for i, t in enumerate(taps)]
        # top-down: start at stride 32 (nearest-2x upsample and add are
        # pointwise in the extent sense: coarse padded cells only land on
        # fine padded cells because extents are exact /2 multiples)
        outs = [None] * 4
        prev = laterals[3]
        outs[3] = prev
        for i in (2, 1, 0):
            up = jnp.repeat(jnp.repeat(prev, 2, axis=1), 2, axis=2)  # nearest 2x
            prev = laterals[i] + up
            outs[i] = prev
        outs = [nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                        name=f"output{i}")(extent_mask(o, lvl_hw[i]))
                for i, o in enumerate(outs)]
        if mask_hw is not None:
            outs = [extent_mask(o, hw) for o, hw in zip(outs, lvl_hw)]
        pool = nn.max_pool(outs[3], (1, 1), strides=(2, 2))
        return outs + [pool]
