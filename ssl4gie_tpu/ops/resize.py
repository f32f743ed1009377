"""Bilinear resize with PyTorch `align_corners=True` semantics.

The reference uses align_corners=True everywhere (pos-embed interp
`Models/models.py:314`, DPT fusion upsampling `Models/DPT_decoder.py`, decoder
upsampling, eval logit resizing). jax.image.resize implements half-pixel sampling
only, so we build the interpolation as two static matmuls: out = W_h @ x @ W_w^T —
which XLA maps straight onto the MXU (better than gather-based interpolation on TPU).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) row-stochastic linear-interp matrix, align_corners=True."""
    w = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        w[:, 0] = 1.0
        return w
    scale = (n_in - 1) / (n_out - 1)
    for i in range(n_out):
        pos = i * scale
        lo = int(np.floor(pos))
        hi = min(lo + 1, n_in - 1)
        frac = pos - lo
        w[i, lo] += 1.0 - frac
        w[i, hi] += frac
    return w


def resize_bilinear_ac(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize NHWC (or HWC / NCHW-free any rank>=3 with H,W at -3,-2) tensor with
    align_corners=True bilinear interpolation. Static shapes only."""
    h, w = x.shape[-3], x.shape[-2]
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if out_h != h:
        wh = jnp.asarray(_interp_matrix(h, out_h))
        xf = jnp.einsum("oh,...hwc->...owc", wh, xf)
    if out_w != w:
        ww = jnp.asarray(_interp_matrix(w, out_w))
        xf = jnp.einsum("ow,...hwc->...hoc", ww, xf)
    return xf.astype(dtype)


def upsample2x_ac(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample, align_corners=True (the DPT/decoder hot path)."""
    return resize_bilinear_ac(x, x.shape[-3] * 2, x.shape[-2] * 2)
