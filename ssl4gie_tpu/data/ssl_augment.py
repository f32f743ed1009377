"""On-device two-view SSL augmentation (MoCo v3 BYOL recipe + MAE recipe).

Behavioral match of the vendored pipelines:
- MoCo v3 (`Models/moco_v3/main_moco.py:262-290`): per view — RandomResizedCrop
  (scale [crop_min, 1], ratio [3/4, 4/3]), ColorJitter(0.4,0.4,0.2,0.1) w.p. 0.8,
  grayscale w.p. 0.2, GaussianBlur sigma [0.1, 2] (w.p. 1.0 view1 / 0.1 view2),
  Solarize w.p. 0.2 (view2 only), hflip w.p. 0.5, ImageNet normalize.
- MAE (`Models/mae/main_pretrain.py:123-127`): RandomResizedCrop(scale [0.2, 1]) +
  hflip + normalize.

TPU design: the host decodes to a fixed canvas (default 256px); the crop+resize is a
per-image affine bilinear sample on device, so the whole two-view pipeline is one
fused jitted program keyed by jax.random.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ssl4gie_tpu.data.augment import (_adjust_brightness, _adjust_contrast,
                                      _adjust_hue, _adjust_saturation,
                                      _grayscale, affine_sample, gaussian_blur,
                                      normalize)


def random_resized_crop(key, img, out_size: int, scale=(0.2, 1.0),
                        ratio=(3 / 4, 4 / 3)):
    """torchvision RandomResizedCrop semantics (area-scale + log-uniform aspect),
    realized as a per-image affine bilinear resample."""
    B, H, W, C = img.shape
    ka, kr, kx, ky = jax.random.split(key, 4)
    area = jax.random.uniform(ka, (B,), minval=scale[0], maxval=scale[1]) * (H * W)
    log_r = jax.random.uniform(kr, (B,), minval=jnp.log(ratio[0]),
                               maxval=jnp.log(ratio[1]))
    r = jnp.exp(log_r)
    w = jnp.sqrt(area * r)
    h = jnp.sqrt(area / r)
    w = jnp.clip(w, 1.0, W)
    h = jnp.clip(h, 1.0, H)
    x0 = jax.random.uniform(kx, (B,)) * (W - w)
    y0 = jax.random.uniform(ky, (B,)) * (H - h)

    # map output pixel -> source pixel: scale + translate (src = x0 + xs * sx)
    sx = w / out_size
    sy = h / out_size
    # axis-aligned scale+translate is separable: two per-image two-tap interp
    # matmuls on the MXU replace the 4-tap take_along_axis gather (~11 ns per
    # gathered element on TPU); identical bilinear math
    xs = jnp.arange(out_size, dtype=jnp.float32)
    src_x = x0[:, None] + xs[None, :] * sx[:, None]          # (B, out)
    src_y = y0[:, None] + xs[None, :] * sy[:, None]
    mx = _interp_matrix(src_x, W, img.dtype)
    my = _interp_matrix(src_y, H, img.dtype)
    out = jnp.einsum("bhwc,bxw->bhxc", img, mx)
    return jnp.einsum("bhwc,byh->bywc", out, my)


def _interp_matrix(src, n_src: int, dtype):
    """(B, L_out) float source coords -> (B, L_out, n_src) bilinear two-tap
    rows (edge-clamped; rows always sum to 1)."""
    src = jnp.clip(src, 0.0, n_src - 1.0)
    i0 = jnp.floor(src)
    f = src - i0
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n_src - 1)
    base = jnp.arange(n_src, dtype=jnp.int32)
    m = ((i0[..., None] == base) * (1.0 - f)[..., None]
         + (i1[..., None] == base) * f[..., None])
    return m.astype(dtype)


def _masked(key, img, transformed, p: float):
    """Apply `transformed` per image with probability p."""
    B = img.shape[0]
    keep = jax.random.uniform(key, (B, 1, 1, 1)) < p
    return jnp.where(keep, transformed, img)


def _byol_view(key, img, out_size: int, crop_scale, blur_p: float,
               solarize_p: float):
    k = jax.random.split(key, 11)
    v = random_resized_crop(k[0], img, out_size, scale=crop_scale)
    # ColorJitter(0.4, 0.4, 0.2, 0.1) applied w.p. 0.8. Factors are cast to
    # the image dtype (like color_jitter's) — a raw f32 factor would silently
    # promote the whole downstream pipeline back to f32 on the bf16 TPU path.
    B = v.shape[0]
    dt = v.dtype
    jittered = _adjust_brightness(
        v, jax.random.uniform(k[1], (B, 1, 1, 1), minval=0.6,
                              maxval=1.4).astype(dt))
    jittered = _adjust_contrast(
        jittered, jax.random.uniform(k[2], (B, 1, 1, 1), minval=0.6,
                                     maxval=1.4).astype(dt))
    jittered = _adjust_saturation(
        jittered, jax.random.uniform(k[3], (B, 1, 1, 1), minval=0.8,
                                     maxval=1.2).astype(dt))
    jittered = _adjust_hue(
        jittered, jax.random.uniform(k[4], (B, 1, 1), minval=-0.1,
                                     maxval=0.1).astype(dt))
    v = _masked(k[5], v, jittered, 0.8)
    # grayscale w.p. 0.2
    gray = jnp.broadcast_to(_grayscale(v), v.shape)
    v = _masked(k[6], v, gray, 0.2)
    # blur (kernel 23 like torchvision default for 224? the reference uses
    # moco.loader.GaussianBlur on PIL with radius sigma — approximated by a 25-tap
    # separable kernel, sigma U[0.1, 2])
    blurred = gaussian_blur(k[7], v, kernel_size=25, sigma_range=(0.1, 2.0))
    v = _masked(k[8], v, blurred, blur_p)
    if solarize_p > 0:
        sol = jnp.where(v >= 0.5, 1.0 - v, v)
        v = _masked(k[9], v, sol, solarize_p)
    flip = jax.random.uniform(k[10], (B, 1, 1, 1)) > 0.5
    v = jnp.where(flip, v[:, :, ::-1], v)
    return normalize(v.astype(jnp.float32))


def _aug_dtype():
    """bf16 on TPU, like the classification pipeline (`augment.py`): the
    encoders consume bf16 anyway and bf16's ~3-decimal-digit resolution on
    [0,1] sits at the uint8 quantization floor the pipeline starts from.
    Measured on v5e: the f32 two-crop pipeline was ~89 ms of the 307 ms MoCo
    step (device profile, `benchmarks/profile_step.py moco`); bf16 halves its
    HBM traffic. CPU (tests) keeps f32 — exact-math parity tests are
    unaffected."""
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


@functools.partial(jax.jit, static_argnames=("out_size", "crop_min"))
def moco_two_crops(key, img_u8, out_size: int = 224, crop_min: float = 0.08):
    img = img_u8.astype(_aug_dtype()) / 255.0
    k1, k2 = jax.random.split(key)
    v1 = _byol_view(k1, img, out_size, (crop_min, 1.0), blur_p=1.0, solarize_p=0.0)
    v2 = _byol_view(k2, img, out_size, (crop_min, 1.0), blur_p=0.1, solarize_p=0.2)
    return v1, v2


@functools.partial(jax.jit, static_argnames=("out_size",))
def mae_augment(key, img_u8, out_size: int = 224):
    img = img_u8.astype(_aug_dtype()) / 255.0
    kc, kf = jax.random.split(key)
    v = random_resized_crop(kc, img, out_size, scale=(0.2, 1.0))
    B = v.shape[0]
    flip = jax.random.uniform(kf, (B, 1, 1, 1)) > 0.5
    v = jnp.where(flip, v[:, :, ::-1], v)
    return normalize(v.astype(jnp.float32))
