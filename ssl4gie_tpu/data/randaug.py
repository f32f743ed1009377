"""Device-side timm train-augmentation stack: RandAugment + RandomErasing.

Parity targets (the vendored MAE ImageNet finetune recipe):
- `timm.data.auto_augment.rand_augment_transform` with the reference default
  policy `rand-m9-mstd0.5-inc1` (`/root/reference/Models/mae/main_finetune.py:82`),
  reached through `create_transform` (`Models/mae/util/datasets.py:36-48`).
- `timm.data.random_erasing.RandomErasing` with `--reprob 0.25 --remode pixel
  --recount 1` (`main_finetune.py:88-93`).
- the probe train transform: RandomResizedCrop(224) + hflip + normalize ONLY
  (`Models/moco_v3/main_lincls.py:273-274`, `Models/mae/main_linprobe.py:133-134`).

TPU design: ONE jitted batched program per train batch — no per-image Python.
Each of the `num_layers` (2) RandAugment layers draws one op per image
(uniform over the 15-op set), applied w.p. 0.5 with magnitude
N(m, mstd) clipped to [0, 10]. The 5 geometric ops share a single batched
bilinear warp per layer (per-image inverse affine matrices; identity rows
resample exactly, so unselected images pass through bit-exact); the 10
photometric ops are computed batched and per-image masked. Because each layer
applies exactly ONE op per image, intra-layer masking preserves the reference's
sequential-op semantics exactly.

Op math follows PIL (what timm calls into), with integer/truncation rules
reproduced: autocontrast/posterize/solarize LUT truncation, the L24
grayscale rounding, PIL SMOOTH's border-preserving 3x3 kernel, blend
extrapolation clipping. Recorded deviation (docs/PARITY.md): geometric
resampling is bilinear, not PIL bicubic, and runs on the host-decoded canvas.
"""

from __future__ import annotations

import functools
import re

import jax
import jax.numpy as jnp

from ssl4gie_tpu.data.augment import affine_sample, normalize
from ssl4gie_tpu.data.ssl_augment import random_resized_crop

# timm `rand_augment_ops` fill: tuple(min(255, round(255*m)) for m in mean)
FILL = jnp.array([124.0, 116.0, 104.0], jnp.float32)

_EPS = 1e-3   # < 1/255, the closest a true LUT value can sit below an integer


def parse_rand_augment(policy: str):
    """Parse a timm policy string `rand-m9-mstd0.5-inc1` -> config dict
    (timm `rand_augment_transform` grammar: m/n/p/mstd/inc keys)."""
    parts = policy.split("-")
    if parts[0] != "rand":
        raise ValueError(f"only 'rand-*' auto-augment policies are supported, "
                         f"got {policy!r}")
    cfg = dict(magnitude=9.0, num_layers=2, prob=0.5, mstd=0.0, increasing=False)
    for p in parts[1:]:
        m = re.match(r"([a-z]+)([0-9.]+)", p)
        if not m:
            raise ValueError(f"unparsable policy segment {p!r} in {policy!r}")
        key, val = m.group(1), float(m.group(2))
        if key == "m":
            cfg["magnitude"] = val
        elif key == "n":
            cfg["num_layers"] = int(val)
        elif key == "p":
            cfg["prob"] = val
        elif key == "mstd":
            cfg["mstd"] = val
        elif key == "inc":
            cfg["increasing"] = bool(int(val))
        else:
            raise ValueError(f"unsupported policy key {key!r} in {policy!r}")
    return cfg


# ---------------------------------------------------------------- PIL op math
# All ops take/return float32 images in the uint8 value domain [0, 255]
# (integer-valued between ops, like PIL's per-op uint8 quantization).

def _l_gray(img):
    """PIL convert('L'): L24(r,g,b) = (19595 r + 38470 g + 7471 b + 0x8000) >> 16."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    acc = 19595.0 * r + 38470.0 * g + 7471.0 * b + 32768.0
    return jnp.floor(acc / 65536.0 + _EPS)


def _blend(degenerate, img, factor):
    """PIL Image.blend / ImageEnhance: CLIP8((int)(im1 + f*(im2-im1)))."""
    out = jnp.floor(degenerate + factor * (img - degenerate) + _EPS)
    return jnp.clip(out, 0.0, 255.0)


def auto_contrast(img):
    """ImageOps.autocontrast(cutoff=0): per-channel stretch with int() LUT."""
    lo = jnp.min(img, axis=(1, 2), keepdims=True)
    hi = jnp.max(img, axis=(1, 2), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1.0)
    out = jnp.floor((img - lo) * scale + _EPS)
    return jnp.where(hi > lo, jnp.clip(out, 0.0, 255.0), img)


def equalize(img):
    """ImageOps.equalize: per-channel histogram LUT
    lut[i] = (step//2 + sum(h[:i])) // step, step = (n_px - h[255]) // 255."""
    B, H, W, C = img.shape
    pix = jnp.moveaxis(img.astype(jnp.int32), -1, 1).reshape(B * C, H * W)
    hist = jax.vmap(lambda v: jnp.zeros((256,), jnp.int32).at[v].add(1))(pix)
    step = (H * W - hist[:, 255]) // 255                       # (B*C,)
    cum = jnp.cumsum(hist, axis=1) - hist                      # sum(h[:i])
    lut = (step[:, None] // 2 + cum) // jnp.maximum(step, 1)[:, None]
    lut = jnp.clip(lut, 0, 255)
    out = jnp.take_along_axis(lut, pix, axis=1)                # (B*C, H*W)
    out = jnp.where(step[:, None] > 0, out, pix)               # step==0: identity
    out = jnp.moveaxis(out.reshape(B, C, H, W), 1, -1)
    return out.astype(img.dtype)


def invert(img):
    return 255.0 - img


def posterize(img, bits):
    """ImageOps.posterize: keep the top `bits` bits. bits (B,) traced int."""
    shift = jnp.exp2(8.0 - bits.astype(jnp.float32))[:, None, None, None]
    out = jnp.floor(img / shift) * shift
    return jnp.where(bits[:, None, None, None] >= 8, img, out)


def solarize(img, thresh):
    """ImageOps.solarize: invert pixels >= thresh. thresh (B,)."""
    t = thresh[:, None, None, None]
    return jnp.where(img < t, img, 255.0 - img)


def solarize_add(img, add, thresh: float = 128.0):
    """timm solarize_add: lut[i] = min(255, i + add) for i < thresh."""
    a = add[:, None, None, None]
    return jnp.where(img < thresh, jnp.clip(img + a, 0.0, 255.0), img)


def adjust_color(img, factor):
    """ImageEnhance.Color: blend(grayscale, img, factor)."""
    gray = _l_gray(img)[..., None]
    return _blend(jnp.broadcast_to(gray, img.shape), img, factor)


def adjust_contrast(img, factor):
    """ImageEnhance.Contrast: blend(solid int(mean_L + .5), img, factor)."""
    mean = jnp.floor(jnp.mean(_l_gray(img), axis=(1, 2)) + 0.5 + _EPS)
    deg = jnp.broadcast_to(mean[:, None, None, None], img.shape)
    return _blend(deg, img, factor)


def adjust_brightness(img, factor):
    """ImageEnhance.Brightness: blend(black, img, factor)."""
    return _blend(jnp.zeros_like(img), img, factor)


def adjust_sharpness(img, factor):
    """ImageEnhance.Sharpness: blend(img.filter(SMOOTH), img, factor).
    SMOOTH = 3x3 [[1,1,1],[1,5,1],[1,1,1]]/13; PIL filters leave the 1-px
    border unchanged (ImagingFilter computes interior only)."""
    w = jnp.array([1.0, 1.0, 1.0, 1.0, 5.0, 1.0, 1.0, 1.0, 1.0]) / 13.0
    acc = jnp.zeros_like(img)
    k = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            acc = acc + w[k] * jnp.roll(img, (-dy, -dx), axis=(1, 2))
            k += 1
    smooth = jnp.floor(acc + 0.5)                      # PIL rounds half up
    smooth = jnp.clip(smooth, 0.0, 255.0)
    # border-preserving: restore the outer ring from the source
    H, W = img.shape[1], img.shape[2]
    yi = jnp.arange(H)[None, :, None, None]
    xi = jnp.arange(W)[None, None, :, None]
    interior = (yi > 0) & (yi < H - 1) & (xi > 0) & (xi < W - 1)
    smooth = jnp.where(interior, smooth, img)
    return _blend(smooth, img, factor)


# ------------------------------------------------------- geometric matrices
# Centered inverse-affine rows (m00 m01 m02 m10 m11 m12) for affine_sample.
# PIL AFFINE matrices map output->input with a TOP-LEFT origin; converting to
# the centered form used by affine_sample: m02 += m00*cx + m01*cy - cx (and
# symmetrically for m12) — identity for the rotation (already centered).

def _geo_matrix(op, applied, mag, sign, H, W):
    """Per-image (B, 6) inverse matrix for ops 3/11/12/13/14; identity rows
    for every other (or unapplied) op."""
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    B = op.shape[0]
    ident = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0, 1.0, 0.0]), (B, 1))

    v = sign * mag
    # Rotate: PIL img.rotate(deg) — inverse map about center with a=-rad(deg)
    a = -jnp.deg2rad(v * 3.0)
    rot = jnp.stack([jnp.cos(a), jnp.sin(a), jnp.zeros(B),
                     -jnp.sin(a), jnp.cos(a), jnp.zeros(B)], axis=-1)
    # ShearX: src_x = x + f*y (top-left)  -> centered m02 = f*cy
    f = v * 0.03
    shx = jnp.stack([jnp.ones(B), f, f * cy,
                     jnp.zeros(B), jnp.ones(B), jnp.zeros(B)], axis=-1)
    shy = jnp.stack([jnp.ones(B), jnp.zeros(B), jnp.zeros(B),
                     f, jnp.ones(B), f * cx], axis=-1)
    # TranslateXRel/YRel: pixels = f * dim, src = out + pixels
    t = v * 0.045
    trx = jnp.stack([jnp.ones(B), jnp.zeros(B), t * W,
                     jnp.zeros(B), jnp.ones(B), jnp.zeros(B)], axis=-1)
    try_ = jnp.stack([jnp.ones(B), jnp.zeros(B), jnp.zeros(B),
                      jnp.zeros(B), jnp.ones(B), t * H], axis=-1)

    m = ident
    pick = lambda i, mat: jnp.where(((op == i) & applied)[:, None], mat, m)
    m = pick(3, rot)
    m = pick(11, shx)
    m = pick(12, shy)
    m = pick(13, trx)
    m = pick(14, try_)
    return m


_GEO_OPS = (3, 11, 12, 13, 14)


def _rand_augment_layer(key, img, magnitude, mstd, prob, increasing):
    """One RandAugment layer: per image, draw one of the 15 ops and apply it
    w.p. `prob` at magnitude N(magnitude, mstd) clipped to [0, 10]."""
    B, H, W, C = img.shape
    kop, kap, kmag, ksgn = jax.random.split(key, 4)
    op = jax.random.randint(kop, (B,), 0, 15)
    applied = jax.random.uniform(kap, (B,)) < prob
    mag = magnitude + mstd * jax.random.normal(kmag, (B,))
    mag = jnp.clip(mag, 0.0, 10.0)
    sign = jnp.where(jax.random.uniform(ksgn, (B,)) > 0.5, -1.0, 1.0)

    # one batched warp serves all 5 geometric ops (identity rows are exact)
    m = _geo_matrix(op, applied, mag, sign, H, W)
    img = affine_sample(img, m, fill=FILL, mode="bilinear")
    img = jnp.clip(jnp.floor(img + 0.5), 0.0, 255.0)   # PIL requantizes to u8

    sel = lambda i: ((op == i) & applied)[:, None, None, None]
    # magnitude -> op arg (timm level_to_arg fns; truncation like int())
    if increasing:
        bits = 4 - jnp.floor(mag * 0.4 + _EPS).astype(jnp.int32)
        thresh = 256.0 - jnp.floor(mag * 25.6 + _EPS)
        enh = jnp.maximum(0.1, 1.0 + sign * mag * 0.09)
    else:
        bits = jnp.floor(mag * 0.4 + _EPS).astype(jnp.int32)
        thresh = jnp.floor(mag * 25.6 + _EPS)
        enh = (mag / 10.0) * 1.8 + 0.1
    add = jnp.floor(mag * 11.0 + _EPS)
    enh4 = enh[:, None, None, None]

    img = jnp.where(sel(0), auto_contrast(img), img)
    img = jnp.where(sel(1), equalize(img), img)
    img = jnp.where(sel(2), invert(img), img)
    img = jnp.where(sel(4), posterize(img, bits), img)
    img = jnp.where(sel(5), solarize(img, thresh), img)
    img = jnp.where(sel(6), solarize_add(img, add), img)
    img = jnp.where(sel(7), adjust_color(img, enh4), img)
    img = jnp.where(sel(8), adjust_contrast(img, enh4), img)
    img = jnp.where(sel(9), adjust_brightness(img, enh4), img)
    img = jnp.where(sel(10), adjust_sharpness(img, enh4), img)
    return img


def rand_augment(key, img_u8f, policy_cfg: dict):
    """Apply `num_layers` RandAugment layers to a [0,255]-domain float batch."""
    keys = jax.random.split(key, policy_cfg["num_layers"])
    for k in keys:
        img_u8f = _rand_augment_layer(k, img_u8f, policy_cfg["magnitude"],
                                      policy_cfg["mstd"], policy_cfg["prob"],
                                      policy_cfg["increasing"])
    return img_u8f


# ------------------------------------------------------------ random erasing

def random_erasing(key, img, prob: float, min_area=0.02, max_area=1 / 3,
                   min_aspect=0.3):
    """timm RandomErasing (re_mode='pixel', re_count=1): w.p. `prob`, erase one
    rectangle (area U(0.02, 1/3)·HW, log-uniform aspect in [0.3, 1/0.3], first
    of 10 attempts that fits) with per-pixel N(0,1) noise — on the NORMALIZED
    tensor, like timm applies it after Normalize."""
    B, H, W, C = img.shape
    ka, kr, kt, kl, kp, kn = jax.random.split(key, 6)
    A = 10   # timm's fixed attempt count
    area = jax.random.uniform(ka, (B, A), minval=min_area, maxval=max_area) * H * W
    log_r = jax.random.uniform(kr, (B, A), minval=jnp.log(min_aspect),
                               maxval=jnp.log(1.0 / min_aspect))
    ar = jnp.exp(log_r)
    h = jnp.round(jnp.sqrt(area * ar)).astype(jnp.int32)
    w = jnp.round(jnp.sqrt(area / ar)).astype(jnp.int32)
    valid = (h < H) & (w < W)
    first = jnp.argmax(valid, axis=1)                     # first fitting attempt
    any_valid = jnp.any(valid, axis=1)
    pick = lambda x: jnp.take_along_axis(x, first[:, None], axis=1)[:, 0]
    h, w = pick(h), pick(w)
    # random.randint(0, dim - h) is INCLUSIVE of both ends
    top = jnp.floor(jax.random.uniform(kt, (B,)) * (H - h + 1)).astype(jnp.int32)
    left = jnp.floor(jax.random.uniform(kl, (B,)) * (W - w + 1)).astype(jnp.int32)

    apply = (jax.random.uniform(kp, (B,)) < prob) & any_valid
    yi = jnp.arange(H)[None, :, None]
    xi = jnp.arange(W)[None, None, :]
    mask = ((yi >= top[:, None, None]) & (yi < (top + h)[:, None, None])
            & (xi >= left[:, None, None]) & (xi < (left + w)[:, None, None]))
    mask = mask & apply[:, None, None]
    noise = jax.random.normal(kn, img.shape, img.dtype)
    return jnp.where(mask[..., None], noise, img)


# ---------------------------------------------------------------- pipelines

@functools.partial(jax.jit, static_argnames=("out_size",))
def probe_train_batch(key, img_u8, out_size: int = 224):
    """Linear-probe train transform: RandomResizedCrop(224) + hflip + normalize
    ONLY (`main_lincls.py:273-274`, `main_linprobe.py:133-134`) — none of the
    GI-task jitter/blur/rotation stack."""
    img = img_u8.astype(jnp.float32) / 255.0
    kc, kf = jax.random.split(key)
    v = random_resized_crop(kc, img, out_size, scale=(0.08, 1.0))
    B = v.shape[0]
    flip = jax.random.uniform(kf, (B, 1, 1, 1)) > 0.5
    v = jnp.where(flip, v[:, :, ::-1], v)
    return normalize(v)


@functools.partial(jax.jit, static_argnames=("out_size", "policy", "reprob"))
def timm_train_batch(key, img_u8, out_size: int = 224,
                     policy: str = "rand-m9-mstd0.5-inc1",
                     reprob: float = 0.25):
    """The timm `create_transform(is_training=True)` stack the MAE finetune
    recipe uses (`Models/mae/util/datasets.py:36-48`): RandomResizedCrop
    (scale 0.08-1.0) + hflip + RandAugment + normalize + RandomErasing,
    fused into one device program. `policy=None`/'' skips RandAugment."""
    kc, kf, ka, ke = jax.random.split(key, 4)
    img = img_u8.astype(jnp.float32)            # [0, 255] domain for PIL math
    v = random_resized_crop(kc, img, out_size, scale=(0.08, 1.0))
    v = jnp.clip(jnp.floor(v + 0.5), 0.0, 255.0)   # PIL crop yields uint8
    B = v.shape[0]
    flip = jax.random.uniform(kf, (B, 1, 1, 1)) > 0.5
    v = jnp.where(flip, v[:, :, ::-1], v)
    if policy:
        v = rand_augment(ka, v, parse_rand_augment(policy))
    v = normalize(v / 255.0)
    if reprob > 0:
        v = random_erasing(ke, v, reprob)
    return v
