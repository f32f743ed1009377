"""On-device, jit-fused batch augmentation.

TPU-native redesign of the reference's CPU/PIL augmentation stack
(`Binary_segmentation/Data/dataloaders.py:62-71`, `Data/dataset.py:46-63`): instead of
8 PIL worker processes per GPU, the host only decodes+resizes; everything else —
ColorJitter(0.4,0.5,0.25,0.01), GaussianBlur(25x25, sigma U[0.001,2]), ImageNet
normalize, joint h/v flips, and the full random affine (±180° rotation, ±1/8
translation, 0.5–1.5 scale, ±22.5° shear, fill -1 image / 0 target) — runs on device
as one fused XLA program per batch, keyed by `jax.random`.

Convention: images are (B, H, W, C) float32 in [0,1] before normalization; geometric
ops take image+target jointly so masks stay aligned. Affine sampling is nearest-
neighbor like torchvision's tensor-path default (`TF.affine` interpolation=NEAREST).
"""

from __future__ import annotations

import functools
import itertools
import os

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def normalize(img):
    # dtype-preserving: bf16 pipelines (the on-device TPU aug paths) stay bf16;
    # f32 callers see bit-identical behavior (astype is a no-op there)
    return ((img - IMAGENET_MEAN.astype(img.dtype))
            / IMAGENET_STD.astype(img.dtype))


def denormalize(img):
    return img * IMAGENET_STD + IMAGENET_MEAN


# ---------------------------------------------------------------- color jitter

def _blend(a, b, factor):
    return jnp.clip(b + factor * (a - b), 0.0, 1.0)


def _grayscale(img):
    w = jnp.array([0.299, 0.587, 0.114], img.dtype)   # ITU-R 601-2, as torchvision
    return jnp.sum(img * w, axis=-1, keepdims=True)


def _adjust_brightness(img, f):
    return jnp.clip(img * f, 0.0, 1.0)


def _adjust_contrast(img, f):
    mean = jnp.mean(_grayscale(img), axis=(1, 2, 3), keepdims=True)
    return _blend(img, mean, f)


def _adjust_saturation(img, f):
    return _blend(img, _grayscale(img), f)


def _rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    v = maxc
    deltac = maxc - minc
    s = jnp.where(maxc > 0, deltac / jnp.maximum(maxc, 1e-12), 0.0)
    safe_d = jnp.where(deltac > 0, deltac, 1.0)
    rc = (maxc - r) / safe_d
    gc = (maxc - g) / safe_d
    bc = (maxc - b) / safe_d
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(deltac > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6

    def pick(options):
        # select chain instead of jnp.choose: choose lowers to per-element
        # gathers on TPU (~50x slower); where-chains stay on the VPU.
        out = options[-1]
        for idx in range(len(options) - 2, -1, -1):
            out = jnp.where(i == idx, options[idx], out)
        return out

    r = pick([v, q, p, p, t, v])
    g = pick([t, v, v, q, p, p])
    b = pick([p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _adjust_hue(img, f):
    # f: (B, 1, 1) broadcasting over the (B, H, W) hue plane
    h, s, v = _rgb_to_hsv(img)
    return _hsv_to_rgb((h + f) % 1.0, s, v)


_JITTER_PERMS = np.array(list(itertools.permutations(range(4))), np.int32)


def color_jitter(key, img, brightness=0.4, contrast=0.5, saturation=0.25,
                 hue=0.01, per_image: bool = False):
    """Per-image factors; op order randomized per batch by default (torchvision
    randomizes per image — the batch-level order is a deliberate SPMD-friendly
    relaxation, PARITY deviation #2). per_image=True samples a uniform
    per-image permutation of the 4 ops exactly like torchvision's ColorJitter:
    each scan step then evaluates all 4 ops and per-image selects the one at
    that position (4x the op evaluations — opt in via
    SSL4GIE_PER_IMAGE_JITTER=1 through `augment_train_batch`)."""
    B = img.shape[0]
    kb, kc, ks, kh, ko = jax.random.split(key, 5)
    shape = (B, 1, 1, 1)
    dt = img.dtype   # keep the pipeline in the input dtype (bf16 on-device aug)
    fb = jax.random.uniform(kb, shape, minval=1 - brightness,
                            maxval=1 + brightness).astype(dt)
    fc = jax.random.uniform(kc, shape, minval=1 - contrast,
                            maxval=1 + contrast).astype(dt)
    fs = jax.random.uniform(ks, shape, minval=1 - saturation,
                            maxval=1 + saturation).astype(dt)
    fh = jax.random.uniform(kh, (B, 1, 1), minval=-hue, maxval=hue).astype(dt)

    ops = [lambda x: _adjust_brightness(x, fb),
           lambda x: _adjust_contrast(x, fc),
           lambda x: _adjust_saturation(x, fs),
           lambda x: _adjust_hue(x, fh)]

    if per_image:
        perm_idx = jax.random.randint(ko, (B,), 0, len(_JITTER_PERMS))
        orders = jnp.asarray(_JITTER_PERMS)[perm_idx]        # (B, 4)

        def apply_step(x, idx_b):
            outs = [op(x) for op in ops]
            idxr = idx_b.reshape(B, 1, 1, 1)
            out = outs[-1]
            for j in range(len(outs) - 2, -1, -1):
                out = jnp.where(idxr == j, outs[j], out)
            return out, None

        img, _ = jax.lax.scan(apply_step, img, orders.T)     # step-major
        return img

    order = jax.random.permutation(ko, 4)

    def apply_op(x, idx):
        return jax.lax.switch(idx, ops, x), None

    img, _ = jax.lax.scan(apply_op, img, order)
    return img


# ---------------------------------------------------------------- gaussian blur

def gaussian_blur(key, img, kernel_size: int = 25, sigma_range=(0.001, 2.0)):
    """Separable 25-tap Gaussian with a per-image sigma; reflect padding like
    torchvision. Implemented as static shifted adds — XLA fuses to VPU code."""
    B, H, W, C = img.shape
    k = kernel_size // 2
    sigma = jax.random.uniform(key, (B, 1), minval=sigma_range[0],
                               maxval=sigma_range[1])
    xs = jnp.arange(-k, k + 1, dtype=jnp.float32)[None, :]
    w = jnp.exp(-0.5 * (xs / sigma) ** 2)
    w = (w / jnp.sum(w, axis=1, keepdims=True)).astype(img.dtype)   # (B, K)

    def conv_axis(x, axis):
        pad = [(0, 0)] * 4
        pad[axis] = (k, k)
        xp = jnp.pad(x, pad, mode="reflect")
        out = jnp.zeros_like(x)
        for i in range(kernel_size):
            sl = jax.lax.slice_in_dim(xp, i, i + x.shape[axis], axis=axis)
            out = out + sl * w[:, i].reshape(B, 1, 1, 1)
        return out

    return conv_axis(conv_axis(img, 1), 2)


# ---------------------------------------------------------------- geometric

def random_flips(key, img, target=None, hflip=True, vflip=True):
    """Joint per-image flips (prob 0.5 each, like `Data/dataset.py:46-54`)."""
    B = img.shape[0]
    kh, kv = jax.random.split(key)
    do_h = jax.random.uniform(kh, (B, 1, 1, 1)) > 0.5 if hflip else None
    do_v = jax.random.uniform(kv, (B, 1, 1, 1)) > 0.5 if vflip else None

    def apply(x):
        if x is None:
            return None
        if hflip:
            x = jnp.where(do_h, x[:, :, ::-1], x)
        if vflip:
            x = jnp.where(do_v, x[:, ::-1], x)
        return x

    return apply(img), apply(target)


def _inverse_affine_matrix(angle_deg, translate, scale, shear_deg):
    """torchvision `_get_inverse_affine_matrix` with center=(0,0): returns the 2x3
    matrix mapping centered output coords -> centered input coords. All args (B,)."""
    rot = jnp.deg2rad(angle_deg)
    sx = jnp.deg2rad(shear_deg)
    sy = jnp.zeros_like(sx)
    tx, ty = translate[:, 0], translate[:, 1]

    a = jnp.cos(rot - sy) / jnp.cos(sy)
    b = -jnp.cos(rot - sy) * jnp.tan(sx) / jnp.cos(sy) - jnp.sin(rot)
    c = jnp.sin(rot - sy) / jnp.cos(sy)
    d = -jnp.sin(rot - sy) * jnp.tan(sx) / jnp.cos(sy) + jnp.cos(rot)

    inv_scale = 1.0 / scale
    m00, m01 = d * inv_scale, -b * inv_scale
    m10, m11 = -c * inv_scale, a * inv_scale
    m02 = m00 * (-tx) + m01 * (-ty)
    m12 = m10 * (-tx) + m11 * (-ty)
    return jnp.stack([m00, m01, m02, m10, m11, m12], axis=-1)   # (B, 6)


def affine_sample(img, matrix, fill: float, mode: str = "nearest"):
    """Apply per-image inverse affine matrices to (B, H, W, C). Out-of-bounds -> fill."""
    B, H, W, C = img.shape
    ys = jnp.arange(H, dtype=jnp.float32) - (H - 1) / 2.0
    xs = jnp.arange(W, dtype=jnp.float32) - (W - 1) / 2.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")                # (H, W)

    m = matrix.reshape(B, 2, 3)
    src_x = (m[:, 0, 0, None, None] * gx + m[:, 0, 1, None, None] * gy
             + m[:, 0, 2, None, None]) + (W - 1) / 2.0
    src_y = (m[:, 1, 0, None, None] * gx + m[:, 1, 1, None, None] * gy
             + m[:, 1, 2, None, None]) + (H - 1) / 2.0

    if mode == "nearest":
        ix = jnp.round(src_x).astype(jnp.int32)
        iy = jnp.round(src_y).astype(jnp.int32)
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        ixc = jnp.clip(ix, 0, W - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        gathered = jax.vmap(lambda im, yy, xx: im[yy, xx])(img, iyc, ixc)
        return jnp.where(valid[..., None], gathered, fill)

    # bilinear with fill outside
    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    wx = src_x - x0
    wy = src_y - y0

    def tap(dy, dx):
        ix = x0.astype(jnp.int32) + dx
        iy = y0.astype(jnp.int32) + dy
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        g = jax.vmap(lambda im, yy, xx: im[yy, xx])(
            img, jnp.clip(iy, 0, H - 1), jnp.clip(ix, 0, W - 1))
        return jnp.where(valid[..., None], g, fill)

    top = tap(0, 0) * (1 - wx)[..., None] + tap(0, 1) * wx[..., None]
    bot = tap(1, 0) * (1 - wx)[..., None] + tap(1, 1) * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def _roll_select(x, shift_nonneg, axis: int, nbits: int, bcast_shape):
    """Per-slice circular roll via binary shift decomposition.

    Returns y with y[..., i, ...] = x[..., (i + s) mod N, ...] along `axis`, where
    s = shift_nonneg varies per slice orthogonal to `axis` (broadcast via
    `bcast_shape`). Implemented as `nbits` static rolls + elementwise selects —
    no gather. TPU gathers cost ~11 ns/element; this runs at VPU/copy speed.
    """
    for j in range(nbits):
        bit = ((shift_nonneg >> j) & 1).astype(bool).reshape(bcast_shape)
        x = jnp.where(bit, jnp.roll(x, -(1 << j), axis=axis), x)
    return x


def rotate_nearest_shear(img, angle_deg, fill: float = 0.0):
    """Arbitrary-angle nearest rotation without gathers: rot90 fold + Paeth 3-shear.

    Matches `affine_sample(_inverse_affine_matrix(angle, 0, 1, 0))` semantics
    (the reference's `transforms.RandomRotation(180)` tensor equivalent,
    `Classification/Data/dataloaders.py:69`) up to the independent nearest
    rounding of the three shear passes (~1-3% of pixels pick an adjacent source
    pixel; exact at multiples of 90 deg).

    Angle is folded to 90q + r with r in [-45, 45]; the q part is an exact pixel
    permutation (transpose + reversals), the residual is Shx(tan r/2) * Shy(-sin r)
    * Shx(tan r/2). Each shear is a per-row/column constant integer shift,
    executed as O(log K) static roll+select passes (`_roll_select`) on a canvas
    padded by P columns — 22 VPU passes total vs one ~11 ns/element gather, a
    ~7x step-time win on v5e at 224 px.
    """
    B, H, W, C = img.shape
    if H != W:
        raise ValueError("rotate_nearest_shear requires square images")
    c = (H - 1) / 2.0
    theta = jnp.deg2rad(angle_deg)
    q = jnp.round(theta / (0.5 * jnp.pi)).astype(jnp.int32)
    r = theta - q.astype(jnp.float32) * (0.5 * jnp.pi)
    qm = jnp.mod(q, 4)[:, None, None, None]

    # rot90^q as an exact permutation: g[y, x] = img[rot90q(y, x)]
    xt = jnp.swapaxes(img, 1, 2)
    g = jnp.where(qm == 0, img,
        jnp.where(qm == 1, xt[:, :, ::-1],
        jnp.where(qm == 2, img[:, ::-1, ::-1], xt[:, ::-1, :])))

    alpha = jnp.tan(r / 2.0)                      # |alpha| <= tan(22.5)
    beta = -jnp.sin(r)                            # |beta|  <= sin(45)
    P = int(np.ceil(np.tan(np.pi / 8) * c)) + 1   # shear-x shift bound + 1

    from ssl4gie_tpu.models.layers import pallas_backend
    if pallas_backend() == "tpu":
        # VMEM-resident shears: same math, ~7x less HBM traffic. Multi-device:
        # Mosaic custom calls cannot be auto-partitioned, so wrap the call in
        # a shard_map over the batch (models/layers.shard_pallas_over_batch)
        from ssl4gie_tpu.kernels.rotate import shear_rotate_pallas
        from ssl4gie_tpu.models.layers import shard_pallas_over_batch
        call = shard_pallas_over_batch(
            lambda gg, a, b: shear_rotate_pallas(gg, a, b, P, fill),
            B, (4, 1, 1), 4)
        if call is not None:
            return call(g, alpha, beta)

    Wp = W + 2 * P
    ys = jnp.arange(H, dtype=jnp.float32) - c
    s1 = jnp.round(alpha[:, None] * ys).astype(jnp.int32)            # (B, H)
    xs = jnp.arange(Wp, dtype=jnp.float32) - P - c
    s2 = jnp.round(beta[:, None] * xs).astype(jnp.int32)             # (B, Wp)
    S2 = int(np.ceil(np.sin(np.pi / 4) * (W / 2.0 - 0.5 + P)))

    pad = jnp.full((B, H, P, C), fill, img.dtype)
    t = jnp.concatenate([pad, g, pad], axis=2)                       # (B, H, Wp, C)

    def nbits_for(lo, hi):
        return max(1, int(np.ceil(np.log2(hi - lo + 1))))

    # pass A (x-shear): tA[y, j] = t[y, (j + s1(y)) mod Wp], fill outside source
    lo1 = -(P - 1)
    tA = jnp.roll(t, -lo1, axis=2)
    tA = _roll_select(tA, s1 - lo1, 2, nbits_for(lo1, P - 1), (B, H, 1, 1))
    jx = jnp.arange(Wp)[None, None, :, None] - P
    src1 = jx + s1[:, :, None, None]
    tA = jnp.where((src1 >= 0) & (src1 < W), tA, fill)

    # pass B (y-shear): tB[y, j] = tA[(y + s2(j)) mod H, j]
    tB = jnp.roll(tA, S2, axis=1)
    tB = _roll_select(tB, s2 + S2, 1, nbits_for(-S2, S2), (B, 1, Wp, 1))
    yv = jnp.arange(H)[None, :, None, None]
    src2 = yv + s2[:, None, :, None]
    tB = jnp.where((src2 >= 0) & (src2 < H), tB, fill)

    # pass C (x-shear): out[y, x] = tB[y, x + P + s1(y)]  (always in canvas)
    tC = jnp.roll(tB, -1, axis=2)
    tC = _roll_select(tC, P + s1 - 1, 2, nbits_for(1, 2 * P - 1), (B, H, 1, 1))
    return tC[:, :, :W]


def _one_hot_resample(x, idx, axis: int, n_src: int):
    """Per-image 1-D nearest resample along `axis` via a one-hot matmul.

    x: (B, H, W, C); idx: (B, L_out) int32 source indices (out-of-range rows
    produce exact zeros -> fill 0). Gathers cost ~11 ns/element on TPU; the
    equivalent one-hot contraction runs on the MXU at matmul speed — the
    standard TPU trick for shared-per-row index maps.
    """
    src = jnp.arange(n_src, dtype=jnp.int32)
    onehot = (idx[:, :, None] == src[None, None, :]).astype(x.dtype)  # (B,L,S)
    if axis == 2:
        return jnp.einsum("bhwc,bxw->bhxc", x, onehot)
    return jnp.einsum("bhwc,byh->bywc", x, onehot)


def fast_random_affine(key, img, target=None, *, degrees=180.0,
                       translate_frac=0.125, scale_range=(0.5, 1.5),
                       shear=22.5, img_fill=-1.0, target_fill=0.0):
    """Gather-free random affine: same parameter distribution as
    `random_affine` (identical key splits), sampled through the exact
    factorization of torchvision's inverse matrix

        M = (1/s) * Shx(tan(shear)) * R(angle)         (+ translation T)

    as three passes: (1) scale+translate — two per-image one-hot MXU matmuls
    onto a 512px canvas (T folds into the index maps); (2) the x-shear — a
    static-offset binary roll/select onto 352px; (3) the rotation — the Paeth
    3-shear pipeline (`rotate_nearest_shear`, Pallas on TPU), then a center
    crop. A constant validity channel rides along so image/target fills are
    applied exactly afterwards. Nearest rounding happens once per pass instead
    of once total, so ~a third of pixels resolve to an adjacent source pixel
    vs the one-pass gather (distribution-equivalent; tested). ~52 ms -> ~12 ms
    per 48x224px seg batch on v5e.
    """
    B, H, W, C = img.shape
    if H != W:
        raise ValueError("fast_random_affine requires square images")
    ka, kt, ks, ksh = jax.random.split(key, 4)
    angle = jax.random.uniform(ka, (B,), minval=-degrees, maxval=degrees)
    trans = jax.random.uniform(kt, (B, 2), minval=-translate_frac,
                               maxval=translate_frac) * jnp.array([W, H],
                                                                  jnp.float32)
    scale = jax.random.uniform(ks, (B,), minval=scale_range[0],
                               maxval=scale_range[1])
    sh = jax.random.uniform(ksh, (B,), minval=-shear, maxval=shear)
    m = _inverse_affine_matrix(angle, trans, scale, sh)     # (B, 6)
    inv_s = 1.0 / scale
    u = jnp.tan(jnp.deg2rad(sh))                            # x-shear factor
    tx, ty = m[:, 2], m[:, 5]                               # translation T

    # stack target + validity as extra channels; all passes warp with fill 0.
    # The target rides in the IMAGE dtype: a concat with an f32 target would
    # silently promote a bf16 image pipeline back to f32, and the warp is pure
    # nearest-neighbor selection (one-hot matmuls + rolls), so the bf16
    # round-trip is exact for 0/1 masks; the original dtype is restored below.
    parts = [img]
    if target is not None:
        parts.append(target.astype(img.dtype))
    parts.append(jnp.ones((B, H, W, 1), img.dtype))
    x = jnp.concatenate(parts, axis=-1)

    # Canvas sizes derive from H (512/352/80 at the reference's 224 px).
    # S2 keeps the validated >=1.571*H margin so the 3-shear rotation's reads
    # stay inside the canvas; S1 covers pass 2's worst-case column reads
    # [off-K, off+S2+K) because S1 >= S2 + 2K (so off=(S1-S2)//2 >= K).
    S2 = int(np.ceil(352 * H / 224 / 8.0)) * 8
    c2 = (S2 - 1) / 2.0
    K = int(np.ceil(np.tan(np.pi / 8) * c2)) + 1            # |k| bound
    S1 = max(int(np.ceil(512 * H / 224 / 8.0)) * 8, S2 + 2 * K)

    # pass 1: t1(p) = in(p * inv_s + T) on the S1 canvas (out-of-range reads
    # produce exact zeros via the one-hot resample)
    c_in = (H - 1) / 2.0
    c1 = (S1 - 1) / 2.0
    grid1 = jnp.arange(S1, dtype=jnp.float32) - c1
    ix = jnp.round(grid1[None, :] * inv_s[:, None] + tx[:, None] + c_in
                   ).astype(jnp.int32)
    iy = jnp.round(grid1[None, :] * inv_s[:, None] + ty[:, None] + c_in
                   ).astype(jnp.int32)
    t1 = _one_hot_resample(x, ix, axis=2, n_src=W)
    t1 = _one_hot_resample(t1, iy, axis=1, n_src=H)         # (B, 512, 512, C+)

    # pass 2: t2(p) = t1(Shx(u) p) on the S2 canvas. t2[y, x] =
    # t1[y + off, x + off + round(u * y_c)]; reads stay inside [off-K,
    # off+S2+K) c [0, S1) so no mask is needed — just a static pre-roll and
    # the binary roll/select.
    off = (S1 - S2) // 2
    y2 = jnp.arange(S2, dtype=jnp.float32) - c2
    k = jnp.round(u[:, None] * y2[None, :]).astype(jnp.int32)   # (B, S2)
    t2 = t1[:, off:off + S2]
    t2 = jnp.roll(t2, -(off - K), axis=2)
    t2 = _roll_select(t2, k + K, 2, max(1, int(np.ceil(np.log2(2 * K + 1)))),
                      (B, S2, 1, 1))
    t2 = t2[:, :, :S2]

    # pass 3: rotate the 352 canvas, crop the center 224
    t3 = rotate_nearest_shear(t2, angle, fill=0.0)
    lo = (S2 - H) // 2
    t3 = t3[:, lo:lo + H, lo:lo + W]

    valid = t3[..., -1:] > 0.5
    out_img = jnp.where(valid, t3[..., :C], img_fill)
    out_tgt = None
    if target is not None:
        Ct = target.shape[-1]
        out_tgt = jnp.where(valid, t3[..., C:C + Ct],
                            target_fill).astype(target.dtype)
    return out_img, out_tgt


def random_affine(key, img, target=None, *, degrees=180.0, translate_frac=0.125,
                  scale_range=(0.5, 1.5), shear=22.5, img_fill=-1.0,
                  target_fill=0.0, mode: str = "nearest"):
    """Joint random affine matching `Data/dataset.py:55-63` parameter ranges."""
    B, H, W, _ = img.shape
    ka, kt, ks, ksh = jax.random.split(key, 4)
    angle = jax.random.uniform(ka, (B,), minval=-degrees, maxval=degrees)
    trans = jax.random.uniform(kt, (B, 2), minval=-translate_frac,
                               maxval=translate_frac) * jnp.array([W, H], jnp.float32)
    scale = jax.random.uniform(ks, (B,), minval=scale_range[0], maxval=scale_range[1])
    sh = jax.random.uniform(ksh, (B,), minval=-shear, maxval=shear)
    m = _inverse_affine_matrix(angle, trans, scale, sh)
    out_img = affine_sample(img, m, img_fill, mode)
    out_tgt = affine_sample(target, m, target_fill, mode) if target is not None else None
    return out_img, out_tgt


# ---------------------------------------------------------------- mixup/cutmix

def mixup_cutmix(key, img, soft_targets, *, mixup_alpha: float = 0.8,
                 cutmix_alpha: float = 1.0, switch_prob: float = 0.5):
    """Batch-mode Mixup/CutMix like timm's `Mixup(mode='batch')`
    (`Models/mae/main_finetune.py:219-226`): one lambda per batch, each sample
    mixed with its reverse-order partner; a coin flip picks mixup vs cutmix.
    CutMix pastes a centered-random box from the partner and corrects lambda to
    the exact area ratio. img (B,H,W,C) float, soft_targets (B,n) float.
    Fully on-device and branchless (both variants are cheap selects)."""
    B, H, W, _ = img.shape
    k_lam_m, k_lam_c, k_switch, k_y, k_x = jax.random.split(key, 5)
    flip = lambda t: t[::-1]

    use_cutmix = (cutmix_alpha > 0) and (
        mixup_alpha <= 0 or jax.random.uniform(k_switch, ()) < switch_prob)

    def apply_mixup(_):
        lam = jax.random.beta(k_lam_m, mixup_alpha, mixup_alpha) \
            if mixup_alpha > 0 else jnp.float32(1.0)
        mixed = lam * img + (1 - lam) * flip(img)
        return mixed, lam.astype(jnp.float32)

    def apply_cutmix(_):
        lam0 = jax.random.beta(k_lam_c, cutmix_alpha, cutmix_alpha) \
            if cutmix_alpha > 0 else jnp.float32(1.0)
        ratio = jnp.sqrt(1.0 - lam0)
        cut_h = (H * ratio).astype(jnp.int32)
        cut_w = (W * ratio).astype(jnp.int32)
        cy = jax.random.randint(k_y, (), 0, H)
        cx = jax.random.randint(k_x, (), 0, W)
        y0 = jnp.clip(cy - cut_h // 2, 0, H)
        y1 = jnp.clip(cy + cut_h // 2, 0, H)
        x0 = jnp.clip(cx - cut_w // 2, 0, W)
        x1 = jnp.clip(cx + cut_w // 2, 0, W)
        yy = jnp.arange(H)[:, None]
        xx = jnp.arange(W)[None, :]
        box = ((yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1))[None, :, :, None]
        mixed = jnp.where(box, flip(img), img)
        lam = 1.0 - ((y1 - y0) * (x1 - x0)) / jnp.float32(H * W)
        return mixed, lam.astype(jnp.float32)

    if isinstance(use_cutmix, bool):
        mixed, lam = (apply_cutmix if use_cutmix else apply_mixup)(None)
    else:
        mixed, lam = jax.lax.cond(use_cutmix, apply_cutmix, apply_mixup, None)
    targets = lam * soft_targets + (1 - lam) * flip(soft_targets)
    return mixed, targets


# ---------------------------------------------------------------- pipelines

def exact_affine_enabled() -> bool:
    """Opt-in exact geometric augmentation (`SSL4GIE_EXACT_AFFINE=1`).

    Default (off): classification rotation runs through the Paeth 3-shear
    pipeline and the seg affine through the factorized matmul/roll warp — both
    distribution-equivalent but with per-pass nearest rounding (~30% of pixels
    resolve to an adjacent source pixel vs the one-pass sampler). With the flag
    set, both route through the exact one-pass nearest gather (`affine_sample`),
    bit-matching torchvision's `F.rotate`/`F.affine` nearest semantics
    (`Binary_segmentation/Data/dataset.py:46-63`,
    `Classification/Data/dataloaders.py:69`) at a measured step-time cost
    (see docs/PARITY.md round-5 exact-affine A/B).
    """
    return os.environ.get("SSL4GIE_EXACT_AFFINE", "0") == "1"


def per_image_jitter_enabled() -> bool:
    """Opt-in per-image ColorJitter op order (`SSL4GIE_PER_IMAGE_JITTER=1`),
    matching torchvision's per-__call__ permutation exactly (PARITY deviation
    #2) at ~4x the jitter op evaluations."""
    return os.environ.get("SSL4GIE_PER_IMAGE_JITTER", "0") == "1"


def augment_train_batch(key, img_u8, target=None, *, mode: str = "segmentation",
                        exact: bool | None = None,
                        per_image_jitter: bool | None = None):
    """The fused train-time augmentation program. One jitted call per batch.

    img_u8: (B, H, W, 3) uint8 (host-decoded+resized). target: optional
    (B, H, W, Ct) float, geometrically locked to the image.

    modes (matching each task's reference transform stack):
    - classification: jitter+blur -> h/v flips -> rotation ±180° (fill 0, on the
      unnormalized image, like PIL RandomRotation before ToTensor) -> normalize
      (`Classification/Data/dataloaders.py:62-74`).
    - segmentation: jitter+blur -> normalize -> joint flips -> joint full affine
      (fill -1 img / 0 target, post-normalize like the reference's tensor-space
      TF.affine) (`Binary_segmentation/Data/dataset.py:46-63`).
    - depth: jitter+blur -> normalize -> joint flips only
      (`Depth_estimation/Data/dataset.py:55-63`).

    exact: route the geometric warp through the exact one-pass gather sampler
    instead of the shear/factorized fast path; None reads SSL4GIE_EXACT_AFFINE.
    """
    if exact is None:
        exact = exact_affine_enabled()
    if per_image_jitter is None:
        per_image_jitter = per_image_jitter_enabled()
    return _augment_train_batch(key, img_u8, target, mode=mode, exact=exact,
                                per_image_jitter=per_image_jitter)


@functools.partial(jax.jit,
                   static_argnames=("mode", "exact", "per_image_jitter"))
def _augment_train_batch(key, img_u8, target=None, *, mode: str,
                         exact: bool = False, per_image_jitter: bool = False):
    kj, kb, kf, ka = jax.random.split(key, 4)
    if mode == "classification":
        # the whole classification aug runs in bf16 on TPU: the model consumes
        # bf16 anyway, and bf16's ~3-decimal-digit resolution on [0,1] sits at
        # the uint8 quantization floor the pipeline starts from. Targets are
        # untouched (labels). Halves the aug's HBM traffic.
        dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        img = img_u8.astype(dt) / 255.0
        img = color_jitter(kj, img, per_image=per_image_jitter)
        img = gaussian_blur(kb, img)
        img, _ = random_flips(kf, img)
        B = img.shape[0]
        angle = jax.random.uniform(ka, (B,), minval=-180.0, maxval=180.0)
        if exact:
            # one-pass nearest gather: torchvision F.rotate bit-semantics
            m = _inverse_affine_matrix(angle, jnp.zeros((B, 2)),
                                       jnp.ones((B,)), jnp.zeros((B,)))
            img = affine_sample(img, m, fill=0.0, mode="nearest")
        else:
            # gather-free rotation: rot90 fold + Paeth 3-shear roll/select
            img = rotate_nearest_shear(img, angle, fill=0.0)
        return normalize(img.astype(jnp.float32)), target

    # seg/depth run bf16 on TPU too (same rationale as the classification
    # branch). Targets keep their own dtype: the flips are pure selections,
    # and fast_random_affine's one-hot nearest-neighbor warp is exact
    # selection arithmetic, so a bf16 round-trip through the joint warp is
    # LOSSLESS for 0/1 masks. The normalized image is handed back as f32.
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    img = img_u8.astype(dt) / 255.0
    img = color_jitter(kj, img, per_image=per_image_jitter)
    img = gaussian_blur(kb, img)

    img = normalize(img)
    img, target = random_flips(kf, img, target)
    if mode == "segmentation":
        if jax.default_backend() == "tpu" and not exact:
            # matmul/roll factorized warp (fast_random_affine docstring);
            # same parameter distribution, per-pass nearest rounding
            img, target = fast_random_affine(ka, img, target)
        else:
            img, target = random_affine(ka, img, target)
    return img.astype(jnp.float32), target


@jax.jit
def eval_batch(img_u8):
    """Eval-time: just scale + normalize (`transform_input4test`)."""
    return normalize(img_u8.astype(jnp.float32) / 255.0)
