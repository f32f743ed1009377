"""Split determinism/parity (SURVEY §4 plan (f)) and augmentation semantics tests."""

import numpy as np
import pytest

from ssl4gie_tpu.data.splits import split_ids


def test_split_matches_sklearn_exactly():
    sklearn = pytest.importorskip("sklearn")
    from sklearn.model_selection import train_test_split

    for n in (100, 1000, 1379):   # 1379 spans odd rounding
        test_size = int(round(0.1 * n))
        ids = np.linspace(0, n - 1, n).astype("int")
        tr_ref, te_ref = train_test_split(ids, test_size=test_size, random_state=42)
        tr_ref, va_ref = train_test_split(tr_ref, test_size=test_size,
                                          random_state=42)
        tr, te, va = split_ids(n)
        np.testing.assert_array_equal(tr, tr_ref)
        np.testing.assert_array_equal(te, te_ref)
        np.testing.assert_array_equal(va, va_ref)


def test_split_is_partition():
    tr, te, va = split_ids(500)
    all_ids = np.concatenate([tr, te, va])
    assert len(all_ids) == 500
    assert len(np.unique(all_ids)) == 500


def test_affine_identity_and_rot90():
    """Nearest affine with identity matrix is exact; 90-degree rotation matches
    numpy rot90 up to the sampling-lattice convention."""
    import jax.numpy as jnp
    from ssl4gie_tpu.data.augment import _inverse_affine_matrix, affine_sample

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)

    m_id = _inverse_affine_matrix(jnp.zeros(2), jnp.zeros((2, 2)), jnp.ones(2),
                                  jnp.zeros(2))
    out = affine_sample(jnp.asarray(img), m_id, fill=-1.0, mode="nearest")
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-6)

    # torchvision TF.affine convention (what the reference's joint seg affine
    # uses, Data/dataset.py:62): positive angle through
    # _get_inverse_affine_matrix WITHOUT negation = clockwise in array view =
    # np.rot90(k=-1). (PIL Image.rotate/RandomRotation negate the angle — for the
    # symmetric ±180° ranges used here the direction is immaterial.)
    m_rot = _inverse_affine_matrix(jnp.full(2, 90.0), jnp.zeros((2, 2)),
                                   jnp.ones(2), jnp.zeros(2))
    out = affine_sample(jnp.asarray(img), m_rot, fill=-1.0, mode="nearest")
    ref = np.stack([np.rot90(img[i], k=-1, axes=(0, 1)) for i in range(2)])
    assert np.mean(np.isclose(np.asarray(out), ref, atol=1e-5)) > 0.9


def test_flips_are_joint():
    import jax
    import jax.numpy as jnp
    from ssl4gie_tpu.data.augment import random_flips

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (8, 8, 8, 3)).astype(np.float32)
    tgt = img[..., :1].copy()
    out_i, out_t = random_flips(jax.random.PRNGKey(3), jnp.asarray(img),
                                jnp.asarray(tgt))
    # channel 0 of the image must stay identical to the target after the joint
    # geometric transform
    np.testing.assert_allclose(np.asarray(out_i)[..., :1], np.asarray(out_t),
                               atol=1e-6)


def test_gaussian_blur_preserves_mean_and_smooths():
    import jax
    import jax.numpy as jnp
    from ssl4gie_tpu.data.augment import gaussian_blur

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    out = np.asarray(gaussian_blur(jax.random.PRNGKey(0), jnp.asarray(img),
                                   sigma_range=(1.5, 1.5)))
    assert abs(out.mean() - img.mean()) < 0.01           # kernel is normalized
    assert out.var() < img.var()                          # smoothing reduces var


def test_color_jitter_bounds():
    import jax
    import jax.numpy as jnp
    from ssl4gie_tpu.data.augment import color_jitter

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
    out = np.asarray(color_jitter(jax.random.PRNGKey(1), jnp.asarray(img)))
    assert out.min() >= -1e-6 and out.max() <= 1.0 + 1e-6


def test_rotate_nearest_shear_matches_gather_rotation():
    """The gather-free 3-shear rotation is exact at multiples of 90 deg and
    agrees with the direct nearest gather elsewhere up to the independent
    rounding of the three shear passes (differing pixels pick an adjacent
    source pixel, so value error on smooth images stays tiny)."""
    import jax.numpy as jnp

    from ssl4gie_tpu.data.augment import (_inverse_affine_matrix, affine_sample,
                                          rotate_nearest_shear)

    rng = np.random.default_rng(0)
    B, H = 8, 64
    img = jnp.asarray(rng.random((B, H, H, 3)).astype(np.float32))

    for deg in (0.0, 90.0, -90.0, 180.0, -180.0):
        a = jnp.full((B,), deg, jnp.float32)
        m = _inverse_affine_matrix(a, jnp.zeros((B, 2)), jnp.ones(B), jnp.zeros(B))
        ref = affine_sample(img, m, fill=0.0, mode="nearest")
        out = rotate_nearest_shear(img, a, fill=0.0)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))

    a = jnp.asarray(rng.uniform(-180, 180, B), jnp.float32)
    m = _inverse_affine_matrix(a, jnp.zeros((B, 2)), jnp.ones(B), jnp.zeros(B))
    ref = np.asarray(affine_sample(img, m, fill=0.0, mode="nearest"))
    out = np.asarray(rotate_nearest_shear(img, a, fill=0.0))
    assert np.mean(ref == out) > 0.6            # mostly identical source pixels
    # fill regions (out-of-bounds sources) line up except at mask borders
    assert np.mean((ref == 0.0) == (out == 0.0)) > 0.98

    # smooth image: off-by-one source pixels produce only tiny value changes
    yy, xx = np.meshgrid(np.arange(H), np.arange(H), indexing="ij")
    smooth = np.stack([np.sin(xx / 9.0) * np.cos(yy / 7.0)] * 3, -1)
    smooth = jnp.asarray(np.broadcast_to(smooth[None], (B, H, H, 3)).astype(np.float32))
    ref = np.asarray(affine_sample(smooth, m, fill=0.0, mode="nearest"))
    out = np.asarray(rotate_nearest_shear(smooth, a, fill=0.0))
    assert np.percentile(np.abs(ref - out), 95) < 0.15


def test_shear_rotate_pallas_matches_xla_path():
    """The VMEM shear kernel is element-exact vs the XLA roll/select path
    (same binary-decomposed shifts, same masks)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from ssl4gie_tpu.data.augment import rotate_nearest_shear
    from ssl4gie_tpu.kernels.rotate import shear_rotate_pallas

    rng = np.random.default_rng(3)
    B, H = 4, 64
    img = jnp.asarray(rng.random((B, H, H, 3)).astype(np.float32))
    a = jnp.asarray(rng.uniform(-180, 180, B), jnp.float32)
    ref = rotate_nearest_shear(img, a, fill=0.0)      # XLA path on CPU

    # reproduce the rot90 fold + factors exactly as rotate_nearest_shear does
    theta = jnp.deg2rad(a)
    q = jnp.round(theta / (0.5 * jnp.pi)).astype(jnp.int32)
    r = theta - q.astype(jnp.float32) * (0.5 * jnp.pi)
    qm = jnp.mod(q, 4)[:, None, None, None]
    xt = jnp.swapaxes(img, 1, 2)
    g = jnp.where(qm == 0, img,
        jnp.where(qm == 1, xt[:, :, ::-1],
        jnp.where(qm == 2, img[:, ::-1, ::-1], xt[:, ::-1, :])))
    P = int(np.ceil(np.tan(np.pi / 8) * (H - 1) / 2.0)) + 1
    with pltpu.force_tpu_interpret_mode():
        out = shear_rotate_pallas(g, jnp.tan(r / 2.0), -jnp.sin(r), P, 0.0)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_fast_random_affine_matches_gather_affine():
    """The matmul/roll factorized affine shares the gather path's parameter
    distribution (identical key splits) and agrees up to per-pass nearest
    rounding; identity parameters reproduce the input exactly."""
    import jax
    import jax.numpy as jnp

    from ssl4gie_tpu.data.augment import fast_random_affine, random_affine

    rng = np.random.default_rng(0)
    B, H = 4, 224
    img = jnp.asarray(rng.random((B, H, H, 3)).astype(np.float32) * 2 - 1)
    tgt = jnp.asarray((rng.random((B, H, H, 1)) > 0.5).astype(np.float32))
    key = jax.random.PRNGKey(7)

    oi_ref, ot_ref = random_affine(key, img, tgt)
    oi, ot = fast_random_affine(key, img, tgt)
    assert np.mean(np.asarray(oi_ref) == np.asarray(oi)) > 0.5
    assert np.mean(np.asarray(ot_ref) == np.asarray(ot)) > 0.7
    assert np.mean((np.asarray(oi_ref) == -1.0) == (np.asarray(oi) == -1.0)) > 0.99

    oi, ot = fast_random_affine(key, img, tgt, degrees=0.0, translate_frac=0.0,
                                scale_range=(1.0, 1.0), shear=0.0)
    np.testing.assert_array_equal(np.asarray(oi), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(ot), np.asarray(tgt))


def test_fast_random_affine_non_default_size():
    """Canvas sizes derive from H: non-224 inputs (e.g. 384, 96) must keep
    full resolution and agree with the gather affine — previously 384 silently
    returned a 16x16 crop (ADVICE r2)."""
    import jax
    import jax.numpy as jnp

    from ssl4gie_tpu.data.augment import fast_random_affine, random_affine

    for H in (96, 384):
        rng = np.random.default_rng(H)
        img = jnp.asarray(rng.random((2, H, H, 3)).astype(np.float32) * 2 - 1)
        key = jax.random.PRNGKey(11)
        oi, _ = fast_random_affine(key, img)
        assert oi.shape == (2, H, H, 3)
        oi_ref, _ = random_affine(key, img)
        assert np.mean(np.asarray(oi_ref) == np.asarray(oi)) > 0.5
        assert np.mean((np.asarray(oi_ref) == -1.0) == (np.asarray(oi) == -1.0)) > 0.99
        oi, _ = fast_random_affine(key, img, degrees=0.0, translate_frac=0.0,
                                   scale_range=(1.0, 1.0), shear=0.0)
        np.testing.assert_array_equal(np.asarray(oi), np.asarray(img))


def test_exact_affine_flag_routes_to_one_pass_gather(monkeypatch):
    """SSL4GIE_EXACT_AFFINE=1 (or exact=True) must route the classification
    rotation and the seg affine through the exact one-pass nearest gather
    (`affine_sample`), matching torchvision F.rotate/F.affine semantics
    (`Binary_segmentation/Data/dataset.py:46-63`) — and the env flag must be
    re-read per call (static jit arg, not baked at import)."""
    import jax
    import jax.numpy as jnp

    from ssl4gie_tpu.data import augment as A

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8))

    # classification: exact=True == manual pipeline with affine_sample rotation
    key = jax.random.PRNGKey(7)
    out_exact, _ = A.augment_train_batch(key, img, mode="classification",
                                         exact=True)
    kj, kb, kf, ka = jax.random.split(key, 4)
    x = img.astype(jnp.float32) / 255.0
    x = A.color_jitter(kj, x)
    x = A.gaussian_blur(kb, x)
    x, _ = A.random_flips(kf, x)
    angle = jax.random.uniform(ka, (2,), minval=-180.0, maxval=180.0)
    m = A._inverse_affine_matrix(angle, jnp.zeros((2, 2)), jnp.ones((2,)),
                                 jnp.zeros((2,)))
    x = A.affine_sample(x, m, fill=0.0, mode="nearest")
    np.testing.assert_allclose(np.asarray(out_exact),
                               np.asarray(A.normalize(x)), atol=1e-6)

    # segmentation on CPU: the non-exact branch already falls through to the
    # gather affine, so exact must change nothing there
    tgt = jnp.asarray((rng.random((2, 64, 64, 1)) > 0.5).astype(np.float32))
    oi1, ot1 = A.augment_train_batch(key, img, tgt, mode="segmentation",
                                     exact=True)
    oi2, ot2 = A.augment_train_batch(key, img, tgt, mode="segmentation",
                                     exact=False)
    np.testing.assert_array_equal(np.asarray(oi1), np.asarray(oi2))
    np.testing.assert_array_equal(np.asarray(ot1), np.asarray(ot2))

    # env flag resolution happens at call time
    monkeypatch.setenv("SSL4GIE_EXACT_AFFINE", "1")
    assert A.exact_affine_enabled()
    out_env, _ = A.augment_train_batch(key, img, mode="classification")
    np.testing.assert_array_equal(np.asarray(out_env), np.asarray(out_exact))
    monkeypatch.setenv("SSL4GIE_EXACT_AFFINE", "0")
    assert not A.exact_affine_enabled()


def test_per_image_jitter_order_parity():
    """per_image=True color_jitter must equal applying each image's own
    4-op sequence (torchvision ColorJitter per-__call__ order semantics,
    PARITY deviation #2) — verified by replaying the sampled per-image
    permutations sequentially on single-image batches."""
    import jax
    import jax.numpy as jnp

    from ssl4gie_tpu.data import augment as A

    rng = np.random.default_rng(5)
    B = 6
    img = jnp.asarray(rng.random((B, 16, 16, 3)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    out = A.color_jitter(key, img, per_image=True)

    # replay: same factor sampling, then apply ops in each image's own order
    kb, kc, ks, kh, ko = jax.random.split(key, 5)
    fb = jax.random.uniform(kb, (B, 1, 1, 1), minval=0.6, maxval=1.4)
    fc = jax.random.uniform(kc, (B, 1, 1, 1), minval=0.5, maxval=1.5)
    fs = jax.random.uniform(ks, (B, 1, 1, 1), minval=0.75, maxval=1.25)
    fh = jax.random.uniform(kh, (B, 1, 1), minval=-0.01, maxval=0.01)
    perm_idx = np.asarray(jax.random.randint(ko, (B,), 0,
                                             len(A._JITTER_PERMS)))
    assert len(set(perm_idx.tolist())) > 1   # orders actually differ

    ops = [lambda x, i: A._adjust_brightness(x, fb[i:i + 1]),
           lambda x, i: A._adjust_contrast(x, fc[i:i + 1]),
           lambda x, i: A._adjust_saturation(x, fs[i:i + 1]),
           lambda x, i: A._adjust_hue(x, fh[i:i + 1])]
    for i in range(B):
        x = img[i:i + 1]
        for op_id in A._JITTER_PERMS[perm_idx[i]]:
            x = ops[int(op_id)](x, i)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(x[0]),
                                   atol=1e-6)

    # batch-order default unchanged and env flag resolves at call time
    out_b = A.color_jitter(key, img, per_image=False)
    assert out_b.shape == img.shape
