"""MoCo v3 transfer datasets (`Models/moco_v3/transfer/`) — synthetic on-disk
trees in the exact reference formats, plus device-transform geometry checks
against torchvision."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssl4gie_tpu.data.transfer import (CIFARSource, FlowersSource, PetsSource,
                                       build_transfer_dataset,
                                       transfer_eval_batch,
                                       transfer_train_batch)

RNG = np.random.RandomState(0)


def _write_cifar10(root):
    base = os.path.join(root, "cifar-10-batches-py")
    os.makedirs(base)
    for i in range(1, 6):
        d = {b"data": RNG.randint(0, 256, (4, 3072), dtype=np.uint8).astype(np.uint8),
             b"labels": list(RNG.randint(0, 10, 4))}
        with open(os.path.join(base, f"data_batch_{i}"), "wb") as f:
            pickle.dump(d, f)
    d = {b"data": RNG.randint(0, 256, (6, 3072)).astype(np.uint8),
         b"labels": list(RNG.randint(0, 10, 6))}
    with open(os.path.join(base, "test_batch"), "wb") as f:
        pickle.dump(d, f)


def _write_cifar100(root):
    base = os.path.join(root, "cifar-100-python")
    os.makedirs(base)
    for name, n in (("train", 8), ("test", 5)):
        d = {b"data": RNG.randint(0, 256, (n, 3072)).astype(np.uint8),
             b"fine_labels": list(RNG.randint(0, 100, n))}
        with open(os.path.join(base, name), "wb") as f:
            pickle.dump(d, f)


def _write_jpg(path, w, h):
    from PIL import Image
    Image.fromarray(RNG.randint(0, 256, (h, w, 3)).astype(np.uint8)).save(path)


def _write_flowers(root):
    import scipy.io
    os.makedirs(os.path.join(root, "jpg"))
    n = 10
    for i in range(1, n + 1):
        _write_jpg(os.path.join(root, "jpg", "image_%05d.jpg" % i),
                   300 + 7 * i, 260)
    scipy.io.savemat(os.path.join(root, "imagelabels.mat"),
                     {"labels": np.arange(1, n + 1)[None] % 102 + 1})
    scipy.io.savemat(os.path.join(root, "setid.mat"),
                     {"trnid": np.array([[1, 2, 3]]),
                      "valid": np.array([[4, 5]]),
                      "tstid": np.array([[6, 7, 8, 9, 10]])})


def _write_pets(root):
    os.makedirs(os.path.join(root, "annotations"))
    os.makedirs(os.path.join(root, "images"))
    names = [f"Abyssinian_{i}" for i in range(1, 5)] + ["beagle_1", "beagle_2"]
    for n in names:
        _write_jpg(os.path.join(root, "images", n + ".jpg"), 240, 330)
    with open(os.path.join(root, "annotations", "trainval.txt"), "w") as f:
        for i, n in enumerate(names[:4]):
            f.write(f"{n} {i % 37 + 1} 1 {i + 1}\n")
    with open(os.path.join(root, "annotations", "test.txt"), "w") as f:
        for i, n in enumerate(names[4:]):
            f.write(f"{n} {i + 1} 2 {i + 1}\n")


def test_cifar_sources(tmp_path):
    root = str(tmp_path)
    _write_cifar10(root)
    _write_cifar100(root)
    src, nc = build_transfer_dataset("cifar10", root, train=True)
    assert nc == 10 and len(src) == 20
    s = src.get(0)
    assert s["image"].shape == (32, 32, 3) and s["image"].dtype == np.uint8
    # CHW-flat unpack: red plane first
    with open(os.path.join(root, "cifar-10-batches-py", "data_batch_1"), "rb") as f:
        d = pickle.load(f, encoding="bytes")
    np.testing.assert_array_equal(
        s["image"], d[b"data"][0].reshape(3, 32, 32).transpose(1, 2, 0))
    assert s["label"] == d[b"labels"][0]
    src_t, _ = build_transfer_dataset("cifar10", root, train=False)
    assert len(src_t) == 6
    src100, nc100 = build_transfer_dataset("cifar100", root, train=False)
    assert nc100 == 100 and len(src100) == 5
    assert 0 <= src100.get(2)["label"] < 100


def test_flowers_source(tmp_path):
    root = str(tmp_path)
    _write_flowers(root)
    tr, nc = build_transfer_dataset("flowers", root, train=True)
    te, _ = build_transfer_dataset("flowers", root, train=False)
    assert nc == 102
    assert len(tr) == 5 and len(te) == 5      # trnid+valid / tstid
    s = tr.get(0)
    assert s["image"].shape == (256, 256, 3)  # load_size(224) square
    assert s["label"] == (1 % 102 + 1) - 1    # 1-based label of image_00001
    # test split starts at image id 6
    assert te.get(0)["label"] == (6 % 102 + 1) - 1


def test_pets_source(tmp_path):
    root = str(tmp_path)
    _write_pets(root)
    tr, nc = build_transfer_dataset("pets", root, train=True)
    te, _ = build_transfer_dataset("pets", root, train=False)
    assert nc == 37 and len(tr) == 4 and len(te) == 2
    s = te.get(1)
    assert s["image"].shape == (256, 256, 3)
    assert s["label"] == 1                    # "beagle_2 2 ..." -> 2-1


def test_build_dataset_refusals(tmp_path):
    with pytest.raises(NotImplementedError):
        build_transfer_dataset("imagenet", str(tmp_path), True)
    with pytest.raises(NotImplementedError):
        build_transfer_dataset("food101", str(tmp_path), True)


def test_eval_transform_geometry_vs_torchvision():
    """Device eval path == CenterCrop(224)+Normalize for an image the host
    already shorter-side-resized (square load_size input) — the exact
    torchvision stack `datasets.py:25-29` minus the Resize done at decode."""
    img = RNG.randint(0, 256, (256, 256, 3)).astype(np.uint8)
    ours = np.asarray(transfer_eval_batch(jnp.asarray(img[None]), 224))[0]
    crop = img[16:240, 16:240].astype(np.float32) / 255.0
    ref = (crop - np.array([0.485, 0.456, 0.406], np.float32)) / np.array(
        [0.229, 0.224, 0.225], np.float32)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_eval_transform_cifar_upsamples():
    img = RNG.randint(0, 256, (2, 32, 32, 3)).astype(np.uint8)
    out = transfer_eval_batch(jnp.asarray(img), 224)
    assert out.shape == (2, 224, 224, 3)


def test_train_transform_shape_and_range():
    img = RNG.randint(0, 256, (4, 256, 256, 3)).astype(np.uint8)
    out = transfer_train_batch(jax.random.PRNGKey(0), jnp.asarray(img), 224)
    assert out.shape == (4, 224, 224, 3)
    assert np.isfinite(np.asarray(out)).all()
    # normalized stats: roughly centered
    assert abs(float(out.mean())) < 1.5
