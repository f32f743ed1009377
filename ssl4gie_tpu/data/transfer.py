"""MoCo v3 transfer-learning datasets (CIFAR-10/100, Oxford Flowers-102, Oxford
Pets-37) and their train/eval transforms.

Parity target: `/root/reference/Models/moco_v3/transfer/datasets.py:34-74` and the
two dataset classes `oxford_flowers_dataset.py:20-67` / `oxford_pets_dataset.py:19-66`.

TPU-redesign notes
------------------
* The reference runs torchvision transforms per-image on CPU workers. Here the
  host only decodes to a FIXED shape (static shapes are mandatory for one XLA
  compile): CIFAR images stay at their native 32x32; Flowers/Pets are
  shorter-side resized to ``int(256/224 * input_size)`` and center-cropped to a
  square at load time — exactly the reference's eval ``Resize + CenterCrop``
  geometry (`datasets.py:25-29`), so eval pixels match.  For TRAIN this means the
  RandomResizedCrop samples from the center-cropped image rather than the full
  original; scale=(0.05, 1.0) crops make the difference negligible and the
  deviation is recorded in docs/PARITY.md.
* Both transforms then run fused and batched on device:
  ``transfer_train_batch`` = RandomResizedCrop(scale=(0.05, 1.0)) + horizontal
  flip + ImageNet normalize (`datasets.py:19-24`); ``transfer_eval_batch`` =
  center crop to ``input_size`` + normalize (`datasets.py:25-29`; the Resize
  already happened losslessly at decode time for Flowers/Pets, and is a bilinear
  matmul upsample here for CIFAR whose native size is below the crop size).
"""

from __future__ import annotations

import os
import pickle
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssl4gie_tpu.data.augment import normalize, random_flips
from ssl4gie_tpu.data.loader import Source
from ssl4gie_tpu.data.ssl_augment import random_resized_crop

TRANSFER_DATASETS = ("cifar10", "cifar100", "flowers", "pets")


def _load_size(input_size: int) -> int:
    # `transforms.Resize(int((256 / 224) * args.input_size))` (datasets.py:26)
    return int((256 / 224) * input_size)


# --------------------------------------------------------------- host decode

def _open_rgb_short_side(path: str, size: int) -> np.ndarray:
    """Shorter-side bilinear resize to `size` + center crop to (size, size).

    Matches torchvision `Resize(size)` (shorter-side rule, bilinear) followed by
    `CenterCrop(size)`; the final crop from `load_size` down to `input_size`
    happens on device so eval geometry equals the reference stack.
    """
    from PIL import Image
    im = Image.open(path)
    if im.mode != "RGB":
        im = im.convert("RGB")
    w, h = im.size
    # torchvision _compute_resized_output_size TRUNCATES the long side
    # (int(size * long / short)), it does not round.
    if w <= h:
        nw, nh = size, max(size, int(size * h / w))
    else:
        nh, nw = size, max(size, int(size * w / h))
    im = im.resize((nw, nh), Image.BILINEAR)
    # torchvision CenterCrop rounds the offset: int(round((n - size) / 2))
    left = int(round((nw - size) / 2))
    top = int(round((nh - size) / 2))
    im = im.crop((left, top, left + size, top + size))
    return np.asarray(im, dtype=np.uint8)


# ------------------------------------------------------------------- sources

class CIFARSource(Source):
    """CIFAR-10/100 from the standard python pickle batches.

    CIFAR-10: `cifar-10-batches-py/{data_batch_1..5,test_batch}`;
    CIFAR-100: `cifar-100-python/{train,test}` with `fine_labels`.
    Same on-disk format torchvision's `datasets.CIFAR10/100` read
    (`datasets.py:46-57`); no download support in this zero-egress container.
    """

    def __init__(self, root: str, train: bool, variant: str = "cifar10"):
        if variant == "cifar10":
            base = os.path.join(root, "cifar-10-batches-py")
            files = ([f"data_batch_{i}" for i in range(1, 6)] if train
                     else ["test_batch"])
            label_key = b"labels"
        else:
            base = os.path.join(root, "cifar-100-python")
            files = ["train" if train else "test"]
            label_key = b"fine_labels"
        datas, labels = [], []
        for name in files:
            with open(os.path.join(base, name), "rb") as f:
                d = pickle.load(f, encoding="bytes")
            datas.append(np.asarray(d[b"data"], np.uint8))
            labels.extend(d[label_key])
        # (N, 3072) CHW-flat -> (N, 32, 32, 3) HWC
        self.images = (np.concatenate(datas)
                       .reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1).copy())
        self.labels = np.asarray(labels, np.int32)

    def __len__(self):
        return len(self.labels)

    def get(self, i):
        return {"image": self.images[i], "label": np.int32(self.labels[i])}


class FlowersSource(Source):
    """Oxford Flowers-102 (`oxford_flowers_dataset.py:20-67`): jpg/image_%05d.jpg,
    1-based labels in imagelabels.mat, trainval = trnid+valid / test = tstid
    from setid.mat."""

    def __init__(self, root: str, train: bool, input_size: int = 224):
        import scipy.io
        self.image_folder = os.path.join(root, "jpg")
        labels = scipy.io.loadmat(os.path.join(root, "imagelabels.mat"))["labels"][0]
        setid = scipy.io.loadmat(os.path.join(root, "setid.mat"))
        if train:
            ids = np.concatenate([setid["trnid"][0], setid["valid"][0]])
        else:
            ids = setid["tstid"][0]
        self.ids = np.asarray(ids, np.int64)
        self.labels = np.asarray(labels, np.int64)
        self.size = _load_size(input_size)

    def __len__(self):
        return len(self.ids)

    def get(self, i):
        idx = int(self.ids[i])
        path = os.path.join(self.image_folder, "image_%05d.jpg" % idx)
        return {"image": _open_rgb_short_side(path, self.size),
                "label": np.int32(self.labels[idx - 1] - 1)}


class PetsSource(Source):
    """Oxford-IIIT Pets (`oxford_pets_dataset.py:19-66`): split lists in
    annotations/{trainval,test}.txt ("name label species id"), 1-based labels."""

    def __init__(self, root: str, train: bool, input_size: int = 224):
        split = "trainval.txt" if train else "test.txt"
        with open(os.path.join(root, "annotations", split)) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        self.names, self.labels = [], []
        for ln in lines:
            name, label = ln.split(" ")[:2]
            self.names.append(name)
            self.labels.append(int(label) - 1)
        self.image_dir = os.path.join(root, "images")
        self.size = _load_size(input_size)

    def __len__(self):
        return len(self.names)

    def get(self, i):
        path = os.path.join(self.image_dir, self.names[i] + ".jpg")
        return {"image": _open_rgb_short_side(path, self.size),
                "label": np.int32(self.labels[i])}


def build_transfer_dataset(name: str, root: str, train: bool,
                           input_size: int = 224) -> Tuple[Source, int]:
    """(source, nb_classes) — `datasets.py:34-74` `build_dataset` semantics,
    including the imagenet refusal."""
    if name == "imagenet":
        raise NotImplementedError(
            "Only [cifar10, cifar100, flowers, pets] are supported; for "
            "imagenet end-to-end finetuning use the main classification task.")
    if name == "cifar10":
        return CIFARSource(root, train, "cifar10"), 10
    if name == "cifar100":
        return CIFARSource(root, train, "cifar100"), 100
    if name == "flowers":
        return FlowersSource(root, train, input_size), 102
    if name == "pets":
        return PetsSource(root, train, input_size), 37
    raise NotImplementedError(
        "Only [cifar10, cifar100, flowers, pets] are supported; for imagenet "
        "end-to-end finetuning use the main classification task.")


# --------------------------------------------------------- device transforms

def transfer_train_batch(key, img_u8, input_size: int = 224):
    """RandomResizedCrop((S, S), scale=(0.05, 1.0)) + RandomHorizontalFlip +
    ImageNet normalize, fused on device (`datasets.py:19-24`)."""
    img = img_u8.astype(jnp.float32) / 255.0
    k_crop, k_flip = jax.random.split(key)
    img = random_resized_crop(k_crop, img, input_size, scale=(0.05, 1.0))
    img, _ = random_flips(k_flip, img, hflip=True, vflip=False)
    return normalize(img)


def transfer_eval_batch(img_u8, input_size: int = 224):
    """Resize(int(256/224 * S)) + CenterCrop(S) + normalize (`datasets.py:25-29`).

    Flowers/Pets arrive from the host already shorter-side-resized and square at
    `load_size`, so only the center crop remains; CIFAR (32x32 < load_size) is
    bilinearly upsampled to `load_size` first via the interp-matrix matmul.
    """
    img = img_u8.astype(jnp.float32) / 255.0
    load = _load_size(input_size)
    B, H, W, C = img.shape
    if (H, W) != (load, load):
        # half-pixel bilinear == torchvision Resize(align_corners=False)
        img = jax.image.resize(img, (B, load, load, C), "bilinear")
    # torchvision CenterCrop offset rule: int(round((load - input_size) / 2))
    off = int(round((load - input_size) / 2))
    img = img[:, off:off + input_size, off:off + input_size]
    return normalize(img)
