"""Host-side data loading: threaded decode -> stacked numpy batches -> double-buffered
device prefetch.

TPU-native replacement for the reference's 8-worker `MultiEpochsDataLoader`
(`Binary_segmentation/Data/dataloaders.py:12-39`): the host only decodes and resizes
(PIL, like the reference's `Image.open(...).resize((224,224))`); augmentation runs
fused on device (see data/augment.py). A small prefetcher keeps 2 batches in flight so
HBM never starves; batches land pre-sharded over the mesh's data axis.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np

from ssl4gie_tpu.core.mesh import data_sharding


# ------------------------------------------------------------------ sources

class Source:
    """Indexable sample source yielding dicts of numpy arrays."""

    def __len__(self):
        raise NotImplementedError

    def get(self, index: int) -> dict:
        raise NotImplementedError


_native_loader = None


def _open_rgb(path: str, size: Optional[int], make_square: bool = False):
    # opt-in C++ decode+resize (native/loader.cpp): SSL4GIE_NATIVE_LOADER=1.
    # GIL-released libjpeg/libpng decode — the win on multi-core TPU hosts.
    global _native_loader
    import os as _os
    if size is not None and _os.environ.get("SSL4GIE_NATIVE_LOADER") == "1":
        from ssl4gie_tpu.data import native_loader
        if native_loader.available():
            if _native_loader is None:
                _native_loader = native_loader.NativeBatchLoader()
            try:
                return _native_loader.load([path], size, make_square)[0]
            except IOError:
                pass   # unsupported format (e.g. 16-bit tiff) -> PIL fallback
    from PIL import Image
    im = Image.open(path)
    if im.mode != "RGB":
        im = im.convert("RGB")
    if make_square:
        im = _pil_make_square(im, fill=(0, 0, 0), mode="RGB")
    if size is not None:
        im = im.resize((size, size))
    return np.asarray(im, dtype=np.uint8)


def _pil_make_square(im, fill, mode):
    from PIL import Image
    x, y = im.size
    size = max(x, y)
    new = Image.new(mode, (size, size), fill)
    new.paste(im, (int((size - x) / 2), int((size - y) / 2)))
    return new


class ClassificationSource(Source):
    def __init__(self, paths: Sequence[str], labels: Sequence[int], size: int = 224):
        self.paths, self.labels, self.size = list(paths), list(labels), size

    def __len__(self):
        return len(self.paths)

    def get(self, i):
        return {"image": _open_rgb(self.paths[i], self.size),
                "label": np.int32(self.labels[i])}


class SegmentationSource(Source):
    def __init__(self, paths, mask_paths, size: int = 224, native_target: bool = False):
        self.paths, self.mask_paths = list(paths), list(mask_paths)
        self.size, self.native_target = size, native_target

    def __len__(self):
        return len(self.paths)

    def get(self, i):
        from PIL import Image
        img = _open_rgb(self.paths[i], self.size)
        m = Image.open(self.mask_paths[i])
        if not self.native_target:
            m = m.resize((self.size, self.size))
        m = m.convert("L")   # torchvision Grayscale on the mask
        mask = (np.asarray(m, dtype=np.float32) / 255.0)[..., None]
        return {"image": img, "mask": mask}


class DepthSource(Source):
    def __init__(self, paths, depth_paths, size: int = 224,
                 with_native: bool = False):
        self.paths, self.depth_paths = list(paths), list(depth_paths)
        self.size, self.with_native = size, with_native

    def __len__(self):
        return len(self.paths)

    def get(self, i):
        from PIL import Image
        img = _open_rgb(self.paths[i], self.size, make_square=True)
        d = Image.open(self.depth_paths[i])
        native = np.asarray(d, dtype=np.float32) / 65535.0
        ds = _pil_make_square(d, fill=0, mode="I;16").resize((self.size, self.size))
        depth = (np.asarray(ds, dtype=np.float32) / 65535.0)[..., None]
        out = {"image": img, "depth": depth}
        if self.with_native:
            out["native_depth"] = native[..., None]
        return out


class SyntheticSource(Source):
    """Deterministic random data for tests/benchmarks — no files needed."""

    def __init__(self, n: int, size: int = 224, task: str = "classification",
                 n_class: int = 6, seed: int = 0):
        self.n, self.size, self.task, self.n_class, self.seed = n, size, task, n_class, seed

    def __len__(self):
        return self.n

    def get(self, i):
        rng = np.random.default_rng(self.seed * 100003 + i)
        img = rng.integers(0, 256, size=(self.size, self.size, 3), dtype=np.uint8)
        if self.task == "classification":
            return {"image": img, "label": np.int32(rng.integers(0, self.n_class))}
        if self.task == "segmentation":
            yy, xx = np.mgrid[:self.size, :self.size]
            m = max(self.size // 4, 1)
            cy, cx = rng.integers(m, self.size - m, 2)
            r = rng.integers(max(self.size // 16, 1), max(self.size // 4, 2))
            mask = (((yy - cy) ** 2 + (xx - cx) ** 2) < r * r).astype(np.float32)
            return {"image": img, "mask": mask[..., None]}
        if self.task == "depth":
            depth = rng.uniform(0.05, 1.0, size=(self.size, self.size, 1)).astype(np.float32)
            return {"image": img, "depth": depth}
        raise ValueError(self.task)


# ------------------------------------------------------------------ loader

class Loader:
    """Deterministic epoch-shuffled batcher with threaded decode.

    Shuffle matches the torch DistributedSampler role but globally: one permutation
    per epoch seeded by (seed, epoch); under SPMD every process computes the same
    permutation and takes its own shard of each global batch.
    """

    def __init__(self, source: Source, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 42, num_threads: int = 8):
        self.source = source
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.pool = cf.ThreadPoolExecutor(max_workers=num_threads)

    def __len__(self):
        n = len(self.source)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch_idx: int = 0) -> Iterator[dict]:
        n = len(self.source)
        if self.shuffle:
            order = np.random.default_rng((self.seed, epoch_idx)).permutation(n)
        else:
            order = np.arange(n)
        nb = len(self)
        for b in range(nb):
            idx = order[b * self.batch_size:(b + 1) * self.batch_size]
            samples = list(self.pool.map(self.source.get, idx))
            batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
            yield batch


def prefetch_to_device(it: Iterator[dict], mesh, size: int = 2,
                       sharded_keys: Optional[set] = None) -> Iterator[dict]:
    """Double-buffered host->HBM transfer; batches arrive sharded over 'data'."""
    import collections
    queue = collections.deque()

    def put(batch):
        out = {}
        for k, v in batch.items():
            out[k] = jax.device_put(v, data_sharding(mesh, v.ndim))
        return out

    for batch in it:
        queue.append(put(batch))
        if len(queue) > size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
