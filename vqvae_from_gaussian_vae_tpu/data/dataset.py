"""Image-folder data pipeline (reference `/root/reference/pit/data.py`).

`SimpleDataset`: recursive JPEG/jpg/png glob or .txt file list; per item:
resize shorter side -> center crop -> scale to [-1, 1]; returns
{"img": (H, W, 3) float32 NHWC, "fpath": str} (`data.py:74-108`, channel-last
here - this framework is NHWC-native).

`ImageDataModuleFromConfig`: batched loaders with threaded prefetch.  Two
deliberate fixes over the reference (SURVEY.md 2.4): the train loader
shuffles (the reference forgot to, `data.py:48-54`), and loaders support
(shard_id, num_shards) so SPMD eval can split files per host without a
DistributedSampler.
"""

from __future__ import annotations

import glob
import os
import threading
import queue as queue_mod
from typing import Dict, Iterator, Optional

import numpy as np
from PIL import Image

from vqvae_from_gaussian_vae_tpu.utils.config import instantiate_from_config


def load_image(fpath: str, image_size: int) -> np.ndarray:
    """Resize shorter side to image_size, center-crop, scale to [-1, 1]."""
    img = Image.open(fpath).convert("RGB")
    w, h = img.size
    scale = image_size / min(w, h)
    nw, nh = max(image_size, round(w * scale)), max(image_size, round(h * scale))
    img = img.resize((nw, nh), Image.BILINEAR)
    left = (nw - image_size) // 2
    top = (nh - image_size) // 2
    img = img.crop((left, top, left + image_size, top + image_size))
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return arr * 2.0 - 1.0  # (H, W, 3) in [-1, 1]


class SimpleDataset:
    """(`data.py:74-108`)."""

    def __init__(self, root: str, image_size: int):
        self.image_size = image_size
        if root.endswith(".txt"):
            with open(root) as f:
                self.fpaths = [line.strip("\n") for line in f.readlines()]
        else:
            self.fpaths = sorted(glob.glob(root + "/**/*.JPEG", recursive=True))
            self.fpaths += sorted(glob.glob(root + "/**/*.jpg", recursive=True))
            self.fpaths += sorted(glob.glob(root + "/**/*.png", recursive=True))
        assert len(self.fpaths) > 0, "File list is empty. Check the root."

    def __len__(self) -> int:
        return len(self.fpaths)

    def __getitem__(self, index: int) -> Dict:
        fpath = self.fpaths[index]
        return {"img": load_image(fpath, self.image_size), "fpath": fpath}


class _PrefetchLoader:
    """Threaded batch loader: workers decode images, a bounded queue feeds
    the accelerator (the host-side analog of the reference's DataLoader
    workers + prefetch_factor, `data.py:48-54`)."""

    def __init__(
        self,
        dataset: SimpleDataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 8,
        prefetch: int = 4,
        drop_last: bool = True,
        seed: int = 0,
        shard_id: int = 0,
        num_shards: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        idx = np.arange(len(dataset))
        self.indices = idx[shard_id::num_shards]

    def __len__(self) -> int:
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict]:
        order = np.array(self.indices)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        self.epoch += 1

        nb = len(self)
        batches = [order[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)]
        if not self.drop_last and nb * self.batch_size < len(order):
            batches.append(order[nb * self.batch_size :])

        out_q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            from concurrent.futures import ThreadPoolExecutor

            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idx in batches:
                        if stop.is_set():
                            return
                        items = list(pool.map(self.dataset.__getitem__, map(int, batch_idx)))
                        batch = {
                            "img": np.stack([it["img"] for it in items]),
                            "fpath": [it["fpath"] for it in items],
                        }
                        if "video" in items[0]:  # clip datasets (data/video.py)
                            batch["video"] = np.stack([it["video"] for it in items])
                        out_q.put(batch)
            finally:
                out_q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


class ImageDataModuleFromConfig:
    """(`data.py:11-71`): builds train/validation/test loaders from
    target/params dataset sub-configs."""

    def __init__(
        self,
        batch_size: int,
        train: Optional[Dict] = None,
        validation: Optional[Dict] = None,
        test: Optional[Dict] = None,
        num_workers: Optional[int] = None,
        shuffle_test_loader: bool = False,
        shuffle_val_dataloader: bool = False,
        prefetch_factor: int = 4,
        seed: int = 0,
        use_native: bool = True,
    ):
        self.batch_size = batch_size
        self.num_workers = num_workers if num_workers is not None else batch_size * 2
        self.prefetch_factor = prefetch_factor
        self.seed = seed
        self.use_native = use_native  # C++ decode pipeline when built (native/)
        self.dataset_configs = {}
        self._shuffle = {"train": True, "validation": shuffle_val_dataloader, "test": shuffle_test_loader}
        for name, cfg in (("train", train), ("validation", validation), ("test", test)):
            if cfg is not None:
                self.dataset_configs[name] = cfg
        self.datasets: Dict[str, SimpleDataset] = {}

    def setup(self):
        self.datasets = {
            k: instantiate_from_config(cfg) for k, cfg in self.dataset_configs.items()
        }

    def _loader(self, split: str, shard_id: int = 0, num_shards: int = 1):
        if not self.datasets:
            self.setup()
        ds = self.datasets[split]
        if self.use_native and isinstance(ds, SimpleDataset):
            from vqvae_from_gaussian_vae_tpu.data import native_loader

            if native_loader.native_available():
                return native_loader.NativeLoader(
                    ds.fpaths,
                    ds.image_size,
                    self.batch_size,
                    shuffle=self._shuffle[split],
                    num_workers=self.num_workers,
                    drop_last=split == "train",
                    seed=self.seed,
                    shard_id=shard_id,
                    num_shards=num_shards,
                )
        return _PrefetchLoader(
            ds,
            self.batch_size,
            shuffle=self._shuffle[split],
            num_workers=self.num_workers,
            prefetch=self.prefetch_factor,
            drop_last=split == "train",
            seed=self.seed,
            shard_id=shard_id,
            num_shards=num_shards,
        )

    def train_dataloader(self, **kw) -> _PrefetchLoader:
        return self._loader("train", **kw)

    def val_dataloader(self, **kw) -> _PrefetchLoader:
        return self._loader("validation", **kw)

    def test_dataloader(self, **kw) -> _PrefetchLoader:
        return self._loader("test", **kw)


class StableDataModuleFromConfig:
    """(`/root/reference/pit/dataset/dataset.py:20`): the reference hard-exits
    without its private `sdata` submodule; this framework has no analog data
    service, so the class exists for inventory parity and fails loudly."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "StableDataModuleFromConfig depends on the reference's private "
            "`sdata` package (the reference itself sys.exits without it); "
            "use ImageDataModuleFromConfig or data.video instead"
        )
