"""Native C++ loader: decode correctness vs the PIL path, batching, shuffle,
throughput sanity."""

import os
import time

import numpy as np
import pytest
from PIL import Image

from vqvae_from_gaussian_vae_tpu.data import native_loader
from vqvae_from_gaussian_vae_tpu.data.dataset import load_image

pytestmark = pytest.mark.skipif(
    not native_loader.native_available(), reason="native loader not built"
)


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(12):
        arr = rng.integers(0, 255, (48 + 4 * i, 64, 3), dtype=np.uint8)
        p = d / (f"img_{i:02d}.jpg" if i % 2 else f"img_{i:02d}.png")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(str(p))
    return paths


def test_single_decode_matches_pil(images):
    for p in images[:4]:
        native = native_loader.decode_image(p, 32)
        pil = load_image(p, 32)
        assert native.shape == pil.shape == (32, 32, 3)
        assert native.min() >= -1.0 and native.max() <= 1.0
        # JPEG decoders and bilinear kernels differ slightly; PNG is lossless
        tol = 0.08 if p.endswith(".jpg") else 0.05
        assert np.abs(native - pil).mean() < tol, (p, np.abs(native - pil).mean())


def test_batched_epochs_and_shuffle(images):
    loader = native_loader.NativeLoader(images, image_size=32, batch_size=4,
                                        shuffle=True, num_workers=3, seed=1)
    assert len(loader) == 3
    seen1 = []
    for batch in loader:
        assert batch["img"].shape == (4, 32, 32, 3)
        assert np.isfinite(batch["img"]).all()
        seen1 += batch["fpath"]
    assert len(seen1) == 12 and len(set(seen1)) == 12
    seen2 = [p for b in loader for p in b["fpath"]]
    assert set(seen2) == set(seen1)
    assert seen2 != seen1  # epoch reshuffle


def test_sharding(images):
    a = native_loader.NativeLoader(images, 32, 2, shard_id=0, num_shards=2)
    b = native_loader.NativeLoader(images, 32, 2, shard_id=1, num_shards=2)
    pa = {p for batch in a for p in batch["fpath"]}
    pb = {p for batch in b for p in batch["fpath"]}
    assert pa.isdisjoint(pb)
    assert len(pa) + len(pb) == 12
