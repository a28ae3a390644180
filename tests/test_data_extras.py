"""Samplers, mixup, file clients."""

import numpy as np
import pytest


def test_enlarged_sampler_sharding():
    from image_restoration_tpu.data.sampler import EnlargedSampler

    s0 = EnlargedSampler(10, num_replicas=2, rank=0, ratio=3)
    s1 = EnlargedSampler(10, num_replicas=2, rank=1, ratio=3)
    s0.set_epoch(5)
    s1.set_epoch(5)
    i0, i1 = list(s0), list(s1)
    assert len(i0) == len(i1) == 15  # ceil(10*3/2)
    assert all(0 <= i < 10 for i in i0 + i1)
    # different epochs give different orders
    s0.set_epoch(6)
    assert list(s0) != i0


def test_mixup_batch():
    from image_restoration_tpu.data.sampler import mixup_batch

    rng = np.random.default_rng(0)
    lq = rng.random((4, 8, 8, 3)).astype(np.float32)
    gt = lq + 0.1
    l2, g2 = mixup_batch(lq, gt, rng, beta=1.2)
    assert l2.shape == lq.shape
    # the same lambda/permutation applies to both: pairwise difference is
    # preserved exactly
    np.testing.assert_allclose(g2 - l2, gt - lq, rtol=1e-5, atol=1e-6)


def test_file_client_and_npy_cache(tmp_path):
    from PIL import Image

    from image_restoration_tpu.data.file_client import (
        FileClient,
        NpyCachedImage,
        RepeatDataset,
        imread_bytes,
    )

    img = (np.random.default_rng(0).random((8, 8, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(img).save(p)
    fc = FileClient("disk")
    arr = imread_bytes(fc.get(p))
    np.testing.assert_allclose(arr, img / 255.0, atol=1e-6)

    cached = NpyCachedImage(p, cache_dir=str(tmp_path / "cache"))
    a1 = cached.load()
    assert cached.cache_path and np.load(cached.cache_path).shape == (8, 8, 3)
    a2 = cached.load()  # from cache
    np.testing.assert_array_equal(a1, a2)

    ds = RepeatDataset([1, 2, 3], repeat=4)
    assert len(ds) == 12 and ds[7] == 2

    with pytest.raises(ImportError):
        FileClient("lmdb", db_path=str(tmp_path))
