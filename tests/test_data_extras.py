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


def test_adair_name_list_frontend(tmp_path, rng):
    """AdaIR txt name-list protocol (AdaIR-main/utils/dataset_utils.py:60-153):
    IDs from data_file_dir/*/*.txt, GT derived by the AdaIR string rules."""
    import os

    from PIL import Image

    from image_restoration_tpu.data.datasets import (AIOTrainDataset,
                                                     adair_haze_gt,
                                                     adair_rain_gt)

    def save(rel, size=48):
        p = str(tmp_path / "data" / rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        Image.fromarray(rng.integers(0, 255, (size, size, 3))
                        .astype(np.uint8)).save(p)
        return p

    save("deraining/rainy/rain-1.png")
    save("deraining/gt/norain-1.png")
    save("dehazing/synthetic/part1/0025_0.8_0.04.jpg")
    save("dehazing/original/0025.jpg")
    save("denoising/img1.png")
    lists = tmp_path / "lists"
    for rel, lines in (("noisy/denoise.txt", ["img1.png"]),
                       ("rainy/rainTrain.txt", ["rainy/rain-1.png"]),
                       ("hazy/hazy_outside.txt",
                        ["synthetic/part1/0025_0.8_0.04.jpg"])):
        os.makedirs(os.path.dirname(lists / rel), exist_ok=True)
        (lists / rel).write_text("\n".join(lines) + "\n")

    # GT-derivation rules match the reference string surgery
    assert adair_rain_gt("/d/deraining/rainy/rain-7.png") == \
        "/d/deraining/gt/norain-7.png"
    assert adair_haze_gt("/d/dehazing/synthetic/part1/0025_0.8_0.04.jpg") == \
        "/d/dehazing/original/0025.jpg"

    ds = AIOTrainDataset(str(tmp_path / "data"),
                         ["denoise_25", "derain", "dehaze"], patch_size=16,
                         name_list_dir=str(lists))
    # oversampling: denoise x3, derain x120, dehaze x1
    assert len(ds) == 3 + 120 + 1
    for idx in (0, 3, 123):
        item = ds[idx]
        assert item["lq"].shape == (16, 16, 3)
        assert item["gt"].shape == (16, 16, 3)
    assert ds[0]["sigma"] == 25 and ds[3]["sigma"] == 0
