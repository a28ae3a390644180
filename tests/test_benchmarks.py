"""Eval-protocol coverage: SR Y-channel benchmarks, weather/CDD-11 registry
dispatch, LPIPS column, shape-bucketed padding."""

import os

import numpy as np
import pytest
from PIL import Image


def _save(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr.astype(np.uint8)).save(path)


@pytest.fixture
def sr_root(tmp_path, rng):
    """Set5-style tree: sr/Set5/HR/{name}.png + LR_bicubic/X4/{name}x4.png."""
    root = tmp_path / "data"
    for i in range(2):
        hr = (rng.random((41, 37, 3)) * 255).astype(np.uint8)  # odd sizes
        _save(str(root / f"sr/Set5/HR/img{i}.png"), hr)
        # floor-decimation stand-in for bicubic: lr*scale <= hr like real sets
        lr = hr[: 41 - 41 % 4 : 4, : 37 - 37 % 4 : 4]
        _save(str(root / f"sr/Set5/LR_bicubic/X4/img{i}x4.png"), lr)
    return str(root)


def test_sr_benchmark_protocol(sr_root):
    """sr_set5_x4: scale-aware eval, Y-channel, crop_border=scale
    (SRConvNet-main/train.py:202-213)."""
    import jax.numpy as jnp

    from image_restoration_tpu.eval.benchmarks import run_benchmark

    def up4(x):  # fake x4 SR: nearest upsample
        return jnp.repeat(jnp.repeat(x, 4, axis=1), 4, axis=2)

    r = run_benchmark("sr_set5_x4", up4, sr_root)
    assert r.n == 2
    assert 5 < r.psnr < 60
    assert 0 < r.ssim <= 1


def test_sr_dataset_shapes(sr_root):
    from image_restoration_tpu.data.datasets import SRBenchmark

    ds = SRBenchmark(os.path.join(sr_root, "sr/Set5"), scale=4)
    item = ds[0]
    lh, lw = item["lq"].shape[:2]
    assert item["gt"].shape[:2] == (lh * 4, lw * 4)  # HR cropped to lr*scale


@pytest.fixture
def misc_root(tmp_path, rng):
    root = tmp_path / "data"
    # weather pairs (different sizes to exercise bucketing)
    for i, size in enumerate([(40, 40), (48, 56)]):
        img = (rng.random((*size, 3)) * 255).astype(np.uint8)
        _save(str(root / f"weather/RainDrop/input/{i}.png"), img)
        _save(str(root / f"weather/RainDrop/gt/{i}.png"), img)
        _save(str(root / f"weather/Snow100K-L/input/{i}.png"), img)
        _save(str(root / f"weather/Snow100K-L/gt/{i}.png"), img)
    # CDD-11 test split: clear + two degradation folders
    for folder in ["low", "low_haze"]:
        for i in range(2):
            img = (rng.random((70, 70, 3)) * 255).astype(np.uint8)
            _save(str(root / f"cdd11/test/{folder}/{i}.png"), img)
            _save(str(root / f"cdd11/test/clear/{i}.png"), img)
    return str(root)


def test_weather_and_cdd11_registry(misc_root):
    from image_restoration_tpu.eval.benchmarks import run_benchmark

    ident = lambda x: x
    r = run_benchmark("raindrop", ident, misc_root)
    assert r.n == 2 and r.psnr > 40  # identity on identical pairs
    r = run_benchmark("snow100k_l", ident, misc_root)
    assert r.n == 2
    # CDD-11 subset dispatch (test.py:180-184): single=1 underscore-free
    r_all = run_benchmark("cdd11", ident, misc_root)
    r_single = run_benchmark("cdd11_single", ident, misc_root)
    r_double = run_benchmark("cdd11_double", ident, misc_root)
    assert r_all.n == 4 and r_single.n == 2 and r_double.n == 2


def test_lpips_column(misc_root):
    import jax.numpy as jnp

    from image_restoration_tpu.eval.benchmarks import run_benchmark

    fake_lpips = lambda a, b: jnp.mean(jnp.abs(a - b), axis=(1, 2, 3)) + 0.25
    r = run_benchmark("raindrop", lambda x: x, misc_root, lpips_fn=fake_lpips)
    assert abs(r.extra["lpips"] - 0.25) < 1e-5  # identity pairs -> exactly bias


def test_bucketed_padding_matches_unbucketed(misc_root):
    """bucket=64 must not change metrics (pad is cropped back), only the
    number of compiled shapes."""
    from image_restoration_tpu.eval.benchmarks import BENCHMARKS, evaluate

    ds = BENCHMARKS["raindrop"].factory(misc_root)
    ident = lambda x: x
    a = evaluate(ident, ds, pad_multiple=8)
    b = evaluate(ident, ds, bucket=64)
    np.testing.assert_allclose(a.psnr, b.psnr, rtol=1e-6)
    with pytest.raises(ValueError):
        evaluate(ident, ds, pad_multiple=7, bucket=64)


def test_unknown_benchmark_lists_options():
    from image_restoration_tpu.eval.benchmarks import run_benchmark

    with pytest.raises(KeyError, match="sr_set5_x4"):
        run_benchmark("nope", lambda x: x, "/tmp")
