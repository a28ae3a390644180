"""Metrics vs ground-truth reimplementations of the reference protocols
(skimage structural_similarity / basicsr psnr_ssim; scipy+cv2 stand in for
the originals, which are not installed here)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
scipy = pytest.importorskip("scipy")
from scipy.ndimage import gaussian_filter  # noqa: E402


def _skimage_ssim_ref(a, b, data_range=1.0):
    """Faithful replication of skimage.metrics.structural_similarity with
    gaussian_weights=True (win 11, sigma 1.5, truncate 3.5, sample cov)."""
    win = 11
    np_ = win * win
    cov_norm = np_ / (np_ - 1)
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    f = lambda x: gaussian_filter(x, sigma=1.5, truncate=3.5)
    vals = []
    for ch in range(a.shape[-1]):
        x, y = a[..., ch].astype(np.float64), b[..., ch].astype(np.float64)
        ux, uy = f(x), f(y)
        vx = cov_norm * (f(x * x) - ux * ux)
        vy = cov_norm * (f(y * y) - uy * uy)
        vxy = cov_norm * (f(x * y) - ux * uy)
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
        pad = (win - 1) // 2
        vals.append(s[pad:-pad, pad:-pad].mean())
    return float(np.mean(vals))


def _basicsr_ssim_ref(a, b):
    """Replication of basicsr psnr_ssim._ssim (0-255, no sample cov)."""
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.T)
    vals = []
    for ch in range(a.shape[-1]):
        x, y = a[..., ch].astype(np.float64), b[..., ch].astype(np.float64)
        mu1 = cv2.filter2D(x, -1, window)[5:-5, 5:-5]
        mu2 = cv2.filter2D(y, -1, window)[5:-5, 5:-5]
        s1 = cv2.filter2D(x * x, -1, window)[5:-5, 5:-5] - mu1**2
        s2 = cv2.filter2D(y * y, -1, window)[5:-5, 5:-5] - mu2**2
        s12 = cv2.filter2D(x * y, -1, window)[5:-5, 5:-5] - mu1 * mu2
        m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
        vals.append(m.mean())
    return float(np.mean(vals))


@pytest.fixture
def pair(rng):
    a = rng.random((2, 40, 52, 3), dtype=np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
    return a, b


def test_psnr(pair):
    from image_restoration_tpu.eval.metrics import psnr

    a, b = pair
    got = np.asarray(psnr(b, a))
    for i in range(a.shape[0]):
        mse = np.mean((a[i].astype(np.float64) - b[i]) ** 2)
        ref = 10 * np.log10(1.0 / mse)
        np.testing.assert_allclose(got[i], ref, rtol=1e-4)


def test_ssim_skimage_flavor(pair):
    from image_restoration_tpu.eval.metrics import ssim

    a, b = pair
    got = np.asarray(ssim(b, a))
    for i in range(a.shape[0]):
        ref = _skimage_ssim_ref(b[i], a[i])
        np.testing.assert_allclose(got[i], ref, rtol=1e-4, atol=1e-5)


def test_ssim_basicsr_flavor(pair):
    from image_restoration_tpu.eval.metrics import ssim

    a, b = pair
    got = np.asarray(ssim(b * 255, a * 255, data_range=255.0, sample_covariance=False))
    for i in range(a.shape[0]):
        ref = _basicsr_ssim_ref(b[i] * 255, a[i] * 255)
        np.testing.assert_allclose(got[i], ref, rtol=1e-4, atol=1e-5)


def test_masked_metrics(pair):
    from image_restoration_tpu.eval.metrics import masked_psnr, masked_ssim

    a, b = pair
    mask = np.ones_like(a)
    # with an all-ones mask, masked PSNR == plain per-image MSE psnr
    got = np.asarray(masked_psnr(b, a, mask))
    mse = ((a.astype(np.float64) - b) ** 2).mean(axis=(1, 2, 3))
    np.testing.assert_allclose(got, 10 * np.log10(1 / mse), rtol=1e-4)
    got = np.asarray(masked_ssim(b, a, mask))
    for i in range(a.shape[0]):
        np.testing.assert_allclose(got[i], _skimage_ssim_ref(b[i], a[i]), rtol=1e-4, atol=1e-5)


def test_y_channel(pair):
    from image_restoration_tpu.eval.metrics import psnr_yc, rgb_to_y

    a, b = pair
    y = np.asarray(rgb_to_y(a))
    ref_y = (
        a @ np.array([65.481, 128.553, 24.966]) / 255.0 + 16.0 / 255.0
    )[..., None]
    np.testing.assert_allclose(y, ref_y, rtol=1e-4, atol=1e-5)
    got = np.asarray(psnr_yc(b, a, crop_border=4))
    ya, yb = ref_y[:, 4:-4, 4:-4], np.asarray(rgb_to_y(b))[:, 4:-4, 4:-4]
    mse = ((ya - yb) ** 2).mean(axis=(1, 2, 3))
    np.testing.assert_allclose(got, 10 * np.log10(1 / mse), rtol=1e-3)


def test_window_roundtrip(rng):
    import jax.numpy as jnp

    from image_restoration_tpu.eval.tiled import (
        pad_test,
        window_partition,
        window_reverse,
        windowed_apply,
    )

    for h, w in [(64, 64), (70, 64), (64, 70), (75, 83), (32, 32)]:
        x = jnp.asarray(rng.random((2, h, w, 3), dtype=np.float32))
        wins, meta = window_partition(x, 32)
        assert wins.shape[1:3] == (32, 32)
        back = window_reverse(wins, meta)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
        # windowed_apply with identity == identity, any chunking
        out = windowed_apply(lambda t: t, x, 32, max_batch=3)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    x = jnp.asarray(rng.random((1, 37, 45, 3), dtype=np.float32))
    out = pad_test(lambda t: t * 2.0, x, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)


def test_chop_apply(rng):
    import jax.numpy as jnp

    from image_restoration_tpu.eval.tiled import chop_apply

    x = jnp.asarray(rng.random((1, 48, 64, 3), dtype=np.float32))
    out = chop_apply(lambda t: t, x, min_size=24 * 24, shave=4)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_niqe_parity_vs_reference():
    """NIQE vs the reference basicsr implementation (cv2/scipy shimmed)."""
    import sys
    import types

    import scipy.ndimage

    cv2 = types.ModuleType("cv2")

    def _resize(img, wh, interpolation=None):
        h2, w2 = wh[1], wh[0]
        img = img[: h2 * 2, : w2 * 2]
        return img.reshape(h2, 2, w2, 2).mean(axis=(1, 3))

    cv2.resize = _resize
    cv2.INTER_LINEAR = 1
    sys.modules.setdefault("cv2", cv2)
    filters = types.ModuleType("scipy.ndimage.filters")
    filters.convolve = scipy.ndimage.convolve
    sys.modules.setdefault("scipy.ndimage.filters", filters)
    for name in ("basicsr", "basicsr.metrics", "basicsr.metrics.metric_util"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["basicsr.metrics.metric_util"].reorder_image = lambda x, input_order: x
    sys.modules["basicsr.metrics.metric_util"].to_y_channel = lambda x: x

    import importlib.util

    path = ("/root/reference/HOGformer-main/settingI/basicsr/metrics/niqe.py")
    import os
    if not os.path.exists(path):
        pytest.skip("reference niqe unavailable")
    spec = importlib.util.spec_from_file_location("ref_niqe", path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from image_restoration_tpu.eval.niqe import load_pris_params, niqe

    mu, cov, win = load_pris_params()
    rng = np.random.default_rng(0)
    img = scipy.ndimage.gaussian_filter(rng.random((192, 288)) * 255, 2.0)
    r = float(np.asarray(ref.niqe(img.copy(), mu, cov, win)).ravel()[0])
    g = niqe(img.copy(), mu, cov, win)
    np.testing.assert_allclose(g, r, rtol=1e-8)


def test_progressive_schedule():
    from image_restoration_tpu.train.progressive import (
        ProgressiveSchedule,
        ReduceLROnPlateau,
    )

    sched = ProgressiveSchedule(iters=[100, 100, 100], gt_sizes=[16, 24, 32],
                                batch_sizes=[8, 4, 2])
    assert sched.shapes(0) == (8, 16)
    assert sched.shapes(150) == (4, 24)
    assert sched.shapes(10_000) == (2, 32)
    assert sched.num_buckets() == 3

    rng = np.random.default_rng(0)
    lq = rng.random((8, 32, 32, 3)).astype(np.float32)
    gt = rng.random((8, 32, 32, 3)).astype(np.float32)
    l2, g2 = sched.apply(lq, gt, step=150, rng=rng)
    assert l2.shape == (4, 24, 24, 3) and g2.shape == (4, 24, 24, 3)

    # SR scale: gt 2x larger, crop follows scale
    sched2 = ProgressiveSchedule(iters=[10], gt_sizes=[16], batch_sizes=[2], scale=2)
    gt_hr = rng.random((8, 64, 64, 3)).astype(np.float32)
    l3, g3 = sched2.apply(lq, gt_hr, step=0, rng=rng)
    assert l3.shape == (2, 16, 16, 3) and g3.shape == (2, 32, 32, 3)

    plateau = ReduceLROnPlateau(factor=0.5, patience=1, window=3)
    scales = [plateau.push_loss(v) for v in
              [1.0, 1.0, 1.0,   1.0, 1.0, 1.0,   1.0, 1.0, 1.0]]
    # windows mean 1.0 thrice: first sets best, then 2 bad -> drop at 3rd
    assert scales[2] == 1.0 and scales[-1] == 0.5


def test_fid():
    """FID math (basicsr fid.py:57-102 port): zero for identical stats;
    matches the closed form for 1-D Gaussians; symmetric and positive on
    random feature clouds."""
    import numpy as np

    from image_restoration_tpu.eval.fid import (
        calculate_fid,
        compute_feature_stats,
        extract_features,
        fid_from_features,
    )

    rng = np.random.default_rng(0)
    f1 = rng.normal(size=(500, 16))
    mu, sigma = compute_feature_stats(f1)
    assert abs(calculate_fid(mu, sigma, mu, sigma)) < 1e-8

    # 1-D closed form: (mu1-mu2)^2 + s1 + s2 - 2*sqrt(s1*s2)
    got = calculate_fid([1.0], [[4.0]], [3.0], [[9.0]])
    want = (1 - 3) ** 2 + 4 + 9 - 2 * (4 * 9) ** 0.5
    assert abs(got - want) < 1e-10, (got, want)

    f2 = rng.normal(loc=0.5, size=(500, 16))
    d12 = fid_from_features(f1, f2)
    d21 = fid_from_features(f2, f1)
    assert d12 > 0.1 and abs(d12 - d21) < 1e-6

    # streamed extraction path
    batches = [rng.normal(size=(8, 4, 4, 3)).astype(np.float32)
               for _ in range(3)]
    feats = extract_features(iter(batches), lambda b: b.mean(axis=(1, 2)))
    assert feats.shape == (24, 3)
