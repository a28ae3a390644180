"""MATLAB-protocol imresize parity vs the reference port
(MoCE-IR-main/src/utils/imresize.py) — VERDICT r2 item 10.

The reference port deviates from true MATLAB at image borders (its
field_of_view is cast to np.uint BEFORE kernel evaluation, imresize.py:112,
so out-of-range taps truncate+renormalize instead of mirroring); our
``boundary='renorm'`` mode reproduces it bit-for-bit, while the default
``boundary='mirror'`` follows the real MATLAB algorithm — the two agree
everywhere except within a kernel width of the border.
"""

import os

import numpy as np
import pytest

from conftest import load_reference_module


@pytest.fixture(scope="module")
def ref():
    return load_reference_module("MoCE-IR-main/src/utils/imresize.py",
                                 "ref_imresize")


SCALES = [0.5, 1.0 / 3.0, 0.25, 2.0, 1.7, 0.73]


@pytest.mark.parametrize("scale", SCALES)
def test_renorm_matches_reference(rng, ref, scale):
    from image_restoration_tpu.data.imresize import imresize

    for shape in [(17, 23, 3), (32, 32)]:
        im = rng.random(shape)
        want = ref.imresize(im.copy(), scale_factor=scale)
        got = imresize(im, scale_factor=scale, boundary="renorm")
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-12)


def test_mirror_matches_reference_interior(rng, ref):
    """True-MATLAB mirror mode: identical away from the borders."""
    from image_restoration_tpu.data.imresize import imresize

    im = rng.random((40, 44, 3))
    want = ref.imresize(im.copy(), scale_factor=0.5)
    got = imresize(im, scale_factor=0.5)
    np.testing.assert_allclose(got[5:-5, 5:-5], want[5:-5, 5:-5], atol=1e-12)


def test_output_shape_and_no_antialias(rng, ref):
    from image_restoration_tpu.data.imresize import imresize

    im = rng.random((30, 20, 3))
    np.testing.assert_allclose(
        imresize(im, output_shape=(13, 9), boundary="renorm"),
        ref.imresize(im.copy(), output_shape=(13, 9)), atol=1e-12)
    np.testing.assert_allclose(
        imresize(im, scale_factor=0.5, antialiasing=False, boundary="renorm"),
        ref.imresize(im.copy(), scale_factor=0.5, antialiasing=False),
        atol=1e-12)


def test_upscale_has_no_antialias_widening(rng, ref):
    """Antialiasing only applies when downscaling (imresize.py:25)."""
    from image_restoration_tpu.data.imresize import imresize

    im = rng.random((16, 16))
    np.testing.assert_allclose(
        imresize(im, scale_factor=3.0, boundary="renorm"),
        ref.imresize(im.copy(), scale_factor=3.0), atol=1e-12)


def test_jax_path_matches_numpy(rng):
    import jax.numpy as jnp

    from image_restoration_tpu.data.imresize import imresize

    im = rng.random((24, 18, 3)).astype(np.float32)
    a = imresize(im.astype(np.float64), scale_factor=0.5)
    b = np.asarray(imresize(jnp.asarray(im), scale_factor=0.5))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_lr_synthesis_shape():
    """SR-dataset use: x4 LR from a GT crop."""
    from image_restoration_tpu.data.imresize import imresize

    gt = np.random.default_rng(0).random((128, 128, 3))
    lr = imresize(gt, scale_factor=0.25)
    assert lr.shape == (32, 32, 3)


def test_srbenchmark_synthesizes_lr(tmp_path, rng):
    """SRBenchmark without an LR_bicubic folder synthesizes MATLAB-bicubic
    LR on the fly (VERDICT r2 Missing #6)."""
    from PIL import Image

    from image_restoration_tpu.data.datasets import SRBenchmark

    hr_dir = tmp_path / "HR"
    hr_dir.mkdir()
    for i in range(2):
        arr = (rng.random((37, 41, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(str(hr_dir / f"{i}.png"))
    ds = SRBenchmark(str(tmp_path), scale=4)
    assert ds.synthesize_lr and len(ds) == 2
    item = ds[0]
    assert item["lq"].shape == (9, 10, 3)       # 36x40 HR crop / 4
    assert item["gt"].shape == (36, 40, 3)
    # the synthesized LR matches imresize of the cropped HR
    from image_restoration_tpu.data.imresize import imresize

    hr = np.asarray(Image.open(str(hr_dir / os.path.basename(item["name"]))))
    want = imresize(hr[:36, :40].astype(np.float64), scale_factor=0.25)
    want = np.clip(np.round(want), 0, 255) / 255.0
    np.testing.assert_allclose(item["lq"], want.astype(np.float32), atol=1e-6)
