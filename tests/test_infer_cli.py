"""Inference-only surfaces (VERDICT r2 Missing #5): cli.infer folder/frame
restoration and cli.test --unpaired no-GT NIQE eval."""

import os

import numpy as np
import pytest
from PIL import Image

TINY = ["--model", "restormer", "--fp32",
        "--set", "model_kwargs.dim=8",
        "--set", "model_kwargs.num_blocks=(1,1,1,1)",
        "--set", "model_kwargs.num_refinement_blocks=1"]


@pytest.fixture
def frames_dir(tmp_path, rng):
    d = tmp_path / "frames"
    d.mkdir()
    for i in range(3):
        arr = (rng.random((40, 52, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(str(d / f"f{i:03d}.png"))
    return str(d)


def test_infer_folder(frames_dir, tmp_path):
    from image_restoration_tpu.cli import infer

    out_dir = str(tmp_path / "restored")
    outs = infer.main(TINY + ["--input", frames_dir, "--output_dir", out_dir])
    assert len(outs) == 3
    for p in outs:
        img = np.asarray(Image.open(p))
        assert img.shape == (40, 52, 3)  # odd sizes pad+crop back


def test_infer_single_image_tiled(frames_dir, tmp_path):
    """SRConvNet test_custom_image.py analog: one file, tiled forward."""
    from image_restoration_tpu.cli import infer

    one = os.path.join(frames_dir, sorted(os.listdir(frames_dir))[0])
    out_dir = str(tmp_path / "restored1")
    outs = infer.main(TINY + ["--input", one, "--output_dir", out_dir,
                              "--tile", "32"])
    assert len(outs) == 1 and os.path.exists(outs[0])


def test_infer_video_without_ffmpeg(frames_dir, tmp_path, monkeypatch):
    from image_restoration_tpu.cli import infer

    fake = tmp_path / "clip.mp4"
    fake.write_bytes(b"\x00")
    monkeypatch.setattr(infer, "_ffmpeg", lambda: None)
    with pytest.raises(SystemExit, match="ffmpeg"):
        infer.main(TINY + ["--input", str(fake),
                           "--output_dir", str(tmp_path / "o")])


@pytest.mark.skipif(
    not os.path.exists("/root/reference/HOGformer-main/settingI/basicsr/"
                       "metrics/niqe_pris_params.npz"),
    reason="pristine NIQE stats (reference data file) not mounted")
def test_unpaired_niqe(frames_dir, tmp_path):
    from image_restoration_tpu.cli import test as test_cli

    out_dir = str(tmp_path / "res")
    # NIQE needs at least one 96x96 block
    big = tmp_path / "big"
    big.mkdir()
    rng = np.random.default_rng(3)
    base = rng.random((1, 1, 3)) * np.ones((112, 112, 3))
    noisy = np.clip(base + rng.normal(0, 0.08, (112, 112, 3)), 0, 1)
    Image.fromarray((noisy * 255).astype(np.uint8)).save(str(big / "a.png"))
    results = test_cli.main(TINY + ["--unpaired", "--lq_dir", str(big),
                                    "--output_dir", out_dir])
    r = results["unpaired"]
    assert r["n"] == 1
    assert np.isfinite(r["niqe"]) and np.isfinite(r["niqe_input"])
    assert os.path.exists(os.path.join(out_dir, "results.json"))
