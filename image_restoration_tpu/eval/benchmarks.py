"""Benchmark eval loops — the `run_{derain,dehaze,denoise_N,...}` registry
(MoCE-IR-main/src/test.py:82-188 string-dispatch) rebuilt around one engine.

Each benchmark = dataset factory + metric protocol. The engine pads or tiles
each image to a static shape (bucketed to bound recompilation), runs the
jitted model, computes on-device PSNR/SSIM, and optionally saves outputs
(save_img analog)."""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np

from image_restoration_tpu.data.datasets import DenoiseBenchmark, PairedFolderDataset
from image_restoration_tpu.eval import metrics as M
from image_restoration_tpu.eval.tiled import pad_test, windowed_apply


@dataclasses.dataclass
class BenchResult:
    name: str
    psnr: float
    ssim: float
    n: int
    extra: dict = dataclasses.field(default_factory=dict)


def save_png(path: str, img01: np.ndarray):
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = np.clip(np.asarray(img01) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def evaluate(
    fn: Callable,
    dataset,
    name: str = "bench",
    pad_multiple: int = 8,
    tile: int | None = None,
    y_channel: bool = False,
    crop_border: int = 0,
    save_dir: str | None = None,
) -> BenchResult:
    """fn: jitted (B,H,W,C)->(B,H,W,C) restorer. Batch=1 per image (the
    reference protocol), shapes padded to x pad_multiple."""
    # device scalars are accumulated and fetched in ONE readback at the end:
    # through a remote-tunnel backend every float() costs a full RTT.
    psnrs, ssims, outs = [], [], []
    for i in range(len(dataset)):
        item = dataset[i]
        lq = jnp.asarray(item["lq"])[None]
        gt = jnp.asarray(item["gt"])[None]
        if tile:
            out = windowed_apply(fn, lq, tile)
        else:
            out = pad_test(fn, lq, pad_multiple)
        out = jnp.clip(out, 0.0, 1.0)
        if y_channel:
            psnrs.append(M.psnr_yc(out, gt, crop_border)[0])
            ssims.append(M.ssim_yc(out, gt, crop_border)[0])
        else:
            psnrs.append(M.psnr(out, gt)[0])
            ssims.append(M.ssim(out, gt)[0])
        if save_dir:
            outs.append((item["name"], out[0]))
    vals = np.asarray(jnp.stack(psnrs + ssims))  # single transfer
    psnr_v, ssim_v = vals[: len(psnrs)], vals[len(psnrs):]
    for nm, img in outs:
        base = os.path.splitext(os.path.basename(nm))[0]
        save_png(os.path.join(save_dir, name, base + ".png"), np.asarray(img))
    return BenchResult(name, float(np.mean(psnr_v)), float(np.mean(ssim_v)), len(psnr_v))


# ---------------------------------------------------------------------------
# benchmark registry: name -> dataset factory(data_root, **kw)

def _bsd68(root, sigma):
    return DenoiseBenchmark(os.path.join(root, "denoising/bsd68"), sigma=sigma)


BENCHMARKS: Dict[str, Callable] = {
    "denoise_15": lambda root: _bsd68(root, 15),
    "denoise_25": lambda root: _bsd68(root, 25),
    "denoise_50": lambda root: _bsd68(root, 50),
    "derain": lambda root: PairedFolderDataset(
        os.path.join(root, "deraining/Rain100L/input"),
        os.path.join(root, "deraining/Rain100L/target")),
    "dehaze": lambda root: PairedFolderDataset(
        os.path.join(root, "dehazing/SOTS/outdoor/hazy"),
        os.path.join(root, "dehazing/SOTS/outdoor"), dehaze_rule=True),
    "deblur": lambda root: PairedFolderDataset(
        os.path.join(root, "deblurring/GoPro/test/input"),
        os.path.join(root, "deblurring/GoPro/test/target")),
    "synllie": lambda root: PairedFolderDataset(
        os.path.join(root, "llie/LOLv1/Test/input"),
        os.path.join(root, "llie/LOLv1/Test/target")),
}

# AdaIR test.py --mode int switch (test.py:101-102)
MODE_TO_BENCHMARKS = {
    0: ["denoise_15", "denoise_25", "denoise_50"],
    1: ["derain"],
    2: ["dehaze"],
    3: ["denoise_25", "derain", "dehaze"],  # aio-3
    4: ["deblur"],
    5: ["synllie"],
    6: ["denoise_25", "derain", "dehaze", "deblur", "synllie"],  # aio-5
}


def run_benchmark(bench: str, fn, data_root: str, **kw) -> BenchResult:
    if bench not in BENCHMARKS:
        raise KeyError(f"unknown benchmark {bench}; have {sorted(BENCHMARKS)}")
    ds = BENCHMARKS[bench](data_root)
    return evaluate(fn, ds, name=bench, **kw)
