"""Datasets: all-in-one mixture, CDD-11, paired folders, benchmarks.

Behavioral spec (SURVEY.md §2.3):
* AIO training mixture with per-task oversampling (derain x120, LOL x20,
  GoPro x5, denoise x3 — MoCE-IR-main/src/data/dataset_utils.py:241-329)
* denoise tasks draw CLEAN patches; noise is synthesized later (on device)
* dehaze GT-name derivation: <root>/clear/<name-before-'_'><ext>
  (dataset_utils.py:342-347)
* CDD-11 with underscore-count single/double/triple subset filtering
  (dataset_utils.py:89-121), x2 train oversampling, 64px center test crops
* eval benchmarks: BSD68(+sigma), Rain100L, SOTS-outdoor, GoPro, LOLv1
  (IRBenchmarks :350-470) and SR benchmark folders (HR + LR_bicubic/XN).

All datasets are torch-free: item -> dict of numpy HWC float32 [0,1] plus
metadata (de_id, sigma, name). Batching/sharding lives in pipeline.py.
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import Dict, List, Sequence

import numpy as np
from PIL import Image

from image_restoration_tpu.data.augment import (
    crop_img_to_base,
    paired_random_crop,
    random_augmentation,
)

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".PNG", ".JPG")


def _imread(path: str) -> np.ndarray:
    return np.array(Image.open(path).convert("RGB"))


def _list_images(d: str) -> List[str]:
    out = []
    for e in IMG_EXTS:
        out += glob.glob(os.path.join(d, f"*{e}"))
    return sorted(out)


@dataclasses.dataclass(frozen=True)
class TaskSpec:
    """One degradation task in the AIO mixture."""

    name: str
    lq_dir: str | None            # None => synthetic (clean-only)
    gt_dir: str
    repeat: int = 1
    sigma: float = 0.0            # >0 => synthesize gaussian noise
    dehaze_gt_rule: bool = False  # derive GT name from hazy name


# canonical 5-task AIO layout (relative to data root), mirroring the
# reference's directory conventions and oversample ratios
TASK_SPECS: Dict[str, TaskSpec] = {
    "denoise_15": TaskSpec("denoise_15", None, "denoising", repeat=3, sigma=15),
    "denoise_25": TaskSpec("denoise_25", None, "denoising", repeat=3, sigma=25),
    "denoise_50": TaskSpec("denoise_50", None, "denoising", repeat=3, sigma=50),
    "derain": TaskSpec("derain", "deraining/RainTrainL/rainy", "deraining/RainTrainL/gt", repeat=120),
    "dehaze": TaskSpec("dehaze", "dehazing/RESIDE", "dehazing/RESIDE/clear", dehaze_gt_rule=True),
    "synllie": TaskSpec("synllie", "llie/LOLv1/Train/input", "llie/LOLv1/Train/target", repeat=20),
    "deblur": TaskSpec("deblur", "deblurring/GoPro/crop/train/input_crops",
                       "deblurring/GoPro/crop/train/target_crops", repeat=5),
}


def dehaze_gt_name(hazy_path: str) -> str:
    d = os.path.dirname(os.path.dirname(hazy_path))
    stem = os.path.basename(hazy_path).split("_")[0]
    ext = os.path.splitext(hazy_path)[1]
    return os.path.join(d, "clear", stem + ext)


def adair_rain_gt(rainy_path: str) -> str:
    """AdaIR derain GT rule (dataset_utils.py:133-135):
    ``.../rainy/rain-N.png -> .../gt/norain-N.png``."""
    return rainy_path.split("rainy")[0] + "gt/norain-" + rainy_path.split("rain-")[-1]


def adair_haze_gt(hazy_path: str) -> str:
    """AdaIR dehaze GT rule (dataset_utils.py:148-153):
    ``.../synthetic/partK/NAME_a_b.jpg -> .../original/NAME.jpg``."""
    d = hazy_path.split("synthetic")[0] + "original/"
    stem = hazy_path.split("/")[-1].split("_")[0]
    return d + stem + "." + hazy_path.split(".")[-1]


# AdaIR name-list protocol: txt file under data_file_dir per task
# (dataset_utils.py:60-116) + per-task image base dir relative to data root.
ADAIR_NAME_LISTS: Dict[str, tuple] = {
    # task -> (list file, base dir, gt rule or None for synthetic)
    "denoise_15": ("noisy/denoise.txt", "denoising", None),
    "denoise_25": ("noisy/denoise.txt", "denoising", None),
    "denoise_50": ("noisy/denoise.txt", "denoising", None),
    "derain": ("rainy/rainTrain.txt", "deraining", adair_rain_gt),
    "dehaze": ("hazy/hazy_outside.txt", "dehazing", adair_haze_gt),
}


class AIOTrainDataset:
    """All-in-one training mixture (AIOTrainDataset, dataset_utils.py:137-347)."""

    def __init__(self, data_root: str, de_type: Sequence[str], patch_size: int = 128,
                 seed: int = 0, specs: Dict[str, TaskSpec] | None = None,
                 name_list_dir: str | None = None):
        self.root = data_root
        self.patch_size = patch_size
        self.rng = np.random.default_rng(seed)
        specs = specs or TASK_SPECS
        self.de_type = list(de_type)
        self.de_ids = {t: i for i, t in enumerate(self.de_type)}
        self.items: List[tuple] = []  # (lq_path|None, gt_path, de_id, sigma)
        for t in self.de_type:
            spec = specs[t]
            if name_list_dir is not None and t in ADAIR_NAME_LISTS:
                # AdaIR txt name-list front-end (dataset_utils.py:60-116):
                # IDs come from data_file_dir/<task>/<list>.txt, one relative
                # path per line, resolved against the task's base dir; GT
                # names derived by the AdaIR string rules. Oversampling
                # ratios follow the folder-scan specs.
                list_file, base, gt_rule = ADAIR_NAME_LISTS[t]
                with open(os.path.join(name_list_dir, list_file)) as f:
                    ids = [ln.strip() for ln in f if ln.strip()]
                paths = [os.path.join(data_root, base, i) for i in ids]
                if gt_rule is None:  # synthetic denoise over clean ids
                    entries = [(None, p, self.de_ids[t], spec.sigma)
                               for p in paths]
                else:
                    entries = [(p, gt_rule(p), self.de_ids[t], 0.0)
                               for p in paths]
                self.items += entries * spec.repeat
                continue
            if spec.lq_dir is None:  # synthetic denoise over clean sets
                gt_root = os.path.join(data_root, spec.gt_dir)
                clean = []
                for sub in sorted(os.listdir(gt_root)) if os.path.isdir(gt_root) else []:
                    p = os.path.join(gt_root, sub)
                    clean += _list_images(p) if os.path.isdir(p) else []
                clean += _list_images(gt_root)
                entries = [(None, g, self.de_ids[t], spec.sigma) for g in clean]
            elif spec.dehaze_gt_rule:
                lqs = []
                base = os.path.join(data_root, spec.lq_dir)
                for part in sorted(glob.glob(os.path.join(base, "part*"))) or [base]:
                    lqs += _list_images(part)
                lqs = [p for p in lqs if "clear" not in p]
                entries = [(p, dehaze_gt_name(p), self.de_ids[t], 0.0) for p in lqs]
            else:
                lqs = _list_images(os.path.join(data_root, spec.lq_dir))
                gts = _list_images(os.path.join(data_root, spec.gt_dir))
                assert len(lqs) == len(gts), f"{t}: {len(lqs)} lq vs {len(gts)} gt"
                entries = [(l, g, self.de_ids[t], 0.0) for l, g in zip(lqs, gts)]
            self.items += entries * spec.repeat
        if not self.items:
            raise ValueError(f"no training items found under {data_root} for {de_type}")

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx: int) -> dict:
        lq_path, gt_path, de_id, sigma = self.items[idx]
        ps = self.patch_size
        if lq_path is None:  # synthetic: crop clean, augment; noise added on device
            hr = crop_img_to_base(_imread(gt_path), 16)
            hr, _ = paired_random_crop(hr, hr, ps, self.rng)
            hr = random_augmentation(hr, rng=self.rng)[0]
            lq = hr
        else:
            lq = crop_img_to_base(_imread(lq_path), 16)
            hr = crop_img_to_base(_imread(gt_path), 16)
            lq, hr = paired_random_crop(lq, hr, ps, self.rng)
            lq, hr = random_augmentation(lq, hr, rng=self.rng)
        return {
            "lq": lq.astype(np.float32) / 255.0,
            "gt": hr.astype(np.float32) / 255.0,
            "de_id": np.int32(de_id),
            "sigma": np.float32(sigma),
            "name": gt_path,
        }


class CDD11:
    """Composite-degradation dataset (dataset_utils.py:15-133)."""

    SUBSETS = ("all", "single", "double", "triple")

    def __init__(self, data_root: str, split: str = "train", subset: str = "all",
                 patch_size: int = 128, seed: int = 0):
        self.split = split
        self.patch_size = patch_size if split == "train" else 64
        self.rng = np.random.default_rng(seed)
        base = os.path.join(data_root, "cdd11", split)
        self.clean_dir = os.path.join(base, "clear")
        folders = sorted(
            d for d in glob.glob(os.path.join(base, "*/"))
            if os.path.basename(d.strip("/")) != "clear"
        )
        self.items = []
        for folder in folders:
            fname = os.path.basename(folder.strip("/"))
            count = fname.count("_") + 1
            keep = (
                subset == "all"
                or (subset == "single" and count == 1)
                or (subset == "double" and count == 2)
                or (subset == "triple" and count == 3)
                or (subset not in self.SUBSETS and fname == subset)
            )
            if not keep:
                continue
            imgs = _list_images(folder)
            if split == "train":
                imgs = imgs * 2
            self.items += [(p, fname) for p in imgs]
        if not self.items:
            raise ValueError(f"CDD11: nothing under {base} for subset={subset}")

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx: int) -> dict:
        lq_path, deg = self.items[idx]
        gt_path = os.path.join(self.clean_dir, os.path.basename(lq_path))
        lq, hr = _imread(lq_path), _imread(gt_path)
        if self.split == "train":
            lq, hr = paired_random_crop(lq, hr, self.patch_size, self.rng)
            lq, hr = random_augmentation(lq, hr, rng=self.rng)
        else:  # 64px top-left test crop (dataset_utils.py:24-27 protocol)
            lq = lq[: self.patch_size, : self.patch_size]
            hr = hr[: self.patch_size, : self.patch_size]
        return {
            "lq": lq.astype(np.float32) / 255.0,
            "gt": hr.astype(np.float32) / 255.0,
            "de_id": np.int32(0),
            "sigma": np.float32(0.0),
            "name": lq_path,
        }


class PairedFolderDataset:
    """Generic lq/gt folder pair for benchmarks (Rain100L, SOTS, GoPro, LOLv1,
    SR benchmarks with an LR_bicubic/XN layout, ...)."""

    def __init__(self, lq_dir: str, gt_dir: str, dehaze_rule: bool = False,
                 base_crop: int | None = None):
        self.lqs = _list_images(lq_dir)
        if dehaze_rule:
            self.gts = [dehaze_gt_name(p) for p in self.lqs]
        else:
            gts = {os.path.splitext(os.path.basename(p))[0]: p for p in _list_images(gt_dir)}
            self.gts = []
            for p in self.lqs:
                stem = os.path.splitext(os.path.basename(p))[0]
                # SR convention: LR '0801x4' -> HR '0801'
                key = stem if stem in gts else stem.split("x")[0]
                if key not in gts and "_" in stem:
                    key = stem.split("_")[0]
                self.gts.append(gts[key])
        self.base_crop = base_crop
        if not self.lqs:
            raise ValueError(f"no images in {lq_dir}")

    def __len__(self):
        return len(self.lqs)

    def __getitem__(self, idx: int) -> dict:
        lq, gt = _imread(self.lqs[idx]), _imread(self.gts[idx])
        if self.base_crop:
            lq = crop_img_to_base(lq, self.base_crop)
            gt = crop_img_to_base(gt, self.base_crop)
        return {
            "lq": lq.astype(np.float32) / 255.0,
            "gt": gt.astype(np.float32) / 255.0,
            "de_id": np.int32(0),
            "sigma": np.float32(0.0),
            "name": self.lqs[idx],
        }


class SRBenchmark:
    """Classic SR benchmark layout (SRConvNet-main/datas/benchmark.py:17-61):
    ``HR/{name}.png`` + ``LR_bicubic/X{scale}/{name}x{scale}.png``; the HR is
    cropped to ``lr_size * scale`` so shapes divide exactly (:60-61).

    When the LR_bicubic folder is absent, ``synthesize_lr=True`` generates
    the LR on the fly with the MATLAB-protocol bicubic downscale
    (data/imresize.py, MoCE-IR-main/src/utils/imresize.py behavior) —
    VERDICT r2 Missing #6."""

    def __init__(self, root: str, scale: int = 4,
                 hr_dirname: str = "HR", lr_dirname: str = "LR_bicubic",
                 synthesize_lr: bool | None = None):
        self.scale = int(scale)
        hr_dir = os.path.join(root, hr_dirname)
        lr_dir = os.path.join(root, lr_dirname, f"X{scale}")
        self.hrs = _list_images(hr_dir)
        if not self.hrs:
            raise ValueError(f"no images in {hr_dir}")
        if synthesize_lr is None:
            synthesize_lr = not os.path.isdir(lr_dir)
        self.synthesize_lr = synthesize_lr
        self.lrs = []
        if not synthesize_lr:
            for p in self.hrs:
                stem, ext = os.path.splitext(os.path.basename(p))
                cand = os.path.join(lr_dir, f"{stem}x{scale}{ext}")
                if not os.path.exists(cand):  # some sets drop the xN suffix
                    cand = os.path.join(lr_dir, f"{stem}{ext}")
                if not os.path.exists(cand):
                    raise FileNotFoundError(f"missing LR for {p}: {cand}")
                self.lrs.append(cand)

    def __len__(self):
        return len(self.hrs)

    def __getitem__(self, idx: int) -> dict:
        s = self.scale
        hr = _imread(self.hrs[idx])
        if self.synthesize_lr:
            from image_restoration_tpu.data.imresize import imresize

            # crop HR to a multiple of s first (MATLAB convention), then
            # bicubic-downscale in [0,255] and round like an 8-bit save
            hr = hr[: hr.shape[0] // s * s, : hr.shape[1] // s * s]
            lr = imresize(hr.astype(np.float64), scale_factor=1.0 / s)
            lr = np.clip(np.round(lr), 0, 255).astype(hr.dtype)
            name = self.hrs[idx]
        else:
            lr = _imread(self.lrs[idx])
            name = self.lrs[idx]
        hr = hr[: lr.shape[0] * s, : lr.shape[1] * s]
        return {
            "lq": lr.astype(np.float32) / 255.0,
            "gt": hr.astype(np.float32) / 255.0,
            "de_id": np.int32(0),
            "sigma": np.float32(0.0),
            "name": name,
        }


class DenoiseBenchmark:
    """BSD68/Urban100-style clean-folder benchmark with test-time noise at a
    fixed sigma (IRBenchmarks/DenoiseTestDataset set_sigma behavior)."""

    def __init__(self, clean_dir: str, sigma: float = 25.0, seed: int = 0,
                 base_crop: int | None = 16):
        self.paths = _list_images(clean_dir)
        self.sigma = float(sigma)
        self.seed = seed
        self.base_crop = base_crop
        if not self.paths:
            raise ValueError(f"no images in {clean_dir}")

    def set_sigma(self, sigma: float):
        self.sigma = float(sigma)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int) -> dict:
        from image_restoration_tpu.data.degradations import add_gaussian_noise_np

        gt = _imread(self.paths[idx])
        if self.base_crop:
            gt = crop_img_to_base(gt, self.base_crop)
        rng = np.random.default_rng(self.seed + idx)  # deterministic per image
        lq = add_gaussian_noise_np(gt, self.sigma, rng)
        return {
            "lq": lq.astype(np.float32) / 255.0,
            "gt": gt.astype(np.float32) / 255.0,
            "de_id": np.int32(0),
            "sigma": np.float32(self.sigma),
            "name": self.paths[idx],
        }
