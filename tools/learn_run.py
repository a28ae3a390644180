"""Overfit-to-quality run: prove the FULL cli/train.py loop (scheduler, EMA,
validation, save-best) trains a Restormer to high PSNR — the reference's
reason to exist (NeRD-Rain-main/train.py:142-217's train-to-benchmark loop).

Builds a deterministic 2-image synthetic rain set (the vendored-2-image
Rain200L fixture pattern, NeRD-Rain-main/Datasets/), trains through the CLI
entry point, and writes LEARN_r{N}.json with the loss curve, the validation
PSNR curve, and the best checkpoint's PSNR.

Usage:  python tools/learn_run.py [--steps 2000] [--out LEARN_r03.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_rain_pair(rng, size=128, n_streaks=120):
    """Structured clean image (smooth gradients + shapes) + additive
    synthetic rain streaks — a deterministic, learnable degradation."""
    yy, xx = np.mgrid[0:size, 0:size] / size
    clean = np.stack([
        0.5 + 0.4 * np.sin(2 * np.pi * (xx * rng.uniform(1, 3) + rng.random())),
        0.5 + 0.4 * np.cos(2 * np.pi * (yy * rng.uniform(1, 3) + rng.random())),
        0.5 + 0.3 * np.sin(2 * np.pi * ((xx + yy) * rng.uniform(1, 2))),
    ], axis=-1)
    for _ in range(6):  # boxes with distinct colors
        y0, x0 = rng.integers(0, size - 24, 2)
        h, w = rng.integers(8, 24, 2)
        clean[y0:y0 + h, x0:x0 + w] = rng.random(3)
    rain = np.zeros((size, size), np.float64)
    for _ in range(n_streaks):
        y0, x0 = rng.integers(0, size, 2)
        ln = rng.integers(6, 18)
        for t in range(ln):
            y, x = y0 + t, x0 + t // 3
            if y < size and x < size:
                rain[y, x] += rng.uniform(0.3, 0.7)
    rainy = np.clip(clean + rain[..., None] * np.array([0.9, 0.95, 1.0]), 0, 1)
    return np.clip(clean, 0, 1), rainy


def write_dataset(root, n_images=4, size=128, seed=7):
    from PIL import Image

    rng = np.random.default_rng(seed)
    gt_dir = os.path.join(root, "gt")
    lq_dir = os.path.join(root, "lq")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(lq_dir, exist_ok=True)
    for i in range(n_images):
        clean, rainy = make_rain_pair(rng, size)
        Image.fromarray((clean * 255).round().astype(np.uint8)).save(
            os.path.join(gt_dir, f"{i}.png"))
        Image.fromarray((rainy * 255).round().astype(np.uint8)).save(
            os.path.join(lq_dir, f"{i}.png"))
    return lq_dir, gt_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--out", type=str, default="LEARN_r03.json")
    ap.add_argument("--dim", type=int, default=24)
    ap.add_argument("--workdir", type=str, default=None)
    args = ap.parse_args()

    work = args.workdir or tempfile.mkdtemp(prefix="learn_run_")
    lq_dir, gt_dir = write_dataset(os.path.join(work, "data"))
    exp_dir = os.path.join(work, "exp")

    from image_restoration_tpu.cli import train as train_cli

    argv = [
        "--model", "restormer", "--trainset", "paired",
        "--lq_dir", lq_dir, "--gt_dir", gt_dir,
        "--patch_size", "64", "--batch_size", "4", "--epochs", "1",
        "--lr", "1e-3", "--scheduler", "linear_warmup_cosine",
        "--warmup_epochs", "0", "--max_steps", str(args.steps),
        "--ema_decay", "0.99", "--grad_clip", "1.0",
        "--val_every", str(max(args.steps // 20, 1)),
        "--val_lq_dir", lq_dir, "--val_gt_dir", gt_dir,
        "--ckpt_dir", exp_dir, "--name", "overfit",
        "--save_every", "100000", "--log_every", "25",
        "--set", f"model_kwargs.dim={args.dim}",
        "--set", "model_kwargs.num_blocks=(2,2,2,2)",
        "--set", "model_kwargs.num_refinement_blocks=2",
        "--set", "model_kwargs.heads=(1,2,4,8)",
    ]
    train_cli.main(argv)

    metrics_path = os.path.join(exp_dir, "overfit", "metrics.jsonl")
    logged = [json.loads(l) for l in open(metrics_path)]
    loss_curve = [(e["step"], e["train/total"]) for e in logged
                  if "train/total" in e]
    psnr_curve = [(e["step"], e["val/psnr"]) for e in logged
                  if "val/psnr" in e]
    best_file = os.path.join(exp_dir, "overfit", "ckpt", "best")
    best_step, best_psnr = open(best_file).read().split()

    # PSNR at init for the gain statement: degraded-vs-clean baseline
    from PIL import Image
    psnr0 = []
    for i in range(4):
        a = np.asarray(Image.open(os.path.join(lq_dir, f"{i}.png")), np.float64) / 255
        b = np.asarray(Image.open(os.path.join(gt_dir, f"{i}.png")), np.float64) / 255
        psnr0.append(-10 * np.log10(np.mean((a - b) ** 2)))
    out = {
        "task": "overfit 2-image synthetic rain through full cli/train.py "
                "(scheduler+EMA+validation+save-best)",
        "model": f"restormer dim={args.dim} blocks=(2,2,2,2)",
        "steps": args.steps,
        "input_psnr": round(float(np.mean(psnr0)), 3),
        "first_val_psnr": round(psnr_curve[0][1], 3) if psnr_curve else None,
        "best_val_psnr": round(float(best_psnr), 3),
        "best_step": int(best_step),
        "loss_curve": [(s, round(v, 5)) for s, v in loss_curve],
        "psnr_curve": [(s, round(v, 3)) for s, v in psnr_curve],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("loss_curve", "psnr_curve")}, indent=1))
    gain = out["best_val_psnr"] - out["input_psnr"]
    print(f"PSNR gain over degraded input: {gain:.2f} dB "
          f"({'OK' if out['best_val_psnr'] > 30 and gain > 10 else 'WEAK'})")


if __name__ == "__main__":
    main()
