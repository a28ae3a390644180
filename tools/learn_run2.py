"""Overfit-to-quality runs for the HARD training paths (VERDICT r3 #6):

* ``moce_ir``  — exercises noisy top-k routing + aux-loss weighting + EMA
  together through the full cli/train.py loop (the reference recipe is
  MoCE-IR-main/src/train.py:59-88: Lightning loop, L1 + aux balance loss).
* ``nerd_rain`` — exercises the 3-scale Gaussian-pyramid multi-output recipe
  with INR intermediate supervision (NeRD-Rain-main/train.py:155-163).

Same deterministic 2-image synthetic rain fixture and CLI drive as
tools/learn_run.py (which proved Restormer, LEARN_r03.json). Writes
LEARN_<model>_r05.json with loss/PSNR curves.

Usage: python tools/learn_run2.py --model moce_ir [--steps 2000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from learn_run import write_dataset

MODEL_ARGS = {
    "moce_ir": [
        # defaults-shaped MoCE-IR, slightly slimmed; routing/aux/EMA all on
        "--model", "moce_ir", "--recipe", "default",
        "--set", "aux_loss_weight=0.01",
        "--set", "model_kwargs.dim=24",
        "--set", "model_kwargs.num_experts=4",
        "--set", "model_kwargs.topk=2",
        "--lr", "1e-3",
    ],
    "nerd_rain": [
        "--model", "nerd_rain", "--recipe", "nerd_rain",
        "--set", "model_kwargs.dim=16",
        "--set", "model_kwargs.num_blocks=(1,2,2)",
        "--set", "model_kwargs.heads=(1,2,4)",
        "--lr", "1e-3",
    ],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=sorted(MODEL_ARGS), required=True)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--workdir", type=str, default=None)
    args = ap.parse_args()
    out_path = args.out or f"LEARN_{args.model}_r05.json"

    work = args.workdir or tempfile.mkdtemp(prefix=f"learn_{args.model}_")
    lq_dir, gt_dir = write_dataset(os.path.join(work, "data"))
    exp_dir = os.path.join(work, "exp")

    from image_restoration_tpu.cli import train as train_cli

    argv = MODEL_ARGS[args.model] + [
        "--trainset", "paired", "--lq_dir", lq_dir, "--gt_dir", gt_dir,
        "--patch_size", "64", "--batch_size", "4", "--epochs", "1",
        "--scheduler", "linear_warmup_cosine", "--warmup_epochs", "0",
        "--max_steps", str(args.steps),
        "--ema_decay", "0.99", "--grad_clip", "1.0",
        "--val_every", str(max(args.steps // 20, 1)),
        "--val_lq_dir", lq_dir, "--val_gt_dir", gt_dir,
        "--ckpt_dir", exp_dir, "--name", "overfit",
        "--save_every", "100000", "--log_every", "25",
    ]
    train_cli.main(argv)

    metrics_path = os.path.join(exp_dir, "overfit", "metrics.jsonl")
    logged = [json.loads(l) for l in open(metrics_path)]
    loss_curve = [(e["step"], e["train/total"]) for e in logged
                  if "train/total" in e]
    psnr_curve = [(e["step"], e["val/psnr"]) for e in logged
                  if "val/psnr" in e]
    best_step, best_psnr = open(
        os.path.join(exp_dir, "overfit", "ckpt", "best")).read().split()

    from PIL import Image
    psnr0 = []
    for i in range(4):
        a = np.asarray(Image.open(os.path.join(lq_dir, f"{i}.png")), np.float64) / 255
        b = np.asarray(Image.open(os.path.join(gt_dir, f"{i}.png")), np.float64) / 255
        psnr0.append(-10 * np.log10(np.mean((a - b) ** 2)))
    out = {
        "task": f"overfit 2-image synthetic rain: {args.model} through full "
                "cli/train.py (scheduler+EMA+validation+save-best)",
        "model": args.model,
        "model_args": MODEL_ARGS[args.model],
        "steps": args.steps,
        "input_psnr": round(float(np.mean(psnr0)), 3),
        "first_val_psnr": round(psnr_curve[0][1], 3) if psnr_curve else None,
        "best_val_psnr": round(float(best_psnr), 3),
        "best_step": int(best_step),
        "loss_curve": [(s, round(v, 5)) for s, v in loss_curve],
        "psnr_curve": [(s, round(v, 3)) for s, v in psnr_curve],
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("loss_curve", "psnr_curve")}, indent=1))
    gain = out["best_val_psnr"] - out["input_psnr"]
    print(f"PSNR gain over degraded input: {gain:.2f} dB "
          f"({'OK' if out['best_val_psnr'] > 28 and gain > 8 else 'WEAK'})")


if __name__ == "__main__":
    main()
