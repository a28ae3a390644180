"""Config/options system.

The reference zoo has four coexisting option styles (SURVEY.md §1 L0):
per-model argparse subparsers (MoCE-IR-main/src/options.py:23-101), plain
YAML (DarkIR options/options.py:27-34), BasicSR YAML->nested dict with CLI
launcher overrides (settingI/basicsr/utils/options.py), and YAML-merged-into-
argparse (SRConvNet train.py:36-39). Here: ONE system covering all of them —
an argparse surface mirroring the familiar flags, an optional ``--config``
YAML whose keys become defaults (argparse wins), dotted ``--set a.b=c``
overrides for nested keys, and the effective config re-dumped per experiment
(SRConvNet train.py:128-131 behavior).
"""

from __future__ import annotations

import argparse
import ast
import copy
import os
from typing import Any, Dict

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None


MODEL_DEFAULTS: Dict[str, Dict[str, Any]] = {
    # mirrors the reference configs (options.py subparsers & per-repo yml)
    "restormer": dict(dim=48, num_blocks=[4, 6, 6, 8], heads=[1, 2, 4, 8],
                      num_refinement_blocks=4, ffn_expansion_factor=2.66),
    "adair": dict(dim=48, num_blocks=[4, 6, 6, 8], heads=[1, 2, 4, 8],
                  num_refinement_blocks=4),
    # MoCE_IR (big) per MoCE-IR-main/src/options.py:69-84; MoCE_IR_S is dim=32
    "moce_ir": dict(dim=48, levels=4, num_blocks=[4, 6, 6, 8],
                    num_dec_blocks=[2, 4, 4], heads=[1, 2, 4, 8],
                    num_refinement_blocks=4, topk=1, num_experts=4, rank=2,
                    stage_depth=[1, 1, 1], rank_type="spread",
                    depth_type="constant", with_complexity=True,
                    complexity_scale="max"),
    "transweather": dict(),
    "srconvnet": dict(dim=64, n_blocks=10, num_heads=8, scale=4),
    # DarkIR-m defaults (DarkIR.py:11-28)
    "darkir": dict(width=32, enc_blk_nums=[1, 2, 3], middle_blk_num_enc=2,
                   middle_blk_num_dec=2, dec_blk_nums=[3, 1, 1],
                   dilations=[1, 4, 9]),
    # NeRD-Rain large (model.py:234: dim=48, blocks (2,3,3), heads (1,2,4))
    "nerd_rain": dict(dim=48, num_blocks=[2, 3, 3], heads=[1, 2, 4]),
    "drsformer": dict(dim=48, num_blocks=[4, 6, 6, 8], heads=[1, 2, 4, 8]),
    "sfhformer": dict(),
    "hogformer": dict(dim=36, num_blocks=[4, 4, 6, 8], heads=[1, 2, 4, 8]),
    "cg_ir": dict(dim=48, num_blocks=[4, 6, 6, 8], heads=[1, 2, 4, 8]),
    "igmoce_ir": dict(dim=48, num_blocks=[4, 6, 6, 8], heads=[1, 2, 4, 8]),
    "measnet": dict(dim=32),
    "mwformer": dict(),
    # LSNet-T (lsnet.py:231; s/b variants via --set model_kwargs.*)
    "lsnet": dict(embed_dim=[64, 128, 192, 256], depth=[1, 2, 3, 4]),
    # dense-prediction engines (retinanet_lsnet_t_fpn / fpn_lsnet configs)
    "retinanet_lsnet": dict(num_classes=80),
    "semanticfpn_lsnet": dict(num_classes=150),
    # remaining registry entries keep their flax-field defaults, which
    # already mirror the reference configs; listed so --model help is total
    "lumisense_moe": dict(),
    "mymodel": dict(),
    "rectiformer": dict(),
    "fpn_restormer": dict(),
    "ipt": dict(),
    "edt": dict(),
    "vig": dict(),
    "vig_h": dict(),
    "moce_ir_patch": dict(),
    "sfsnid": dict(),
    "hilo": dict(dim=96),
    "pinn": dict(),
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("image_restoration_tpu")
    p.add_argument("--config", type=str, default=None, help="YAML config file")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VAL", help="dotted config override")
    p.add_argument("--model", type=str, default="restormer")
    # data (mirrors MoCE/AdaIR option names)
    p.add_argument("--data_file_dir", type=str, default="data/")
    p.add_argument("--de_type", nargs="+",
                   default=["denoise_15", "denoise_25", "denoise_50", "derain", "dehaze"])
    p.add_argument("--patch_size", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--trainset", type=str, default="aio",
                   choices=["aio", "cdd11", "paired"])
    p.add_argument("--cdd11_split", type=str, default="all")
    p.add_argument("--lq_dir", type=str, default=None)
    p.add_argument("--gt_dir", type=str, default=None)
    # optimization
    p.add_argument("--epochs", type=int, default=120)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--scheduler", type=str, default="linear_warmup_cosine")
    p.add_argument("--warmup_epochs", type=int, default=15)
    p.add_argument("--grad_clip", type=float, default=None)
    p.add_argument("--ema_decay", type=float, default=None)
    p.add_argument("--loss", nargs="+", default=["l1=1.0"],
                   help="terms name=weight, e.g. l1=1.0 fft=0.1")
    p.add_argument("--aux_loss_weight", type=float, default=0.01)
    p.add_argument("--recipe", type=str, default="default",
                   help="loss recipe: default|nerd_rain|darkir|hogformer")
    p.add_argument("--seed", type=int, default=0)
    # mixup (BasicSR mixing_augs, image_restoration_model.py:145-170)
    p.add_argument("--mixup", action="store_true")
    p.add_argument("--mixup_beta", type=float, default=1.2)
    p.add_argument("--mixup_identity", action="store_true",
                   help="use_identity: sometimes skip the mix")
    # progressive patch/batch schedule (BasicSR train.py:296-326;
    # HOGformer yml mini_batch_sizes/gt_sizes/iters)
    p.add_argument("--prog_iters", nargs="+", type=int, default=None,
                   help="group lengths, e.g. 92000 64000 48000 36000 36000 24000")
    p.add_argument("--prog_gt_sizes", nargs="+", type=int, default=None)
    p.add_argument("--prog_batch_sizes", nargs="+", type=int, default=None)
    # plateau LR (BasicSR ReduceLROnPlateau branch, train.py:285-293)
    p.add_argument("--accumulate_grad_batches", type=int, default=1,
                   help="micro-steps per optimizer step (Lightning "
                        "accumulate_grad_batches, MoCE-IR train.py:128-135)")
    p.add_argument("--freeze", nargs="+", default=None,
                   help="top-level param subtree prefixes to freeze "
                        "(e.g. style_filter for MWFormer stage 2)")
    p.add_argument("--style_ckpt", type=str, default=None,
                   help="stage-1 StyleFilter checkpoint (orbax dir/.npz/.pth) "
                        "grafted under params['style_filter'] "
                        "(MWFormer/main_train_style.py two-stage driver)")
    p.add_argument("--vgg_ckpt", type=str, default=None,
                   help="torchvision vgg16 .pth for the transweather "
                        "perceptual recipe (train.py:161-164)")
    p.add_argument("--plateau", action="store_true")
    p.add_argument("--plateau_factor", type=float, default=0.5)
    p.add_argument("--plateau_patience", type=int, default=3)
    p.add_argument("--plateau_window", type=int, default=1000)
    # in-training validation (NeRD-Rain train.py:176-198 best-PSNR cycle)
    p.add_argument("--val_lq_dir", type=str, default=None)
    p.add_argument("--val_gt_dir", type=str, default=None)
    p.add_argument("--val_max_images", type=int, default=0,
                   help="cap validation set size (0 = all)")
    # precision / mesh
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--fp32", dest="bf16", action="store_false")
    p.add_argument("--mesh", nargs="+", type=int, default=None,
                   help="mesh shape over (data, expert, spatial)")
    # io
    p.add_argument("--ckpt_dir", type=str, default="train_ckpt")
    p.add_argument("--name", type=str, default="exp")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--save_every", type=int, default=1000)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--val_every", type=int, default=0)
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--tb", action="store_true")
    # eval (test.py surface: --mode int switch & --benchmarks, AdaIR test.py:101)
    p.add_argument("--benchmarks", nargs="+", default=["derain"])
    p.add_argument("--mode", type=int, default=None,
                   help="AdaIR-style switch: 0 denoise, 1 derain, 2 dehaze, 3 aio3, ...")
    p.add_argument("--sigmas", nargs="+", type=float, default=[15, 25, 50])
    p.add_argument("--ckpt", type=str, default=None, help="checkpoint to load (orbax dir/step, .npz, or torch .pth/.ckpt)")
    p.add_argument("--prefer_ema", action="store_true")
    p.add_argument("--tile", type=int, default=None, help="window size for tiled inference")
    p.add_argument("--lpips_ckpt", type=str, default=None,
                   help="torch .pth with vgg16+lpips-head weights; enables the LPIPS column")
    p.add_argument("--pad_multiple", type=int, default=8)
    p.add_argument("--save_images", type=str, default=None)
    p.add_argument("--output_dir", type=str, default="results")
    p.add_argument("--input", type=str, default=None,
                   help="cli.infer source: image file, folder, frame "
                        "sequence dir, or (with ffmpeg on PATH) video file")
    p.add_argument("--fps", type=int, default=24,
                   help="output frame rate when re-encoding video")
    p.add_argument("--unpaired", action="store_true",
                   help="no-GT eval: restore --lq_dir and report NIQE "
                        "(DarkIR testing_unpaired.py analog)")
    p.add_argument("--niqe_params", type=str, default=None,
                   help="niqe_pris_params.npz path (defaults to the "
                        "reference's copy when mounted)")
    return p


def parse_loss_terms(terms) -> Dict[str, float]:
    if isinstance(terms, dict):
        return {k: float(v) for k, v in terms.items()}
    out = {}
    for t in terms:
        k, _, v = t.partition("=")
        out[k] = float(v) if v else 1.0
    return out


def _set_dotted(cfg: dict, key: str, value: str):
    node = cfg
    parts = key.split(".")
    for k in parts[:-1]:
        node = node.setdefault(k, {})
    try:
        node[parts[-1]] = ast.literal_eval(value)
    except (ValueError, SyntaxError):
        node[parts[-1]] = value


def parse_options(argv=None) -> dict:
    p = build_parser()
    args, unknown = p.parse_known_args(argv)
    cfg: dict = {}
    if args.config:
        if yaml is None:
            raise RuntimeError("pyyaml unavailable; cannot read --config")
        with open(args.config) as f:
            cfg = yaml.safe_load(f) or {}
    ns = vars(args)
    # YAML provides defaults; explicit CLI flags win
    defaults = vars(p.parse_args([]))
    for k, v in ns.items():
        if k in ("config", "overrides"):
            continue
        if k in cfg and v == defaults.get(k):
            continue
        cfg[k] = v
    model = cfg.get("model", "restormer").lower()
    mcfg = copy.deepcopy(MODEL_DEFAULTS.get(model, {}))
    mcfg.update(cfg.get("model_kwargs", {}) or {})
    cfg["model_kwargs"] = mcfg
    for ov in args.overrides:
        k, _, v = ov.partition("=")
        _set_dotted(cfg, k, v)
    cfg["loss"] = parse_loss_terms(cfg.get("loss", ["l1=1.0"]))
    return cfg


def dump_effective_config(cfg: dict, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        if yaml is not None:
            yaml.safe_dump({k: v for k, v in cfg.items()}, f, sort_keys=True)
        else:
            f.write(repr(cfg))
