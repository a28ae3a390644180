"""Robustness-evaluation CLI for the classification engine.

Equivalent of ``20251113_lsnet_xy/robust.py``'s argument surface: point any
of ``--inc_path`` (ImageNet-C tree), ``--ina_path`` / ``--inr_path``
(ImageNet-A/R, masked to their 200-class subsets), ``--insk_path``
(ImageNet-Sketch) at ImageFolder trees, optionally with ``--adv FGSM|PGD``.

    python -m image_restoration_tpu.cli.robust --model lsnet_t \
        --ckpt exp/lsnet/ckpt --inc_path /data/imagenet-c --input_size 224
"""

from __future__ import annotations

import argparse
import json
import os

import jax.numpy as jnp


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="lsnet")
    p.add_argument("--ckpt", default=None, help="orbax dir or torch .pth")
    p.add_argument("--inc_path", default=None)
    p.add_argument("--ina_path", default=None)
    p.add_argument("--inr_path", default=None)
    p.add_argument("--insk_path", default=None)
    p.add_argument("--train_classes", default=None,
                   help="dir whose sorted subdirs define the 1000-class "
                        "wnid order (defaults to the eval set's own classes)")
    p.add_argument("--adv", default=None, choices=["FGSM", "PGD"])
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--out_json", default=None)
    p.add_argument("--set", action="append", default=[],
                   help="dotted model kwarg overrides")
    return p


def _load_model_and_params(args):
    import jax

    from image_restoration_tpu.models import get_model
    from image_restoration_tpu.utils.options import MODEL_DEFAULTS, _set_dotted

    name = args.model
    cfg = {"model_kwargs": {k: tuple(v) if isinstance(v, list) else v
                            for k, v in MODEL_DEFAULTS.get(name, {}).items()}}
    for kv in args.set:
        key, _, value = kv.partition("=")
        _set_dotted(cfg, key, value)
    model = get_model(name, **cfg["model_kwargs"])

    x = jnp.zeros((1, args.input_size, args.input_size, 3), jnp.float32)
    # full variables (params + batch_stats etc. — LSNet carries BN stats)
    variables = model.init(jax.random.PRNGKey(0), x)
    if args.ckpt and os.path.isfile(args.ckpt):  # npz export
        from image_restoration_tpu.train.checkpoint import load_params_npz

        variables = dict(variables,
                         params=load_params_npz(args.ckpt, variables["params"]))
    elif args.ckpt:  # orbax run dir (torch .pth goes via utils.torch_import
        #            with a model-specific key_map, as in the parity tests)
        from image_restoration_tpu.train.checkpoint import CheckpointManager

        variables = CheckpointManager(args.ckpt).restore(variables)

    def apply_fn(v, imgs):
        return model.apply(v, imgs)

    return apply_fn, variables


def main(argv=None):
    from image_restoration_tpu.eval import robustness as R

    args = build_argparser().parse_args(argv)
    apply_fn, params = _load_model_and_params(args)
    results = {}

    if args.inc_path:
        results["imagenet_c"] = R.imagenet_c_eval(
            apply_fn, params, args.inc_path, args.batch_size, args.input_size)

    for key, path, subset in (("imagenet_a", args.ina_path, "a"),
                              ("imagenet_r", args.inr_path, "r"),
                              ("imagenet_sketch", args.insk_path, None)):
        if not path:
            continue
        mask = None
        if subset is not None:
            from image_restoration_tpu.eval.robust_subsets import (
                IMAGENET_A_WNIDS, IMAGENET_R_WNIDS)

            cls_dir = args.train_classes or path
            all_wnids = sorted(d for d in os.listdir(cls_dir)
                               if os.path.isdir(os.path.join(cls_dir, d)))
            wnids = IMAGENET_A_WNIDS if subset == "a" else IMAGENET_R_WNIDS
            mask = R.subset_logit_mask(all_wnids, wnids)
        stats = R.evaluate_folder(apply_fn, params, path, args.batch_size,
                                  args.input_size, mask=mask, adv=args.adv)
        print(f"Accuracy on the {key}: {stats['acc1']:.1f}%")
        results[key] = stats

    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(results, f, indent=1)
    return results


if __name__ == "__main__":
    main()
