"""Benchmark eval entry point — the `src/test.py` surface
(MoCE-IR-main/src/test.py:166-209 call stack; AdaIR test.py --mode switch).

Usage:
  python -m image_restoration_tpu.cli.test --model restormer \
      --ckpt exp/ckpt --benchmarks derain dehaze --data_file_dir data/
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp


def load_params(cfg, model, init_x):
    """Load orbax dir / flat .npz / torch .pth|.ckpt into flax params."""
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, init_x)["params"]
    path = cfg.get("ckpt")
    if not path:
        print("WARNING: no --ckpt given; using random init")
        return params
    if path.endswith(".npz"):
        from image_restoration_tpu.train.checkpoint import load_params_npz

        return load_params_npz(path, params)
    if path.endswith((".pth", ".pt", ".ckpt", ".state")):
        from image_restoration_tpu.utils.torch_import import (
            import_state_dict, load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(path, prefer_ema=cfg.get("prefer_ema", False))
        return import_state_dict(params, sd)
    # orbax checkpoint dir
    from image_restoration_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(path)
    restored, step = mgr.restore_raw()
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {path}")
    print(f"loaded step {step} from {path}")
    if cfg.get("prefer_ema") and restored.get("ema_params") is not None:
        loaded = restored["ema_params"]
    else:
        loaded = restored["params"]
    import jax.tree as jt

    assert jt.structure(loaded) == jt.structure(params), "checkpoint/model mismatch"
    return loaded  # host numpy; first jit call ships it in one transfer


def run_unpaired(cfg, model, params):
    """No-ground-truth evaluation: restore every image under --lq_dir and
    report mean NIQE of outputs (and of the degraded inputs, for the delta)
    — DarkIR-main/testing_unpaired.py's protocol with the repo's NIQE
    (MUSIQ/NRQM need pretrained torch weights this image does not ship)."""
    import numpy as np

    from image_restoration_tpu.cli.infer import (
        list_images, load_image, make_restore_fn, save_image,
    )
    from image_restoration_tpu.eval.niqe import calculate_niqe

    src = cfg.get("lq_dir") or cfg.get("input")
    if not src:
        raise SystemExit("--unpaired needs --lq_dir (folder of inputs)")
    restore = make_restore_fn(cfg, model, params)
    out_dir = cfg.get("output_dir", "results")
    os.makedirs(out_dir, exist_ok=True)
    niqe_in, niqe_out = [], []
    for p in list_images(src):
        img = load_image(p)
        res = restore(img)
        niqe_in.append(calculate_niqe(img, params_path=cfg.get("niqe_params")))
        niqe_out.append(calculate_niqe(res, params_path=cfg.get("niqe_params")))
        if cfg.get("save_images"):
            save_image(os.path.join(cfg["save_images"], os.path.basename(p)),
                       res)
    results = {"unpaired": {"n": len(niqe_out),
                            "niqe": float(np.mean(niqe_out)),
                            "niqe_input": float(np.mean(niqe_in))}}
    print(f"unpaired: NIQE {results['unpaired']['niqe']:.4f} "
          f"(input {results['unpaired']['niqe_input']:.4f}) | "
          f"{len(niqe_out)} images")
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    return results


def main(argv=None):
    from image_restoration_tpu.cli.train import build_model
    from image_restoration_tpu.eval.benchmarks import MODE_TO_BENCHMARKS, run_benchmark
    from image_restoration_tpu.utils.options import parse_options

    cfg = parse_options(argv)
    model = build_model(cfg)
    init_x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = load_params(cfg, model, init_x)

    if cfg.get("unpaired"):
        return run_unpaired(cfg, model, params)

    @jax.jit
    def fn(x):
        # fp32 eval needs the 6-pass matmul algorithm on TPU: the default
        # single-pass-bf16 drifts ~1e-1 through deep U-Nets (v5e measured),
        # which would destroy checkpoint PSNR parity.
        with jax.default_matmul_precision("highest"):
            out = model.apply({"params": params}, x)
        if isinstance(out, tuple):
            out = out[0]
        return out

    benches = cfg["benchmarks"]
    if cfg.get("mode") is not None:
        benches = MODE_TO_BENCHMARKS[cfg["mode"]]

    # LPIPS column (MoCE-IR-main/src/test.py:88,105,123) — needs trained
    # weights (torchvision vgg16 + lpips linear heads in one .pth)
    lpips_fn = None
    if cfg.get("lpips_ckpt"):
        from image_restoration_tpu.eval.perceptual import LPIPS, lpips_key_map
        from image_restoration_tpu.utils.torch_import import (
            import_state_dict, load_torch_checkpoint,
        )

        lp = LPIPS()
        lp_params = lp.init(jax.random.PRNGKey(0), init_x, init_x)["params"]
        sd = load_torch_checkpoint(cfg["lpips_ckpt"])
        lp_params = import_state_dict(lp_params, sd, key_map=lpips_key_map)
        lpips_fn = jax.jit(lambda a, b: lp.apply({"params": lp_params}, a, b))

    extra_kw = {}
    if cfg.get("pad_multiple", 8) != 8:  # explicit override beats protocol
        extra_kw["pad_multiple"] = cfg["pad_multiple"]
    if cfg.get("tile"):
        extra_kw["tile"] = cfg["tile"]
    if cfg.get("save_images"):
        extra_kw["save_dir"] = cfg["save_images"]
    if lpips_fn is not None:
        extra_kw["lpips_fn"] = lpips_fn

    results = {}
    for b in benches:
        r = run_benchmark(b, fn, cfg["data_file_dir"], **extra_kw)
        results[b] = {"psnr": r.psnr, "ssim": r.ssim, "n": r.n, **r.extra}
        cols = f"{b}: PSNR {r.psnr:.4f} dB | SSIM {r.ssim:.4f}"
        if "lpips" in r.extra:
            cols += f" | LPIPS {r.extra['lpips']:.4f}"
        print(cols + f" | {r.n} images")

    out_dir = cfg.get("output_dir", "results")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
