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


def main(argv=None):
    from image_restoration_tpu.cli.train import build_model
    from image_restoration_tpu.eval.benchmarks import MODE_TO_BENCHMARKS, run_benchmark
    from image_restoration_tpu.utils.options import parse_options

    cfg = parse_options(argv)
    model = build_model(cfg)
    init_x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = load_params(cfg, model, init_x)

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
