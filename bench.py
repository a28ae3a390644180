"""Headline benchmark: Restormer whole-image restoration throughput.

Megapixels/second/chip at 512x512 batch-1 (the NeRD-Rain test_speed.py /
BASELINE.json throughput analog) on the flagship Restormer-base config
(dim=48, blocks 4/6/6/8 — reference Restormer.py:193), bf16 activations.

Methodology: N forwards are *chained* inside one jit (each consumes the
previous output) and a scalar reduction is read back, so the measurement is
pure device time — host dispatch latency and the axon tunnel's lazy
block_until_ready cannot inflate the number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the PyTorch reference on an A100 sustains roughly 2.0 MP/s on this
model (141 GMACs @256^2 => ~4.5 TFLOP/img @512^2 at the ~30-40% MFU typical
for this thin-channel conv/attention mix). vs_baseline = value / 2.0.
"""

import json
import time

A100_MPS = 2.0


def main():
    import jax

    # Persistent XLA compile cache: the whole-model compile is ~4-6 min cold;
    # warming it here (and in CI/driver runs) makes repeat benches start in
    # seconds and keeps the measurement inside any outer timeout.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp

    from image_restoration_tpu.models.restormer import Restormer

    size, batch, chain = 512, 1, 48
    # fused_block: whole-block 2-pass canvas kernel (kernels/block_pallas.py)
    #   — q/k never touch HBM; one persistent canvas per level
    # scan_blocks: nn.scan per level — ~4x faster compile AND ~5% faster run
    model = Restormer(dtype=jnp.bfloat16, fused_block=True, scan_blocks=True)
    x = jnp.full((batch, size, size, 3), 0.5, jnp.float32)
    # Shapes-only init: weight VALUES don't affect timing, and eval_shape
    # skips the ~3 min on-device init compile.
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    @jax.jit
    def fwd_chain(v, inp):
        def body(_, acc):
            return model.apply(v, acc * 0.999)

        return jnp.sum(jax.lax.fori_loop(0, chain, body, inp))

    float(fwd_chain(params, x))  # compile + warmup, forced via readback

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fwd_chain(params, x))  # readback forces full execution
        best = min(best, (time.perf_counter() - t0) / chain)

    mps = batch * size * size / best / 1e6
    print(json.dumps({
        "metric": "restormer512_throughput",
        "value": round(mps, 3),
        "unit": "megapixels/s/chip",
        "vs_baseline": round(mps / A100_MPS, 3),
    }))


if __name__ == "__main__":
    main()
