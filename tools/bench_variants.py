"""Compare Restormer 512^2 throughput across fusion variants on the TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from image_restoration_tpu.models.restormer import Restormer


def run(tag, batch=1, size=512, chain=16, **flags):
    import bench

    model = Restormer(dtype=jnp.bfloat16, **flags)
    x = jax.random.uniform(jax.random.PRNGKey(7), (batch, size, size, 3),
                           jnp.float32, 0.2, 0.8)
    compiled, params, _ = bench._chain_program(model, x, chain)
    best = bench._bench_compiled(compiled, params, x, chain)
    mps = batch * size * size / best / 1e6
    print(f"{tag:28s} {best*1e3:7.2f} ms/img  {mps:6.3f} MP/s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "block"):
        run("fused_block+scan", fused_block=True, scan_blocks=True)
    if which in ("all", "old"):
        run("fused_attn+gdfn+scan", fused_attn=True, fused_gdfn=True,
            scan_blocks=True)
    if which in ("all", "plain"):
        run("plain XLA + scan", scan_blocks=True)
    if which == "unrolled":
        run("fused_block unrolled", fused_block=True)
    if which == "batch":
        # throughput metric is MP/s/chip: batch>1 amortizes per-level
        # canvas pad/unpad + resample round trips and fills the MXU better
        for b in (1, 2, 4):
            run(f"fused_block+scan b={b}", batch=b, chain=max(16 // b, 4),
                fused_block=True, scan_blocks=True)
