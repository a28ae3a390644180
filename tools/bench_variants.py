"""Compare Restormer 512^2 throughput across fusion variants on the TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from image_restoration_tpu.models.restormer import Restormer


def run(tag, **flags):
    size, batch, chain = 512, 1, 16
    model = Restormer(dtype=jnp.bfloat16, **flags)
    x = jnp.full((batch, size, size, 3), 0.5, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def fwd_chain(v, inp):
        def body(_, acc):
            return model.apply(v, acc * 0.999)

        return jnp.sum(jax.lax.fori_loop(0, chain, body, inp))

    float(fwd_chain(params, x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fwd_chain(params, x))
        best = min(best, (time.perf_counter() - t0) / chain)
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
