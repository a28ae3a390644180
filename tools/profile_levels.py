"""Per-level timing breakdown of the Restormer-base 512^2 forward.

Times each stage (block stack at its level resolution/dim, resamplers) as a
chained jit, the same methodology as bench.py, so we can see where the
69 ms/image actually goes. Run on the real TPU: `python tools/profile_levels.py`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from image_restoration_tpu.models.restormer import TransformerBlock
from image_restoration_tpu.ops.resample import Downsample, Upsample


def time_stage(name, mod, shape, chain=8, dtype=jnp.bfloat16):
    x = jnp.full(shape, 0.5, dtype)
    params = mod.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def run(v, inp):
        def body(_, acc):
            out = mod.apply(v, acc)
            if out.shape != inp.shape:  # resamplers change shape; re-seed
                out = jnp.full_like(inp, jnp.mean(out).astype(inp.dtype))
            return out
        return jnp.sum(jax.lax.fori_loop(0, chain, body, x))

    float(run(params, x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, x))
        best = min(best, (time.perf_counter() - t0) / chain)
    print(f"{name:34s} {best*1e3:8.3f} ms/iter")
    return best


import flax.linen as nn


class BlockStack(nn.Module):
    dim: int
    heads: int
    n: int
    fused: bool = True

    @nn.compact
    def __call__(self, x):
        for i in range(self.n):
            x = TransformerBlock(dim=self.dim, num_heads=self.heads,
                                 fused_gdfn=self.fused, fused_attn=self.fused,
                                 dtype=jnp.bfloat16, name=f"b{i}")(x)
        return x


def main():
    d = 48
    total = 0.0
    # encoder path
    total += time_stage("enc1  512^2 x48  (4 blk)", BlockStack(d, 1, 4), (1, 512, 512, d))
    total += time_stage("down1_2", Downsample(d, dtype=jnp.bfloat16), (1, 512, 512, d))
    total += time_stage("enc2  256^2 x96  (6 blk)", BlockStack(d*2, 2, 6), (1, 256, 256, d*2))
    total += time_stage("down2_3", Downsample(d*2, dtype=jnp.bfloat16), (1, 256, 256, d*2))
    total += time_stage("enc3  128^2 x192 (6 blk)", BlockStack(d*4, 4, 6), (1, 128, 128, d*4))
    total += time_stage("down3_4", Downsample(d*4, dtype=jnp.bfloat16), (1, 128, 128, d*4))
    total += time_stage("latent 64^2 x384 (8 blk)", BlockStack(d*8, 8, 8), (1, 64, 64, d*8))
    total += time_stage("up4_3", Upsample(d*8, dtype=jnp.bfloat16), (1, 64, 64, d*8))
    total += time_stage("dec3  128^2 x192 (6 blk)", BlockStack(d*4, 4, 6), (1, 128, 128, d*4))
    total += time_stage("up3_2", Upsample(d*4, dtype=jnp.bfloat16), (1, 128, 128, d*4))
    total += time_stage("dec2  256^2 x96  (6 blk)", BlockStack(d*2, 2, 6), (1, 256, 256, d*2))
    total += time_stage("up2_1", Upsample(d*2, dtype=jnp.bfloat16), (1, 256, 256, d*2))
    total += time_stage("dec1+ref 512^2 x96 (8 blk)", BlockStack(d*2, 1, 8), (1, 512, 512, d*2))
    print(f"{'SUM':34s} {total*1e3:8.3f} ms  (bench ~69 ms)")


if __name__ == "__main__":
    main()
