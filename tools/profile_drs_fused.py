"""Marginal per-block cost of fused_drs_block at DRSformer's level shapes
(512^2 bench geometry), chained-differencing through the axon tunnel.

Also ablates: pass-1 only (front), and the model's OTHER cost centers at
512^2 — the two MEFC Subnets — so the 0.616 MP/s budget closes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from chain_bench import marginal
from image_restoration_tpu.kernels import drs_block_pallas as dbp


def make_params(key, c, heads, expansion=2.66, bias=False, ln="WithBias"):
    hid = int(c * expansion)
    ks = jax.random.split(key, 12)
    n = lambda i, *s: jax.random.normal(ks[i], s, jnp.float32) * 0.05
    return (
        jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
        n(0, 1, 1, c, 3 * c), None, n(1, 3, 3, 1, 3 * c), None,
        jnp.ones((heads, 1, 1), jnp.float32),
        tuple(jnp.full((1,), 0.2, jnp.float32) for _ in range(4)),
        n(2, 1, 1, c, c), None,
        jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
        n(3, 1, 1, c, 2 * hid), None,
        n(4, 3, 3, 1, 2 * hid), None, n(5, 5, 5, 1, 2 * hid), None,
        n(6, 3, 3, 2, hid), None, n(7, 5, 5, 2, hid), None,
        n(8, 1, 1, 2 * hid, c), None,
    )


def block_cost(c, h, w, heads):
    params = make_params(jax.random.PRNGKey(0), c, heads)
    cfg = (c, w, heads, "WithBias", 1e-5)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, c),
                          jnp.bfloat16) * 0.1
    xc = dbp.canvas_pad(x, border=dbp.BORDER)

    def f(z):
        return dbp.fused_drs_block(z, params, cfg)

    ms = marginal(f, xc, n1=2, n2=10, reps=3) * 1e3
    print(f"  fused_drs_block {h}x{w} c={c:4d} heads={heads}: {ms:8.3f} ms",
          flush=True)
    return ms


def mefc_cost(c, h, w):
    from image_restoration_tpu.models.drsformer import Subnet

    mod = Subnet(c, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, c),
                          jnp.bfloat16) * 0.1
    p = mod.init(jax.random.PRNGKey(0), x)
    f = lambda z: mod.apply(p, z).astype(z.dtype)
    ms = marginal(f, x, n1=2, n2=8, reps=3) * 1e3
    print(f"  MEFC Subnet     {h}x{w} c={c:4d}:         {ms:8.3f} ms",
          flush=True)
    return ms


if __name__ == "__main__":
    total = 0.0
    total += 4 * block_cost(48, 512, 512, 1)    # encoder_level1
    total += 4 * block_cost(96, 512, 512, 1)    # decoder_level1
    total += 12 * block_cost(96, 256, 256, 2)   # level 2 enc+dec
    total += 12 * block_cost(192, 128, 128, 4)  # level 3 enc+dec
    total += 8 * block_cost(384, 64, 64, 8)     # latent
    total += mefc_cost(48, 512, 512)            # encoder_level0
    total += mefc_cost(96, 512, 512)            # refinement
    print(f"  sum (blocks + MEFC)              : {total:8.1f} ms "
          f"(bench: 425 ms => rest = resamplers/head/tail)")
