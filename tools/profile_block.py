"""Stage-level timing of one level-1 TransformerBlock at 512^2 x 96.

Times: front kernel (LN+qkv+dwconv), attn core (pass A+finalize+pass B),
GDFN kernel, and the pad/slice glue, each as a chained jit.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from image_restoration_tpu.kernels.attn_core_pallas import fused_mdta_core
from image_restoration_tpu.kernels.gdfn_pallas import fused_ln_gdfn
from image_restoration_tpu.kernels.mdta_pallas import fused_ln_qkv_dwconv_split

C, H, W = 96, 512, 512
NH = 1
HID = int(C * 2.66)
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 16)
bf = jnp.bfloat16

x = jax.random.normal(ks[0], (1, H, W, C), bf) * 0.1
lnw = jnp.ones((C,), jnp.float32)
lnb = jnp.zeros((C,), jnp.float32)
wq = jax.random.normal(ks[1], (C, 3 * C), jnp.float32) * 0.05
wd = jax.random.normal(ks[2], (3, 3, 1, 3 * C), jnp.float32) * 0.05
temp = jnp.ones((NH, 1, 1), jnp.float32)
wo = jax.random.normal(ks[3], (C, C), jnp.float32) * 0.05
w_in = jax.random.normal(ks[4], (C, 2 * HID), jnp.float32) * 0.05
w_dw = jax.random.normal(ks[5], (3, 3, 1, 2 * HID), jnp.float32) * 0.05
w_out = jax.random.normal(ks[6], (HID, C), jnp.float32) * 0.05

cps = 128
qkv = jax.random.normal(ks[7], (1, H, W, 3 * cps), bf) * 0.1


def bench(name, fn, *args, chain=64):
    @jax.jit
    def run(*a):
        def body(_, acc):
            out = fn(acc, *a[1:])
            return (acc * 0.5 + 0.5 * out.astype(acc.dtype)
                    if out.shape == acc.shape else
                    acc * 0.999 + jnp.mean(out).astype(acc.dtype))
        return jnp.sum(jax.lax.fori_loop(0, chain, body, a[0]))

    float(run(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, (time.perf_counter() - t0) / chain)
    print(f"{name:30s} {best*1e3:8.3f} ms")
    return best


t = 0.0
t += bench("front LN+qkv+dwconv", lambda xx: fused_ln_qkv_dwconv_split(
    xx, (lnw, lnb, wq, None, wd, None), "WithBias"), x)
t += bench("attn core (A+fin+B)", lambda qq: fused_mdta_core(
    qq, x, temp, wo, None, NH), qkv)
t += bench("gdfn tail", lambda xx: fused_ln_gdfn(
    xx, (lnw, lnb, w_in, None, w_dw, None, w_out, None), "WithBias"), x)
print(f"{'SUM':30s} {t*1e3:8.3f} ms   (whole block measured ~4.2 ms)")

# sanity: whole block with the same harness
import flax.linen as nn
from image_restoration_tpu.models.restormer import TransformerBlock

blk = TransformerBlock(dim=C, num_heads=NH, fused_gdfn=True, fused_attn=True,
                       dtype=bf)
pb = blk.init(jax.random.PRNGKey(1), x)
bench("whole block (fused)", lambda xx: blk.apply(pb, xx), x)
blk2 = TransformerBlock(dim=C, num_heads=NH, fused_gdfn=False, fused_attn=False,
                        dtype=bf)
pb2 = blk2.init(jax.random.PRNGKey(1), x)
bench("whole block (plain XLA)", lambda xx: blk2.apply(pb2, xx), x)
