"""Component-level chained-diff profile of DRSformer at full res
(512^2) — TransformerBlock / TKSA / MSFN at c=96, and the MEFC Subnet at
c=48 (encoder_level0) and c=96 (refinement), to locate the 292 GB/img."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from chain_bench import marginal_adaptive
from image_restoration_tpu.models import drsformer as dr


def time_mod(name, mod, x):
    p = mod.init(jax.random.PRNGKey(0), x)
    fn = lambda z: mod.apply(p, z).astype(z.dtype)
    ms = marginal_adaptive(fn, x, target_s=0.2, max_apps=24, reps=3) * 1e3
    print(f"  {name:28s} {ms:8.2f} ms")
    return ms


def main():
    kw = dict(dtype=jnp.bfloat16)
    for c, heads in ((96, 1), (48, 1)):
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 512, 512, c),
                              jnp.bfloat16) * 0.1
        print(f"shape 1x512x512x{c} heads={heads} (bf16)")
        time_mod("TransformerBlock", dr.TransformerBlock(c, heads, **kw), x)
        time_mod("TKSA", dr.TKSA(c, heads, **kw), x)
        time_mod("MSFN", dr.MSFN(c, **kw), x)
        time_mod("Subnet (MEFC)", dr.Subnet(c, **kw), x)


if __name__ == "__main__":
    main()
