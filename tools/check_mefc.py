"""On-TPU numeric check: fused MEFC step kernel (kernels/mefc_pallas) vs
the plain Subnet composition, plus a marginal-cost measurement at the two
bench shapes (512^2 c=48 encoder_level0, 512^2 c=96 refinement)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from image_restoration_tpu.models.drsformer import Subnet


def check(c, h, w, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(1, h, w, c)).astype("float32") * 0.2
                    ).astype(jnp.bfloat16)
    plain = Subnet(c, dtype=jnp.bfloat16)
    fused = Subnet(c, fused=True, dtype=jnp.bfloat16)
    params = plain.init(jax.random.PRNGKey(1), x)
    yr = np.asarray(jax.jit(lambda z: plain.apply(params, z))(x),
                    dtype=np.float32)
    yf = np.asarray(jax.jit(lambda z: fused.apply(params, z))(x),
                    dtype=np.float32)
    scale = np.abs(yr).max() + 1e-6
    rel = np.abs(yf - yr).max() / scale
    print(f"c={c} h={h} w={w}  maxrel={rel:.3e} "
          f"{'OK' if rel < 2e-2 else 'FAIL'}", flush=True)
    return rel < 2e-2


def cost(c, h, w):
    from chain_bench import marginal

    x = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, c),
                          jnp.bfloat16) * 0.1
    for name, mod in (("plain", Subnet(c, dtype=jnp.bfloat16)),
                      ("fused", Subnet(c, fused=True, dtype=jnp.bfloat16))):
        p = mod.init(jax.random.PRNGKey(0), x)
        f = lambda z: mod.apply(p, z).astype(z.dtype)
        ms = marginal(f, x, n1=2, n2=8, reps=3) * 1e3
        print(f"  Subnet {name} {h}x{w} c={c}: {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    ok = True
    ok &= check(48, 64, 48)
    ok &= check(96, 64, 48)
    ok &= check(96, 136, 120)   # mid-size, th > 4
    print("ALL OK" if ok else "FAILURES PRESENT")
    if "--cost" in sys.argv:
        cost(48, 512, 512)
        cost(96, 512, 512)
    sys.exit(0 if ok else 1)
