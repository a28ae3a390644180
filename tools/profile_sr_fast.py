"""Lean fixed-chain profile of SRConvNet-L stages at 512^2 x64 bf16:
whole BasicBlock, FConvMod, MixFFN, FourierUnit. 2 compiles per stage
(shared glue baseline) — same protocol as tools/profile_hog_fast.py.

Run: python tools/profile_sr_fast.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from image_restoration_tpu.models.srconvnet import BasicBlock, FConvMod, MixFFN
from image_restoration_tpu.ops.fft import FourierUnit

N = 10
C, H, W = 64, 512, 512


def timed(prog, x, reps=5):
    t0 = time.time()
    v = float(prog(x))
    assert v == v
    sys.stderr.write(f"(compile {time.time()-t0:.0f}s)\n")
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(prog(x))
        best = min(best, time.perf_counter() - t0)
    return best


def chain(fn, n=N):
    def prog(z):
        acc = z
        for _ in range(n):
            acc = fn(jnp.clip(acc, -2.0, 2.0) * 0.999).astype(z.dtype)
        return jnp.sum(acc.astype(jnp.float32))

    return jax.jit(prog)


def main():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, C),
                          jnp.bfloat16) * 0.1
    kw = dict(dtype=jnp.bfloat16)

    def glue(z):
        acc = z
        for _ in range(N):
            acc = jnp.clip(acc, -2.0, 2.0) * 0.999
        return jnp.sum(acc.astype(jnp.float32))

    tg = timed(jax.jit(glue), x)
    print(f"glue {tg*1e3:.2f} ms", flush=True)
    stages = [
        ("BasicBlock", BasicBlock(C, 8, 4, **kw)),
        ("FConvMod", FConvMod(C, 8, **kw)),
        ("MixFFN", MixFFN(C, 4, **kw)),
        ("FourierUnit", FourierUnit(C, **kw)),
    ]
    for name, mod in stages:
        p = mod.init(jax.random.PRNGKey(0), x)
        t = timed(chain(lambda z, m=mod, pp=p: m.apply(pp, z)), x)
        print(f"  {name:14s} {(t - tg)/N*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
