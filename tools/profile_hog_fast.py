"""Lean fixed-chain profile of the r5 HOGformer fast paths at the
bench-dominating shape (512^2, c=96, heads=1): whole block, sort-free
attention, polyphase FFN_DIFF, and the FFN's phase-mixing branch alone.

2 compiles per timing (chain N and the shared glue baseline) — the adaptive
harness costs 6+ compiles per stage, unusable at today's tunnel compile
latency.  Run: python tools/profile_hog_fast.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from image_restoration_tpu.models import hogformer as hf

N = 8
C, H, W = 96, 512, 512


def chain(fn, x, n=N):
    def prog(z):
        acc = z
        for _ in range(n):
            acc = fn(jnp.clip(acc, -2.0, 2.0) * 0.999).astype(z.dtype)
        return jnp.sum(acc.astype(jnp.float32))

    return jax.jit(prog)


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
    print(f"glue: {tg*1e3:.2f} ms total", flush=True)

    stages = [
        ("TransformerBlock", hf.TransformerBlock(C, 1, **kw)),
        ("Attention_DHOGSA", hf.Attention_DHOGSA(C, 1, **kw)),
        ("FFN_DIFF", hf.FFN_DIFF(C, **kw)),
    ]
    for name, mod in stages:
        p = mod.init(jax.random.PRNGKey(0), x)
        t = timed(chain(lambda z, m=mod, pp=p: m.apply(pp, z), x), x)
        print(f"  {name:20s} {(t - tg)/N*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
