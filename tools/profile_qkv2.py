"""dwconv-3x3-over-480ch implementations at 512^2: unrolled taps (current)
vs the native grouped-conv op vs taps on a channels-last-retiled view.
Run: python tools/profile_qkv2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from image_restoration_tpu.ops.common import _dwconv_taps, grouped_conv

N = 10
BF = jnp.bfloat16


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
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 512, 512, 480), BF) * 0.1
    dw = jax.random.normal(key, (3, 3, 1, 480), BF) * 0.1

    def glue(z):
        acc = z
        for _ in range(N):
            acc = jnp.clip(acc, -2.0, 2.0) * 0.999
        return jnp.sum(acc.astype(jnp.float32))

    tg = timed(jax.jit(glue), x)
    print(f"glue {tg*1e3:.2f} ms", flush=True)

    for name, fn in (
        ("taps_unrolled", lambda z: _dwconv_taps(z, dw, 1)),
        ("conv_op", lambda z: grouped_conv(z, dw, (1, 1), ((1, 1), (1, 1)),
                                           (1, 1), 480)),
    ):
        t = timed(chain(fn), x)
        print(f"  {name:14s} {(t - tg)/N*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
