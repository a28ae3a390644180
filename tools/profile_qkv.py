"""Locate the 8.4 ms inside HOGformer's 5-way qkv (512^2 c=96 -> 480):
1x1 conv alone, dwconv-480 alone, and dwconv at 512 zero-padded lanes
(480 = 3.75 x 128 is not lane-aligned). Run: python tools/profile_qkv.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from image_restoration_tpu.ops.common import conv2d

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
    x96 = jax.random.normal(key, (1, 512, 512, 96), BF) * 0.1
    w1 = jax.random.normal(key, (96, 480), BF) * 0.05
    w1p = jnp.pad(w1, ((0, 0), (0, 32)))
    dw480 = jax.random.normal(key, (3, 3, 1, 480), BF) * 0.1
    dw512 = jnp.pad(dw480, ((0, 0),) * 3 + ((0, 32),))

    def glue(z):
        acc = z
        for _ in range(N):
            acc = jnp.clip(acc, -2.0, 2.0) * 0.999
        return jnp.sum(acc.astype(jnp.float32))

    tg = timed(jax.jit(glue), x96)
    print(f"glue {tg*1e3:.2f} ms", flush=True)

    def full480(z):
        q = jnp.einsum("bhwc,cd->bhwd", z, w1)
        q = conv2d(q, dw480, padding=1, groups=480)
        return q[..., :96]

    def full512(z):
        q = jnp.einsum("bhwc,cd->bhwd", z, w1p)
        q = conv2d(q, dw512, padding=1, groups=512)
        return q[..., :96]

    def just1x1(z):
        q = jnp.einsum("bhwc,cd->bhwd", z, w1)
        return q[..., :96] + q[..., 96:192]

    for name, fn in (("1x1_96to480", just1x1), ("full_480", full480),
                     ("full_512pad", full512)):
        t = timed(chain(fn), x96)
        print(f"  {name:14s} {(t - tg)/N*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
