"""Minimal-compile MXU/VPU overlap probe (VERDICT r4/r5 task 1).

Same three kernel structures as pipeline_mxu_vpu.py (serial / chunked /
pipelined) but timed with ONE chain length per mode plus ONE shared empty
baseline, i.e. 4 compiles total instead of 18. The empty baseline (chain of
clip*0.999 only) measures the chain glue; mode time = (t_mode - t_glue)/N.

Absolute per-application numbers carry the glue subtraction's noise, but
the DECISION (does pipelining beat serial, and by how much) only needs the
differences between modes, which share the glue term exactly.

Run: python tools/pipe_quick2.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pipeline_mxu_vpu import _kernel


def build(mode, chunks, n):
    h = 528
    wp = ((512 + 2 + 15) // 16) * 16
    x = jax.random.normal(jax.random.PRNGKey(0), (1, h, wp, 128),
                          jnp.bfloat16) * 0.1
    wm = jax.random.normal(jax.random.PRNGKey(1), (128, 384),
                           jnp.bfloat16) * 0.05
    dw = jax.random.normal(jax.random.PRNGKey(2), (9, 384),
                           jnp.float32) * 0.1
    kern = functools.partial(_kernel, th=66, width=512, mode=mode,
                             chunks=chunks)

    def f(xv):
        return pl.pallas_call(
            kern,
            grid=(1, h // 66),
            in_specs=[
                pl.BlockSpec((1, 66, wp, 128), lambda bi, hi: (bi, hi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 66, wp, 384),
                                   lambda bi, hi: (bi, hi, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, h, wp, 384), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(xv, wm, dw)

    def prog(z):
        acc = z
        for _ in range(n):
            acc = f(jnp.clip(acc, -2.0, 2.0) * 0.999)[:, :, :, :128].astype(
                z.dtype)
        return jnp.sum(acc.astype(jnp.float32))

    return jax.jit(prog), x


def timed(prog, x, reps=6):
    t0 = time.time()
    val = float(prog(x))
    assert val == val
    print(f"    (compile+warm {time.time()-t0:.0f}s)", flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(prog(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12

    def glue_prog(z):
        acc = z
        for _ in range(n):
            acc = jnp.clip(acc, -2.0, 2.0) * 0.999
        return jnp.sum(acc.astype(jnp.float32))

    x0 = jax.random.normal(jax.random.PRNGKey(0),
                           (1, 528, 528, 128), jnp.bfloat16)
    print(f"chain N={n}; glue baseline:", flush=True)
    tg = timed(jax.jit(glue_prog), x0)
    print(f"  glue total {tg*1e3:.2f} ms", flush=True)

    res = {}
    for mode, chunks in (("serial", 4), ("chunked", 4), ("pipelined", 4),
                         ("pipelined", 8)):
        t = timed(*build(mode, chunks, n))
        per = (t - tg) / n * 1e3
        res[f"{mode}{chunks}"] = per
        print(f"  {mode:10s} chunks={chunks}: total {t*1e3:8.2f} ms"
              f"  per-app {per:7.3f} ms", flush=True)
    base = res.get("serial4")
    for k, v in res.items():
        if k != "serial4":
            print(f"  delta {k:12s} {v - base:+7.3f} ms "
                  f"({100*(v-base)/base:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
