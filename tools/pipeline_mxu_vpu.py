"""Decisive experiment for the r4 headline task: can a Mosaic kernel overlap
MXU matmuls with VPU depthwise-tap FMAs by software-pipelining row-chunks?

The fused block's pass-1 body is LN -> (y @ W) on the MXU -> 9-tap depthwise
loop on the VPU, with the tap loop data-dependent on the matmul. Serializing
the two units costs ~1.4 ms VPU + ~0.45 ms MXU per c=96 block. If the body is
chunked into R row-groups and the chunk-r matmul is issued while the
chunk-(r-1) tap loop runs, an in-order-issue TPU core can hide MXU latency
under VPU work (and vice versa) IF Mosaic's scheduler interleaves the
independent chains.

Three kernels over identical data (grid over row tiles, one (th, wp, c) bf16
tile -> matmul to op lanes -> 9-tap FMA -> store):

  serial:      matmul(all rows) then taps(all rows)   (the current structure)
  chunked:     for r: matmul(r); taps(r)              (serial per chunk)
  pipelined:   matmul(0); for r: matmul(r+1); taps(r) (1-deep software pipe)

Identical FLOPs/bytes; any wall-clock difference is scheduling.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chain_bench import marginal_adaptive


def _taps(proj, dw, th, width):
    shifted = [proj[:, kw : kw + width, :] for kw in range(3)]
    acc = jnp.zeros((th, width, proj.shape[-1]), jnp.float32)
    for kh in range(3):
        for kw in range(3):
            acc = acc + shifted[kw][kh : kh + th] * dw[kh * 3 + kw]
    return acc


def _kernel(x_ref, w_ref, dw_ref, o_ref, *, th, width, mode, chunks):
    wp = x_ref.shape[2]
    cp = x_ref.shape[-1]
    op = w_ref.shape[-1]
    x = x_ref[0]

    if mode == "serial":
        y = x.reshape(th * wp, cp)
        proj = jnp.dot(y, w_ref[:], preferred_element_type=jnp.float32)
        proj = proj.reshape(th, wp, op)
        acc = _taps(proj, dw_ref, th - 2, width)
        o_ref[0] = jnp.zeros((th, wp, op), o_ref.dtype)
        o_ref[0, 1 : th - 1, 1 : 1 + width, :] = acc.astype(o_ref.dtype)
        return

    # chunk over rows; each chunk needs a 1-row halo each side for the taps
    rt = (th - 2) // chunks
    projs = []

    def mat(r):
        rows = x[r * rt : r * rt + rt + 2]
        y = rows.reshape((rt + 2) * wp, cp)
        p = jnp.dot(y, w_ref[:], preferred_element_type=jnp.float32)
        return p.reshape(rt + 2, wp, op)

    o_ref[0] = jnp.zeros((th, wp, op), o_ref.dtype)
    if mode == "chunked":
        for r in range(chunks):
            p = mat(r)
            acc = _taps(p, dw_ref, rt, width)
            o_ref[0, 1 + r * rt : 1 + (r + 1) * rt, 1 : 1 + width, :] = (
                acc.astype(o_ref.dtype))
    else:  # pipelined: issue matmul r+1 before consuming taps of r
        p_prev = mat(0)
        for r in range(chunks):
            p_next = mat(r + 1) if r + 1 < chunks else None
            acc = _taps(p_prev, dw_ref, rt, width)
            o_ref[0, 1 + r * rt : 1 + (r + 1) * rt, 1 : 1 + width, :] = (
                acc.astype(o_ref.dtype))
            p_prev = p_next


def run(mode, h=512, w=512, c=128, op=384, th=64, chunks=4):
    wp = w + 16 - ((w + 2) % 16 or 16) + 2 if (w + 2) % 16 else w + 2
    wp = ((w + 2 + 15) // 16) * 16
    x = jax.random.normal(jax.random.PRNGKey(0), (1, h, wp, c),
                          jnp.bfloat16) * 0.1
    wm = jax.random.normal(jax.random.PRNGKey(1), (c, op), jnp.bfloat16) * 0.05
    dw = jax.random.normal(jax.random.PRNGKey(2), (9, op), jnp.float32) * 0.1

    n = h // th
    kern = functools.partial(_kernel, th=th + 2, width=w, mode=mode,
                             chunks=chunks)

    def f(xv):
        return pl.pallas_call(
            kern,
            grid=(1, n),
            in_specs=[
                pl.BlockSpec((1, th + 2, wp, c),
                             lambda bi, hi: (bi, hi * th, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, th + 2, wp, op),
                                   lambda bi, hi: (bi, hi * th, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, h + 2, wp, op), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(xv, wm, dw)

    # NOTE: blocks at hi*th overlap 2 rows; output regions are disjoint per
    # grid step except halo rows — fine for a timing microbenchmark.
    ms = marginal_adaptive(lambda z: f(z)[:, : h, :, : c].astype(z.dtype),
                           x, target_s=0.3, max_apps=48, reps=3) * 1e3
    print(f"  {mode:10s} th={th} chunks={chunks}: {ms:7.3f} ms", flush=True)
    return ms


if __name__ == "__main__":
    print("512x512, c=128 lanes -> op=384 lanes, matmul+9-tap (bf16/fp32)")
    for mode in ("serial", "chunked", "pipelined"):
        run(mode)
    print("chunk-count sweep (pipelined)")
    for chunks in (2, 8):
        run("pipelined", chunks=chunks)
    for chunks in (2, 8):
        run("chunked", chunks=chunks)
