"""Decisive experiment for the r4 headline task: can a Mosaic kernel overlap
MXU matmuls with VPU depthwise-tap FMAs by software-pipelining row-chunks?

The fused block's pass-1 body is LN -> (y @ W) on the MXU -> 9-tap depthwise
loop on the VPU, with the tap loop data-dependent on the matmul. Serializing
the two units costs ~1.4 ms VPU + ~0.45 ms MXU per c=96 block. If the body is
chunked into R row-groups and the chunk-r matmul is issued while the
chunk-(r-1) tap loop runs, an in-order-issue TPU core can hide MXU latency
under VPU work (and vice versa) IF Mosaic's scheduler interleaves the
independent chains.

Three kernels over identical data (grid over DISJOINT row tiles, standard
block indexing; taps are computed for the tile interior only — no cross-tile
halo, which is irrelevant for a scheduling experiment):

  serial:      matmul(all rows) then taps(all rows)   (the current structure)
  chunked:     for r: matmul(r); taps(r)              (serial per chunk)
  pipelined:   matmul(0); for r: matmul(r+1); taps(r) (1-deep software pipe)

Identical FLOPs/bytes; any wall-clock difference is scheduling.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chain_bench import marginal_adaptive


def _taps(proj, dw, rows, width):
    """proj: (rows+2, wp, op) -> (rows, width, op) 9-tap depthwise."""
    shifted = [proj[:, kw : kw + width, :] for kw in range(3)]
    acc = jnp.zeros((rows, width, proj.shape[-1]), jnp.float32)
    for kh in range(3):
        for kw in range(3):
            acc = acc + shifted[kw][kh : kh + rows] * dw[kh * 3 + kw]
    return acc


def _kernel(x_ref, w_ref, dw_ref, o_ref, *, th, width, mode, chunks):
    # x block: (1, th, wp, c); o block: (1, th, wp, op) — disjoint tiles.
    wp = x_ref.shape[2]
    cp = x_ref.shape[-1]
    op = w_ref.shape[-1]
    x = x_ref[0]
    o_ref[0] = jnp.zeros((th, wp, op), o_ref.dtype)

    if mode == "serial":
        y = x.reshape(th * wp, cp)
        proj = jnp.dot(y, w_ref[:], preferred_element_type=jnp.float32)
        proj = proj.reshape(th, wp, op)
        acc = _taps(proj, dw_ref, th - 2, width)
        o_ref[0, 1 : th - 1, 1 : 1 + width, :] = acc.astype(o_ref.dtype)
        return

    # chunk over interior rows; each chunk's matmul covers rt+2 source rows
    rt = (th - 2) // chunks

    def mat(r):
        rows = x[r * rt : r * rt + rt + 2]
        y = rows.reshape((rt + 2) * wp, cp)
        p = jnp.dot(y, w_ref[:], preferred_element_type=jnp.float32)
        return p.reshape(rt + 2, wp, op)

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


def run(mode, h=512, w=512, c=128, op=384, th=66, chunks=4):
    wp = ((w + 2 + 15) // 16) * 16
    x = jax.random.normal(jax.random.PRNGKey(0), (1, h, wp, c),
                          jnp.bfloat16) * 0.1
    wm = jax.random.normal(jax.random.PRNGKey(1), (c, op), jnp.bfloat16) * 0.05
    dw = jax.random.normal(jax.random.PRNGKey(2), (9, op), jnp.float32) * 0.1

    assert h % th == 0, (h, th)
    n = h // th
    kern = functools.partial(_kernel, th=th, width=w, mode=mode,
                             chunks=chunks)

    def f(xv):
        return pl.pallas_call(
            kern,
            grid=(1, n),
            in_specs=[
                pl.BlockSpec((1, th, wp, c), lambda bi, hi: (bi, hi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, th, wp, op),
                                   lambda bi, hi: (bi, hi, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, h, wp, op), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(xv, wm, dw)

    ms = marginal_adaptive(lambda z: f(z)[:, :, :, : c].astype(z.dtype),
                           x, target_s=0.3, max_apps=48, reps=3) * 1e3
    print(f"  {mode:10s} th={th} chunks={chunks}: {ms:7.3f} ms", flush=True)
    return ms


if __name__ == "__main__":
    # h=528 = 8 tiles of 66 rows; 4 chunks of 16 interior rows each
    print("528x512, c=128 lanes -> op=384 lanes, matmul+9-tap (bf16/fp32)")
    for mode in ("serial", "chunked", "pipelined"):
        run(mode, h=528)
    print("chunk-count sweep")
    for chunks in (2, 8):
        run("pipelined", h=528, chunks=chunks)
    for chunks in (2, 8):
        run("chunked", h=528, chunks=chunks)


def quick():
    """Fixed-chain variant: 2 compiles per mode (remote compile budget)."""
    from chain_bench import marginal
    for mode, chunks in (("pipelined", 4), ("chunked", 4), ("serial", 4)):
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
                    pl.BlockSpec((1, 66, wp, 128),
                                 lambda bi, hi: (bi, hi, 0, 0),
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

        ms = marginal(lambda z: f(z)[:, :, :, :128].astype(z.dtype), x,
                      n1=4, n2=24, reps=4) * 1e3
        print(f"  {mode:10s} chunks={chunks}: {ms:7.3f} ms", flush=True)
