"""Does Mosaic overlap independent MXU matmuls with VPU tap FMAs inside one
grid step? — the decisive measurement for the software-pipelined fused block
(VERDICT r4 task 1).

Four variants of a pass-1-shaped kernel (LN + 128->384 matmul + masked
9-tap dwconv loop + tile store), all with IDENTICAL HBM traffic:

  base          : the current sequential body
  mm_x2         : + a second independent matmul of the same tile (result
                  folded in at 1e-30 so it can't be DCE'd). Marginal cost
                  == pure MXU time if the scheduler cannot overlap; ~0 if
                  the extra matmul hides under the tap FMAs.
  taps_x2       : + a second independent tap loop (marginal cost == pure
                  VPU tap time under the same logic).
  chunk2_seq /  : the tile split into 2 row chunks; matmuls and taps
  chunk2_il       ordered (mm0,taps0,mm1,taps1) vs (mm0,mm1,taps0,taps1).
                  If the interleaved order is faster, manual software
                  pipelining inside the kernel body pays.

Run on the real chip: python tools/pipeline_probe.py
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


def bench(name, fn, *args):
    # chained-differencing: the axon tunnel does not synchronize
    # block_until_ready, so the only trustworthy number chains N
    # applications inside ONE jit and differences two chain lengths.
    from chain_bench import marginal

    best = marginal(fn, args[0], n1=4, n2=20,
                    reps=3) if len(args) == 1 else None
    print(f"  {name:24s} {best*1e3:8.3f} ms")
    return best


def make_kernel(variant: str, *, th: int, width: int, c_real: int,
                eps: float = 1e-5, h_total: int = 512):
    def kern(xcur_ref, w_ref, w2_ref, dw_ref, dw2_ref, lnw_ref, o_ref):
        wp = xcur_ref.shape[2]
        cp = xcur_ref.shape[-1]
        op = w_ref.shape[-1]
        hi = pl.program_id(1)

        xf = xcur_ref[0].astype(jnp.float32)
        s1 = jnp.sum(xf, axis=-1, keepdims=True)
        s2 = jnp.sum(xf * xf, axis=-1, keepdims=True)
        mu = s1 / c_real
        var = s2 / c_real - mu * mu
        inv = jax.lax.rsqrt(var + eps)
        y = xf * inv * lnw_ref[:]

        rows = jax.lax.broadcasted_iota(jnp.int32, (th, wp), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (th, wp), 1)
        grow = rows + hi * th
        valid = (grow >= 0) & (grow < h_total) & (cols >= 1) & (cols <= width)
        mask = valid.astype(jnp.float32)[:, :, None]

        def matmul(w):
            y2 = y.reshape(th * wp, cp).astype(jnp.bfloat16)
            p = jnp.dot(y2, w, preferred_element_type=jnp.float32)
            return p.reshape(th, wp, op) * mask

        def taps(proj, dwr, tout):
            shifted = [proj[:, kw: kw + width - 2, :] for kw in range(3)]
            acc = jnp.zeros((th - 2, width - 2, op), jnp.float32)
            for kh in range(3):
                for kw in range(3):
                    acc = acc + shifted[kw][kh: kh + th - 2] * dwr[kh * 3 + kw]
            return acc

        if variant == "base":
            proj = matmul(w_ref[:])
            acc = taps(proj, dw_ref, None)
        elif variant == "mm_x2":
            proj = matmul(w_ref[:])
            proj2 = matmul(w2_ref[:])
            acc = taps(proj, dw_ref, None) + proj2[1: th - 1, 1: width - 1] * 1e-30
        elif variant == "taps_x2":
            proj = matmul(w_ref[:])
            acc = taps(proj, dw_ref, None) + taps(proj, dw2_ref, None) * 1e-30
        elif variant in ("chunk2_seq", "chunk2_il"):
            h2 = th // 2
            y2f = y.reshape(th * wp, cp).astype(jnp.bfloat16)
            ya = y2f[: h2 * wp]
            yb = y2f[h2 * wp:]
            ma = mask[:h2]
            mb = mask[h2:]

            def mm(part, m):
                p = jnp.dot(part, w_ref[:], preferred_element_type=jnp.float32)
                return p.reshape(h2, wp, op) * m

            def tp(proj, dwr):
                shifted = [proj[:, kw: kw + width - 2, :] for kw in range(3)]
                acc = jnp.zeros((h2 - 2, width - 2, op), jnp.float32)
                for kh in range(3):
                    for kw in range(3):
                        acc = acc + shifted[kw][kh: kh + h2 - 2] * dwr[kh * 3 + kw]
                return acc

            if variant == "chunk2_seq":
                pa = mm(ya, ma)
                aa = tp(pa, dw_ref)
                pb = mm(yb, mb)
                ab = tp(pb, dw_ref)
            else:
                pa = mm(ya, ma)
                pb = mm(yb, mb)
                aa = tp(pa, dw_ref)
                ab = tp(pb, dw_ref)
            acc = jnp.concatenate([aa, ab], axis=0)
        else:
            raise ValueError(variant)

        o_ref[0] = jnp.zeros((th, wp, 128), o_ref.dtype)
        o_ref[0, 1: acc.shape[0] + 1, 1: acc.shape[1] + 1, :] = (
            acc[:, :, :128].astype(o_ref.dtype))

    return kern


def run_variant(variant, x, w, w2, dw, dw2, lnw, *, th, width, h):
    b = x.shape[0]
    wp, cp = x.shape[2], x.shape[3]
    op = w.shape[-1]
    kern = make_kernel(variant, th=th, width=width, c_real=96, h_total=h)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(b, h // th),
        in_specs=[pl.BlockSpec((1, th, wp, cp), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM)] + [vspec] * 5,
        out_specs=pl.BlockSpec((1, th, wp, 128), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wp, 128), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, w, w2, dw, dw2, lnw)


def main():
    h = w = 512
    cp, op = 128, 384
    wp = 528
    th = 16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, h, wp, cp), jnp.bfloat16) * 0.1
    wm = jax.random.normal(key, (cp, op), jnp.bfloat16) * 0.05
    w2 = jax.random.normal(key, (cp, op), jnp.bfloat16) * 0.05
    dw = jax.random.normal(key, (9, op), jnp.float32) * 0.1
    dw2 = jax.random.normal(key, (9, op), jnp.float32) * 0.1
    lnw = jnp.ones((cp,), jnp.float32)

    print(f"pass1-shaped probe: 512^2, cp={cp}, op={op}, th={th}")
    ts = {}
    for v in ("base", "mm_x2", "taps_x2", "chunk2_seq", "chunk2_il"):
        try:
            ts[v] = bench(v, lambda z, v=v: run_variant(
                v, z, wm, w2, dw, dw2, lnw, th=th, width=w, h=h), x)
        except Exception as e:
            print(f"  {v}: FAIL {type(e).__name__}: {str(e)[:200]}")
    if "base" in ts:
        base = ts["base"]
        for v, t in ts.items():
            if v != "base":
                print(f"  marginal {v:12s} {1e3*(t-base):+7.3f} ms")


if __name__ == "__main__":
    main()
