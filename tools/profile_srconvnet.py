"""Per-stage timing breakdown of the SRConvNet-L x4 512^2 forward.

Times each sub-module (FConvMod pieces, MixFFN, tail) as a chained jit —
same methodology as bench.py — so we can see where the per-image time goes.
Run on the real TPU: `python tools/profile_srconvnet.py`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_restoration_tpu.models.srconvnet import (
    BasicBlock, FConvMod, MixFFN, SRNet)
from image_restoration_tpu.ops.common import Conv
from image_restoration_tpu.ops.fft import FourierUnit
from image_restoration_tpu.ops.layernorm import LayerNorm2d

C, H, W = 64, 512, 512
BF = jnp.bfloat16


def time_stage(name, fn, params, x, chain=16):
    @jax.jit
    def run(v, inp):
        def body(_, acc):
            out = fn(v, jnp.clip(acc, -1.0, 2.0) * 0.999)
            if out.shape != inp.shape:
                return acc * 0.999 + jnp.mean(out).astype(acc.dtype)
            return out
        return jnp.sum(jax.lax.fori_loop(0, chain, body, inp))

    float(run(params, x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, x))
        best = min(best, (time.perf_counter() - t0) / chain)
    print(f"{name:28s} {best * 1e3:8.3f} ms")
    return best


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, H, W, C), BF, -0.5, 0.5)
    kw = dict(dtype=BF, param_dtype=jnp.float32)

    stages = []

    # whole block
    blk = BasicBlock(C, 8, 4, **kw)
    p = blk.init(key, x)
    stages.append(("BasicBlock (x10 = net)", time_stage(
        "BasicBlock", lambda v, a: blk.apply(v, a), p, x)))

    fcm = FConvMod(C, 8, **kw)
    p = fcm.init(key, x)
    stages.append(("FConvMod", time_stage(
        "FConvMod", lambda v, a: fcm.apply(v, a), p, x)))

    ffn = MixFFN(C, 4, **kw)
    p = ffn.init(key, x)
    stages.append(("MixFFN", time_stage(
        "MixFFN", lambda v, a: ffn.apply(v, a), p, x)))

    fu = FourierUnit(C, param_dtype=jnp.float32)
    p = fu.init(key, x)
    stages.append(("FourierUnit", time_stage(
        "FourierUnit", lambda v, a: fu.apply(v, a), p, x)))

    ln = LayerNorm2d(eps=1e-6, param_dtype=jnp.float32)
    p = ln.init(key, x)
    stages.append(("LayerNorm2d", time_stage(
        "LayerNorm2d", lambda v, a: ln.apply(v, a), p, x)))

    cpe = Conv(C, 3, padding=1, groups=C, use_bias=True, **kw)
    p = cpe.init(key, x)
    stages.append(("CPE dwconv3", time_stage(
        "CPE dwconv3", lambda v, a: cpe.apply(v, a), p, x)))

    c1 = Conv(C, 1, use_bias=True, **kw)
    p = c1.init(key, x)
    stages.append(("1x1 conv c->c", time_stage(
        "1x1 conv c->c", lambda v, a: c1.apply(v, a), p, x)))

    # softmax piece: (B, HW, heads, ch) fp32 softmax over HW
    def smax(v, a):
        am = a.reshape(1, H * W, 8, C // 8)
        out = jax.nn.softmax(am.astype(jnp.float32), axis=1).astype(a.dtype)
        return out.reshape(a.shape)
    stages.append(("softmax over HW (fp32)", time_stage(
        "softmax over HW (fp32)", smax, {}, x)))

    print()
    total_block = next(v for k, v in stages if k.startswith("BasicBlock"))
    print(f"10 x BasicBlock = {total_block * 10 * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
