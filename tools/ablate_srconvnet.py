"""Ablation timing of SRConvNet-L x4 at 512^2: compile the net with one
piece stubbed out and diff against the full forward — attributes ms to each
piece without per-op profiler support (axon tunnel has none).

Run on the real TPU: `python tools/ablate_srconvnet.py [names...]`
"""

import os
import sys
import time
from contextlib import contextmanager
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import image_restoration_tpu.models.srconvnet as S
from image_restoration_tpu.ops import fft as F

H = W = 512
CHAIN = 16
BF = jnp.bfloat16


def bench(model):
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, H, W, 3),
                           jnp.float32, 0.2, 0.8)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    leaves, treedef = jax.tree.flatten(shapes)

    def fill(i, s):
        if s.ndim >= 2:
            fan = 1
            for d in s.shape[:-1]:
                fan *= d
            return (jax.random.normal(jax.random.PRNGKey(i), s.shape,
                                      jnp.float32) / fan ** 0.5).astype(s.dtype)
        return jnp.ones(s.shape, s.dtype)
    params = jax.tree.unflatten(treedef, [fill(i, s) for i, s in enumerate(leaves)])

    @jax.jit
    def fwd(v, inp):
        def body(_, acc):
            out = model.apply(v, jnp.clip(acc, -1.0, 2.0) * 0.999)
            return acc * 0.999 + jnp.mean(out).astype(acc.dtype)
        return jnp.sum(jax.lax.fori_loop(0, CHAIN, body, inp))

    float(fwd(params, x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fwd(params, x))
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    return best * 1e3


@contextmanager
def stub(path, repl):
    with mock.patch(path, repl):
        yield


def identity_fourier(self, x):
    return x


def no_softmax(am, axis=None):
    return am


import flax.linen as nn


class NoTailNet(S.SRNet):
    @nn.compact
    def __call__(self, x):
        # body only: blocks + to_feat, skip upsample tail + bilinear base
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        xb = x.astype(self.dtype) if self.dtype is not None else x
        feat = S.Conv(self.dim, 3, padding=1, use_bias=True,
                      name="to_feat", **kw)(xb)
        h = feat
        for i in range(self.n_blocks):
            h = S.BasicBlock(self.dim, self.num_heads, self.num_kernels,
                             name=f"blocks_{i}", **kw)(h)
        return (h + feat).astype(jnp.float32)


class StaticFFN(S.MixFFN):
    """MixFFN with num_kernels=1 static 5/7 dwconvs (no dynamic banks)."""


def main():
    names = sys.argv[1:] or ["full", "no_dft", "no_softmax", "no_tail",
                             "static_ffn"]
    mk = lambda **kw: S.SRNet(dim=64, n_blocks=10, num_heads=8, scale=4,
                              dtype=BF, **kw)
    results = {}
    for n in names:
        if n == "full":
            t = bench(mk())
        elif n == "no_dft":
            with mock.patch.object(F.FourierUnit, "__call__", identity_fourier):
                t = bench(mk())
        elif n == "no_softmax":
            with mock.patch.object(jax.nn, "softmax", no_softmax):
                t = bench(mk())
        elif n == "no_tail":
            t = bench(NoTailNet(dim=64, n_blocks=10, num_heads=8, scale=4,
                                dtype=BF))
        elif n == "static_ffn":
            t = bench(mk(num_kernels=1))
        results[n] = t
        print(f"{n:12s} {t:8.2f} ms")
    if "full" in results:
        base = results["full"]
        for k, v in results.items():
            if k != "full":
                print(f"delta {k:12s} {base - v:+7.2f} ms")


if __name__ == "__main__":
    main()
