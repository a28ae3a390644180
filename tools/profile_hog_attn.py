"""Sub-stage profile of the r5 sort-free HOGformer attention at 512^2 c=96
heads=1: HOG patch-reorder front, 5-way qkv convs, the two channel-attention
einsum pairs, and the project_out + patch-unsort tail. Fixed-chain protocol
(2 compiles per stage). Run: python tools/profile_hog_attn.py
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_restoration_tpu.models import hogformer as hf
from image_restoration_tpu.ops.common import Conv, conv2d

N = 10
C, H, W = 96, 512, 512
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


class HogFront(nn.Module):
    """Sobel -> mag/ori -> patch sort -> one-hot perm matmul -> merge +
    hog-map proj/resize (the pre-qkv section)."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        half = c // 2
        p = 8
        x_half = x[..., :half]
        kx, ky = hf._sobel_kernels(half, x.dtype)
        gx = conv2d(x_half, kx, padding=1, groups=half)
        gy = conv2d(x_half, ky, padding=1, groups=half)
        mag = jnp.sqrt(gx * gx + gy * gy + 1e-6)
        ori = jnp.arctan2(gy, gx)
        ori_bin = (((ori + math.pi) / (2 * math.pi) * 9).astype(jnp.int32) % 9)
        p_x, info = hf._split_patches(x_half, p)
        p_mag, _ = hf._split_patches(mag, p)
        p_ori, _ = hf._split_patches(ori_bin.astype(x.dtype), p)
        p_bin = p_ori.astype(jnp.int32)
        sort_values = p_mag * (p_bin + 1).astype(p_mag.dtype)
        onehot = jax.nn.one_hot(p_bin, 9, dtype=p_mag.dtype)
        hog = jnp.mean(p_mag[..., None] * onehot, axis=(2, 3))
        hog = hog / (jnp.sum(hog, axis=-1, keepdims=True) + 1e-8)
        idx_patch = jnp.argsort(jnp.sum(sort_values, axis=2), axis=-1)
        perm = jax.nn.one_hot(idx_patch, p * p, dtype=x.dtype)
        p_sorted = jnp.einsum("bpst,bpct->bpcs", perm, p_x)
        x_half_p = hf._merge_patches(p_sorted, p, info)
        _, _, nh, nw = info
        hog_map = hog.reshape(b, nh, nw, 9)
        hog_map = Conv(c // 2, 1, use_bias=False, name="bin_proj",
                       dtype=BF)(hog_map)
        hog_map = hf.resize_bilinear(hog_map, h, w)
        return jnp.concatenate([x_half_p + hog_map, x[..., half:]], axis=-1)


class QKV(nn.Module):
    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        q = Conv(c * 5, 1, use_bias=False, name="qkv", dtype=BF)(x)
        q = Conv(c * 5, 3, padding=1, groups=c * 5, use_bias=False,
                 name="qkv_dwconv", dtype=BF)(q)
        return q[..., :c]


class AttnEinsums(nn.Module):
    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        outs = []
        for i in range(2):
            q = t * (0.9 + 0.1 * i)
            k = t * 1.1
            raw = jnp.einsum("btc,btd->bcd", q, k,
                             preferred_element_type=jnp.float32)
            qn = jnp.sqrt(jnp.einsum("btc,btc->bc", q, q,
                                     preferred_element_type=jnp.float32))
            kn = jnp.sqrt(jnp.einsum("btc,btc->bc", k, k,
                                     preferred_element_type=jnp.float32))
            a = raw / (jnp.maximum(qn, 1e-12)[:, :, None]
                       * jnp.maximum(kn, 1e-12)[:, None, :])
            a = jnp.exp(a)
            a = a / (jnp.sum(a, axis=-1, keepdims=True) + 1.0)
            outs.append(jnp.einsum("bcd,btd->btc", a.astype(t.dtype), t))
        return (outs[0] * outs[1]).reshape(b, h, w, c)


class Tail(nn.Module):
    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        half = c // 2
        out = Conv(c, 1, use_bias=False, name="project_out", dtype=BF)(x)
        p_out, info2 = hf._split_patches(out[..., :half], 8)
        idx = jnp.argsort(jnp.sum(jnp.abs(p_out), axis=2), axis=-1)
        perm = jax.nn.one_hot(idx, 64, dtype=x.dtype)
        p_out = jnp.einsum("bpst,bpcs->bpct", perm, p_out)
        out_half = hf._merge_patches(p_out, 8, info2)
        return jnp.concatenate([out_half, out[..., half:]], axis=-1)


def main():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, C), BF) * 0.1

    def glue(z):
        acc = z
        for _ in range(N):
            acc = jnp.clip(acc, -2.0, 2.0) * 0.999
        return jnp.sum(acc.astype(jnp.float32))

    tg = timed(jax.jit(glue), x)
    print(f"glue {tg*1e3:.2f} ms", flush=True)
    for name, mod in (("hog_front", HogFront()), ("qkv_convs", QKV()),
                      ("attn_einsums", AttnEinsums()), ("tail", Tail())):
        p = mod.init(jax.random.PRNGKey(0), x)
        t = timed(chain(lambda z, m=mod, pp=p: m.apply(pp, z)), x)
        print(f"  {name:14s} {(t - tg)/N*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
