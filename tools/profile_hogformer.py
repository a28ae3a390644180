"""Component-level chained-diff profile of the HOGformer block at the
bench-dominating shape (512^2, c=96, heads=1 — decoder_level1/refinement).

Times the full TransformerBlock, Attention_DHOGSA, FFN_DIFF, and ablated
attention pieces to locate the 323 GB/img HBM traffic (BENCH_secondary r3).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from chain_bench import marginal_adaptive
from image_restoration_tpu.models import hogformer as hf


def time_mod(name, mod, x, **kwargs):
    p = mod.init(jax.random.PRNGKey(0), x, **kwargs)
    fn = lambda z: mod.apply(p, z, **kwargs).astype(z.dtype)
    ms = marginal_adaptive(fn, x, target_s=0.2, max_apps=24, reps=3) * 1e3
    print(f"  {name:28s} {ms:8.2f} ms")
    return ms


def time_fn(name, fn, x):
    ms = marginal_adaptive(fn, x, target_s=0.2, max_apps=24, reps=3) * 1e3
    print(f"  {name:28s} {ms:8.2f} ms")
    return ms


def main(c=96, h=512, w=512, heads=1):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, c), jnp.bfloat16) * 0.1
    print(f"shape 1x{h}x{w}x{c} heads={heads} (bf16)")
    kw = dict(dtype=jnp.bfloat16)

    time_mod("TransformerBlock", hf.TransformerBlock(c, heads, **kw), x)
    time_mod("Attention_DHOGSA", hf.Attention_DHOGSA(c, heads, **kw), x)
    time_mod("FFN_DIFF", hf.FFN_DIFF(c, **kw), x)

    # --- attention sub-pieces ---
    half = c // 2
    import math

    def hog_reorder(z):
        x_half = z[..., :half]
        kx, ky = hf._sobel_kernels(half, z.dtype)
        gx = hf.conv2d(x_half, kx, padding=1, groups=half)
        gy = hf.conv2d(x_half, ky, padding=1, groups=half)
        mag = jnp.sqrt(gx * gx + gy * gy + 1e-6)
        ori = jnp.arctan2(gy, gx)
        ori_bin = (((ori + math.pi) / (2 * math.pi) * 9).astype(jnp.int32) % 9)
        p_x, info = hf._split_patches(x_half, 8)
        p_mag, _ = hf._split_patches(mag, 8)
        p_ori, _ = hf._split_patches(ori_bin.astype(z.dtype), 8)
        p_bin = p_ori.astype(jnp.int32)
        sort_values = p_mag * (p_bin + 1).astype(p_mag.dtype)
        onehot = jax.nn.one_hot(p_bin, 9, dtype=p_mag.dtype)
        hog = jnp.mean(p_mag[..., None] * onehot, axis=(2, 3))
        hog = hog / (jnp.sum(hog, axis=-1, keepdims=True) + 1e-8)
        idx_patch = jnp.argsort(jnp.sum(sort_values, axis=2), axis=-1)
        perm = jax.nn.one_hot(idx_patch, 64, dtype=z.dtype)
        p_sorted = jnp.einsum("bpst,bpct->bpcs", perm, p_x)
        x_half_p = hf._merge_patches(p_sorted, 8, info)
        return jnp.concatenate([x_half_p, z[..., half:]], axis=-1)

    time_fn("hog patch reorder", hog_reorder, x)

    def vsort_key(z):
        kxc, kyc = hf._sobel_kernels(c, z.dtype)
        gxv = hf.conv2d(z, kxc, padding=1, groups=c)
        gyv = hf.conv2d(z, kyc, padding=1, groups=c)
        magv = jnp.sqrt(gxv * gxv + gyv * gyv + 1e-6)
        oriv = (jnp.arctan2(gyv, gxv) + math.pi) / (2 * math.pi)
        key = jnp.sum(magv * oriv, axis=-1).reshape(1, h * w)
        idx = jnp.argsort(key, axis=-1)
        # fold idx back so the fn is shape-preserving (cost of argsort incl.)
        return z + (idx.reshape(1, h, w, 1) % 7).astype(z.dtype) * 0.0

    time_fn("v-sobel + global argsort", vsort_key, x)

    def gather_5c(z):
        qkv = jnp.concatenate([z] * 5, axis=-1).reshape(1, h * w, 5 * c)
        key = jnp.sum(z, axis=-1).reshape(1, h * w)
        idx = jnp.argsort(key, axis=-1)
        qkv_s = jnp.take_along_axis(qkv, idx[:, :, None], axis=1)
        return qkv_s[..., :c].reshape(1, h, w, c)

    time_fn("argsort+gather (T,5c)", gather_5c, x)

    def attn_branch(z):
        t = h * w
        q = z.reshape(1, t, c)
        att = hf.Attention_DHOGSA(c, heads, dtype=jnp.bfloat16)
        temp = jnp.ones((heads, 1, 1), jnp.bfloat16)
        out = att._reshape_attn(q, q, q, temp, box=True)
        return out.reshape(1, h, w, c)

    time_fn("_reshape_attn (box)", attn_branch, x)


if __name__ == "__main__":
    main()
