"""Finer HOGformer sub-component profile: attention qkv convs and each
FFN_DIFF stage at the bench-dominating shape (512^2, c=96) — locates the
time inside the 25.6 ms attention / 23.0 ms FFN measured by
profile_hogformer.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import flax.linen as nn

from chain_bench import marginal_adaptive
from image_restoration_tpu.models import hogformer as hf
from image_restoration_tpu.ops.common import Conv, GroupedConv


def time_fn(name, fn, x):
    ms = marginal_adaptive(fn, x, target_s=0.2, max_apps=24, reps=3) * 1e3
    print(f"  {name:32s} {ms:8.2f} ms", flush=True)
    return ms


def time_mod(name, mod, x):
    p = mod.init(jax.random.PRNGKey(0), x)
    return time_fn(name, lambda z: mod.apply(p, z).astype(z.dtype), x)


class QKVConvs(nn.Module):
    dim: int
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=jnp.bfloat16)
        qkv = Conv(self.dim * 5, 1, use_bias=False, name="qkv", **kw)(x)
        qkv = Conv(self.dim * 5, 3, padding=1, groups=self.dim * 5,
                   use_bias=False, name="qkv_dwconv", **kw)(qkv)
        return qkv[..., : self.dim]


class FFNFront(nn.Module):
    """project_in + pixel_shuffle only."""
    dim: int

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * 2.667)
        y = Conv(hidden * 2, 1, use_bias=False, name="project_in",
                 dtype=jnp.bfloat16)(x)
        y = hf.pixel_shuffle(y, 2)
        return hf.pixel_unshuffle(y, 2)[..., : self.dim]


class FFNDw5(nn.Module):
    """dwconv_5 at 2x res on q channels."""
    dim: int

    @nn.compact
    def __call__(self, x):  # x: (b, 2h, 2w, q)
        q = x.shape[-1]
        return Conv(q, 5, padding=2, groups=q, use_bias=False,
                    name="dwconv_5", dtype=jnp.bfloat16)(x)


class FFNDil3(nn.Module):
    @nn.compact
    def __call__(self, x):
        q = x.shape[-1]
        return GroupedConv(q, (3, 3), padding=[(2, 2), (2, 2)],
                           kernel_dilation=(2, 2), feature_group_count=q,
                           use_bias=False, dtype=jnp.bfloat16,
                           name="dwconv_dilated2_1")(x)


class FFNDecompose(nn.Module):
    @nn.compact
    def __call__(self, x):
        q = x.shape[-1]
        sigma = hf.ElementScale(q, 1e-5, jnp.float32, name="sigma")
        d = Conv(1, 1, use_bias=True, name="decompose", dtype=jnp.bfloat16)(x)
        return x + sigma(x - jax.nn.gelu(d, approximate=False))


def main(c=96, h=512, w=512):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, c),
                          jnp.bfloat16) * 0.1
    hidden = int(c * 2.667)
    q = hidden // 4
    x2 = jax.random.normal(jax.random.PRNGKey(2), (1, 2 * h, 2 * w, q),
                           jnp.bfloat16) * 0.1
    print(f"shape 1x{h}x{w}x{c} (bf16), hidden={hidden} q={q}", flush=True)
    time_mod("attn: qkv 1x1 + dwconv (5c)", QKVConvs(c), x)
    time_mod("ffn: project_in+shuffle", FFNFront(c), x)
    time_mod("ffn: dwconv5 @2x (q)", FFNDw5(c), x2)
    time_mod("ffn: dil-dwconv3 @2x (q)", FFNDil3(), x2)
    time_mod("ffn: decompose @2x (q)", FFNDecompose(), x2)

    def mish_mul(z):
        return hf.mish(z) * z

    time_fn("ffn: mish*x @2x (q)", mish_mul, x2)


if __name__ == "__main__":
    main()
