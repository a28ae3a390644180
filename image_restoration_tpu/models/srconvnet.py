"""SRConvNet, TPU-native (reference SRConvNet-main/models/{m_network.py:11-54,
m_block.py}).

Lightweight super-resolution net: FConvMod Fourier-modulated attention +
MixFFN with dynamic kernel aggregation, pixel-shuffle upsampler over a
bilinear base skip.

TPU notes:
* The reference splits the HW axis into 4 chunks before the a*v product
  (m_block.py:96-104) — mathematically a no-op since the product is
  elementwise and the softmax runs over the full HW axis after the concat;
  we compute it directly.
* Per-sample dynamic kernels (KernelAggregation's groups=B*C conv trick,
  m_block.py:134-150) become a batched grouped conv with static shapes:
  batch folded into channels, feature_group_count = B*C.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_restoration_tpu.models.registry import register_model
from image_restoration_tpu.ops.common import Conv, gelu_exact, grouped_conv
from image_restoration_tpu.ops.fft import FourierUnit
from image_restoration_tpu.ops.layernorm import LayerNorm2d
from image_restoration_tpu.ops.resample import pixel_shuffle, resize_bilinear


class FConvMod(nn.Module):
    """Fourier-modulated conv attention (m_block.py:72-109)."""

    dim: int
    num_heads: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        heads = self.num_heads
        ch = c // heads
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        layer_scale = self.param("layer_scale", nn.initializers.constant(1e-6),
                                 (heads,), self.param_dtype)
        shortcut = x
        pos = Conv(c, 3, padding=1, groups=c, use_bias=True, name="CPE", **kw)(x)
        xn = LayerNorm2d(eps=1e-6, param_dtype=self.param_dtype, name="norm")(x)
        a = FourierUnit(c, param_dtype=self.param_dtype, name="a")(xn)
        v = Conv(c, 1, use_bias=True, name="v", **kw)(xn)
        # (B,H,W,C) with head-major channels -> logits per (head, ch) over HW
        am = (a * v).reshape(b, h * w, heads, ch)
        am = am * layer_scale.reshape(1, 1, heads, 1).astype(am.dtype)
        attn = jax.nn.softmax(am.astype(jnp.float32), axis=1).astype(x.dtype)
        attn = attn.reshape(b, h, w, c) + pos
        out = Conv(c, 1, use_bias=True, name="proj", **kw)(attn)
        return out + shortcut


class KernelAttention(nn.Module):
    """GAP -> 1x1 -> GELU -> 1x1 -> sigmoid over kernel bank (m_block.py:153-174)."""

    dim: int
    num_kernels: int
    reduction: int = 8
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = self.dim // self.reduction if self.dim != 3 else self.num_kernels
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = Conv(mid, 1, use_bias=True, name="conv1", **kw)(g)
        g = gelu_exact(g)
        g = Conv(self.num_kernels, 1, use_bias=True, name="conv2", **kw)(g)
        return jax.nn.sigmoid(g.reshape(x.shape[0], self.num_kernels))


class KernelAggregation(nn.Module):
    """Attention-weighted sum of a depthwise kernel bank, applied as one
    grouped conv with batch folded into channels (m_block.py:113-150)."""

    dim: int
    kernel_size: int
    groups: int
    num_kernels: int
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attention):
        b, h, w, c = x.shape
        k = self.kernel_size
        cig = self.dim // self.groups
        weight = self.param(
            "weight",
            jax.nn.initializers.he_uniform(in_axis=(2, 3, 4), out_axis=1),
            (self.num_kernels, self.dim, cig, k, k), self.param_dtype,
        )
        # per-sample kernels: (B, dim, cig, k, k)
        wk = jnp.einsum("bk,kdcij->bdcij", attention.astype(self.param_dtype), weight)
        # fold batch into channels: x (1, H, W, B*C); kernel HWIO (k,k,cig,B*dim)
        xt = x.transpose(1, 2, 0, 3).reshape(1, h, w, b * c)
        kern = wk.transpose(3, 4, 2, 0, 1).reshape(k, k, cig, b * self.dim)
        dt = x.dtype
        # grouped_conv: the kernel here is a differentiable weight bank, so
        # its gradient must take the partition-safe path (ops/common.py)
        out = grouped_conv(
            xt.astype(dt), kern.astype(dt), (1, 1),
            ((k // 2, k // 2),) * 2, (1, 1), b * self.groups,
        )
        out = out.reshape(h, w, b, c).transpose(2, 0, 1, 3)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.num_kernels, self.dim), self.param_dtype)
            out = out + jnp.einsum("bk,kd->bd", attention.astype(self.param_dtype),
                                   bias).astype(dt).reshape(b, 1, 1, c)
        return out


class DynamicKernelAggregation(nn.Module):
    dim: int
    kernel_size: int
    groups: int = 1
    num_kernels: int = 4
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        attn = KernelAttention(self.dim, self.num_kernels, dtype=self.dtype,
                               param_dtype=self.param_dtype, name="attention")(x)
        return KernelAggregation(self.dim, self.kernel_size, self.groups,
                                 self.num_kernels, dtype=self.dtype,
                                 param_dtype=self.param_dtype, name="aggregation")(x, attn)


class MixFFN(nn.Module):
    """Dual dynamic-kernel FFN (m_block.py:204-226); branch outputs interleave
    channel-major (c, g) before the out-projection."""

    dim: int
    num_kernels: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.dim
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        shortcut = x
        xn = LayerNorm2d(eps=1e-6, param_dtype=self.param_dtype, name="norm")(x)
        xp = gelu_exact(Conv(c * 2, 1, use_bias=True, name="proj_in", **kw)(xn))
        x1, x2 = jnp.split(xp, 2, axis=-1)
        # named to line up with torch's DyConv wrapper (conv1.conv.<...> keys:
        # the importer skips the extra 'conv' segment)
        mk = lambda ks, name: (
            DynamicKernelAggregation(c, ks, groups=c, num_kernels=self.num_kernels,
                                     name=name, **kw)
            if self.num_kernels > 1
            else Conv(c, ks, padding=ks // 2, groups=c, use_bias=True, name=name, **kw)
        )
        b1 = gelu_exact(mk(5, "conv1")(x1))
        b2 = gelu_exact(mk(7, "conv2")(x2))
        # interleave (c, 2): [b1_c0, b2_c0, b1_c1, b2_c1, ...]
        st = jnp.stack([b1, b2], axis=-1)
        bsz, h, w = st.shape[:3]
        xcat = st.reshape(bsz, h, w, c * 2)
        return Conv(c, 1, use_bias=True, name="proj_out", **kw)(xcat) + shortcut


class BasicBlock(nn.Module):
    dim: int
    num_heads: int
    num_kernels: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = FConvMod(self.dim, self.num_heads, name="attention", **kw)(x)
        return MixFFN(self.dim, self.num_kernels, name="ffn", **kw)(x)


@register_model("srconvnet")
class SRNet(nn.Module):
    """m_network.py:11-54. MeanShift layers exist in checkpoints but are
    unused in forward; the importer drops them via key_map."""

    dim: int = 64
    n_blocks: int = 10
    num_heads: int = 8
    num_kernels: int = 4
    scale: int = 4
    colors: int = 3
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        base = x
        x = x.astype(self.dtype) if self.dtype is not None else x
        feat = Conv(self.dim, 3, padding=1, use_bias=True, name="to_feat", **kw)(x)
        h = feat
        for i in range(self.n_blocks):
            h = BasicBlock(self.dim, self.num_heads, self.num_kernels,
                           name=f"blocks_{i}", **kw)(h)
        h = h + feat
        if self.scale == 4:
            h = Conv(self.dim * 4, 1, use_bias=True, name="upsampling_0", **kw)(h)
            h = gelu_exact(pixel_shuffle(h, 2))
            h = Conv(self.dim * 4, 1, use_bias=True, name="upsampling_3", **kw)(h)
            h = gelu_exact(pixel_shuffle(h, 2))
        else:
            h = Conv(self.dim * self.scale**2, 1, use_bias=True, name="upsampling_0", **kw)(h)
            h = gelu_exact(pixel_shuffle(h, self.scale))
        out = Conv(self.colors, 3, padding=1, use_bias=True, name="tail", **kw)(h)
        hb, wb = base.shape[1] * self.scale, base.shape[2] * self.scale
        return (out.astype(jnp.float32) + resize_bilinear(base.astype(jnp.float32), hb, wb))


def srconvnet_key_map(key: str):
    """Drop unused MeanShift buffers from reference checkpoints."""
    if key.startswith(("sub_mean", "add_mean")):
        return None
    return key
