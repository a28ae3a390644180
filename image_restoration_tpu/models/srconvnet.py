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
import numpy as np

from image_restoration_tpu.models.registry import register_model
from image_restoration_tpu.ops.common import (
    Conv,
    ConvParams,
    conv2d,
    gelu_exact,
    grouped_conv,
)
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
        a = FourierUnit(c, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="a")(xn)
        v = Conv(c, 1, use_bias=True, name="v", **kw)(xn)
        # (B,H,W,C) with head-major channels -> logits per (head, ch) over HW
        am = (a * v).reshape(b, h * w, heads, ch)
        am = am * layer_scale.reshape(1, 1, heads, 1).astype(am.dtype)
        # (A/B r5: a bf16 softmax island measured throughput-neutral — XLA
        # already keeps the fp32 logits inside the fusion — so the exact
        # fp32 softmax stays)
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
        # conv2d: depthwise banks ride the TPU taps path; other group
        # counts take the partition-safe grouped_conv (the kernel is a
        # differentiable weight bank)
        out = conv2d(
            xt.astype(dt), kern.astype(dt), stride=1, padding=k // 2,
            groups=b * self.groups,
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


class _AggParams(nn.Module):
    """Param twin of KernelAggregation (weight bank + bias)."""

    dim: int
    kernel_size: int
    num_kernels: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        weight = self.param(
            "weight",
            jax.nn.initializers.he_uniform(in_axis=(2, 3, 4), out_axis=1),
            (self.num_kernels, self.dim, 1, k, k), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.num_kernels, self.dim), self.param_dtype)
        return weight, bias


class _DKAParams(nn.Module):
    """Param twin of DynamicKernelAggregation: runs the (cheap) attention
    gate and returns the aggregation bank — identical param tree, but lets
    MixFFN run BOTH branches' depthwise convs as ONE full-lane conv."""

    dim: int
    kernel_size: int
    num_kernels: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_half):
        att = KernelAttention(self.dim, self.num_kernels, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name="attention")(x_half)
        weight, bias = _AggParams(self.dim, self.kernel_size,
                                  self.num_kernels, self.param_dtype,
                                  name="aggregation")()
        return att, weight, bias


class MixFFN(nn.Module):
    """Dual dynamic-kernel FFN (m_block.py:204-226); branch outputs interleave
    channel-major (c, g) before the out-projection.

    TPU layout: both K=5 and K=7 branches run as ONE batched depthwise conv
    over the un-split 2c tensor (the 5x5 bank zero-padded to 7x7 — exact),
    and the channel interleave is folded into the out-projection's weight
    rows instead of a stack+reshape copy. Half-lane (c=64) elementwise ops
    measure ~2x off roofline on v5e, so keeping the 2c=128 tensor whole is
    the difference."""

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
        if self.num_kernels <= 1:
            x1, x2 = jnp.split(xp, 2, axis=-1)
            b1 = gelu_exact(Conv(c, 5, padding=2, groups=c, use_bias=True,
                                 name="conv1", **kw)(x1))
            b2 = gelu_exact(Conv(c, 7, padding=3, groups=c, use_bias=True,
                                 name="conv2", **kw)(x2))
            st = jnp.stack([b1, b2], axis=-1)
            bsz, h, w = st.shape[:3]
            xcat = st.reshape(bsz, h, w, c * 2)
            return Conv(c, 1, use_bias=True, name="proj_out", **kw)(xcat) + shortcut

        bsz, h, w, _ = xp.shape
        dt = xp.dtype
        x1 = xp[..., :c]
        x2 = xp[..., c:]
        att1, w1b, b1b = _DKAParams(c, 5, self.num_kernels, name="conv1", **kw)(x1)
        att2, w2b, b2b = _DKAParams(c, 7, self.num_kernels, name="conv2", **kw)(x2)
        pd = self.param_dtype
        wk1 = jnp.einsum("bk,kdcij->bdcij", att1.astype(pd), w1b)  # (B,c,1,5,5)
        wk1 = jnp.pad(wk1, ((0, 0), (0, 0), (0, 0), (1, 1), (1, 1)))
        wk2 = jnp.einsum("bk,kdcij->bdcij", att2.astype(pd), w2b)  # (B,c,1,7,7)
        wk = jnp.concatenate([wk1, wk2], axis=1)                   # (B,2c,1,7,7)
        xt = xp.transpose(1, 2, 0, 3).reshape(1, h, w, bsz * 2 * c)
        kern = wk.transpose(3, 4, 2, 0, 1).reshape(7, 7, 1, bsz * 2 * c)
        # NOTE: stays on the grouped-conv op, NOT the shifted-FMA taps path:
        # at k=7 the 49-tap unroll measured 111 ms/img vs 78 ms for the conv
        # op at 512^2 x128 on v5e (taps only win for k <= 5; conv2d guards)
        y = grouped_conv(xt.astype(dt), kern.astype(dt), (1, 1),
                         ((3, 3), (3, 3)), (1, 1), bsz * 2 * c)
        y = y.reshape(h, w, bsz, 2 * c).transpose(2, 0, 1, 3)
        bias = jnp.concatenate(
            [jnp.einsum("bk,kd->bd", att1.astype(pd), b1b),
             jnp.einsum("bk,kd->bd", att2.astype(pd), b2b)], axis=-1)
        y = y + bias.astype(dt).reshape(bsz, 1, 1, 2 * c)
        g = gelu_exact(y)                                          # [b1; b2]
        # proj_out with the (c, 2) interleave folded into its weight rows:
        # interleaved channel 2*cc+s == concat channel s*c+cc
        w_out, b_out = ConvParams(c, 2 * c, 1, True, self.param_dtype,
                                  name="proj_out")()
        perm = np.array([cc * 2 + s for s in range(2) for cc in range(c)])
        out = jnp.einsum("bhwk,kd->bhwd", g,
                         w_out[0, 0][perm].astype(dt)) + b_out.astype(dt)
        return out + shortcut


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


def _tail_polyphase(z, kern, bias, r: int):
    """3x3 SAME conv applied to ``pixel_shuffle(z_flat, r)``, computed in
    PRE-shuffle space (polyphase decomposition) — exact, and never
    materializes the (H*r, W*r) tensor whose half-lane layout and 3-channel
    output run ~10x off the bandwidth roofline on TPU.

    z: (B, H, W, C, r, r) subpixel-expanded features (channels (c, p, q) in
    torch pixel-shuffle order). kern: (3, 3, C, O). Returns (B, H*r, W*r, O).

    Derivation: output pixel (r*y+p+u, r*x+q+v) reads the pre-shuffle block
    (y + floor((p+u)/r), x + floor((q+v)/r)) at subpixel ((p+u)%r, (q+v)%r),
    so the conv splits into 9 block-shift terms, each a small einsum whose
    weights are the 3x3 taps routed to their (subpixel-in, subpixel-out)
    positions; border zero-padding in block space matches SAME padding in
    shuffled space exactly.
    """
    b, hh, ww, c, _, _ = z.shape
    o = kern.shape[-1]
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = None
    for oy in (-1, 0, 1):
        # subpixel routing tables for this block shift (static numpy)
        pps, ps, us = [], [], []
        for p in range(r):
            for u in (-1, 0, 1):
                if (p + u) // r == oy:
                    ps.append(p), us.append(u), pps.append((p + u) % r)
        for ox in (-1, 0, 1):
            qqs, qs, vs = [], [], []
            for q in range(r):
                for v in (-1, 0, 1):
                    if (q + v) // r == ox:
                        qs.append(q), vs.append(v), qqs.append((q + v) % r)
            # T[P,p] / per-(u, v) tap weights folded into one (C,P,Q,O,p,q)
            wt = np.zeros((r, r, r, r, 3, 3), np.float32)  # [P,Q,p,q,u,v]
            for pi, (p, u, pp) in enumerate(zip(ps, us, pps)):
                for qi, (q, v, qq) in enumerate(zip(qs, vs, qqs)):
                    wt[pp, qq, p, q, u + 1, v + 1] = 1.0
            if not wt.any():
                continue
            wfold = jnp.einsum("PQpquv,uvco->cPQopq",
                               jnp.asarray(wt, kern.dtype), kern)
            zs = jax.lax.slice(
                zp, (0, oy + 1, ox + 1, 0, 0, 0),
                (b, oy + 1 + hh, ox + 1 + ww, c, r, r))
            term = jnp.einsum("bhwcPQ,cPQopq->bhwopq", zs, wfold)
            out = term if out is None else out + term
    out = out + bias.astype(out.dtype)[None, None, None, :, None, None]
    return pixel_shuffle(out.reshape(b, hh, ww, o * r * r), r)


@register_model("srconvnet")
class SRNet(nn.Module):
    """m_network.py:11-54. MeanShift layers exist in checkpoints but are
    unused in forward; the importer drops them via key_map.

    The upsampling tail is computed entirely in PRE-shuffle space (gelu
    commutes with pixel_shuffle; the post-shuffle 1x1 conv is a
    block-diagonal einsum; the post-shuffle 3x3 tail is `_tail_polyphase`) —
    exact same function as the reference's shuffle-then-conv order, but no
    (H*r, W*r)-sized intermediate ever hits HBM (those layouts measure ~10x
    off roofline at 64 channels on v5e)."""

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
        b, hh, ww, c = h.shape
        dt = h.dtype
        if self.scale == 4:
            h = Conv(self.dim * 4, 1, use_bias=True, name="upsampling_0", **kw)(h)
            ga = gelu_exact(h)                       # pre-shuffle gelu
            # post-shuffle 1x1 conv == block-diagonal einsum over (c, i, j)
            w3, b3 = ConvParams(self.dim * 4, self.dim, 1, True,
                                self.param_dtype, name="upsampling_3")()
            ga6 = ga.reshape(b, hh, ww, self.dim, 2, 2)
            b4 = jnp.einsum("bhwcij,cd->bhwdij", ga6,
                            w3[0, 0].astype(dt))
            b4 = b4 + b3.astype(dt)[None, None, None, :, None, None]
            gb = gelu_exact(b4)                      # (B,H,W,256,2,2)
            # combine the two shuffle(2)s into subpixel axes (p,q) of one
            # shuffle(4): d=(e,i2,j2), p=2*i+i2, q=2*j+j2
            zz = gb.reshape(b, hh, ww, self.dim, 2, 2, 2, 2)  # e,i2,j2,i,j
            zz = zz.transpose(0, 1, 2, 3, 6, 4, 7, 5)          # e,(i,i2),(j,j2)
            z = zz.reshape(b, hh, ww, self.dim, 4, 4)
            r = 4
        else:
            h = Conv(self.dim * self.scale**2, 1, use_bias=True,
                     name="upsampling_0", **kw)(h)
            z = gelu_exact(h).reshape(b, hh, ww, self.dim, self.scale,
                                      self.scale)
            r = self.scale
        wt, bt = ConvParams(self.colors, self.dim, 3, True, self.param_dtype,
                            name="tail")()
        out = _tail_polyphase(z, wt.astype(dt), bt, r)
        hb, wb = base.shape[1] * self.scale, base.shape[2] * self.scale
        return (out.astype(jnp.float32) + resize_bilinear(base.astype(jnp.float32), hb, wb))


def srconvnet_key_map(key: str):
    """Drop unused MeanShift buffers from reference checkpoints."""
    if key.startswith(("sub_mean", "add_mean")):
        return None
    return key
