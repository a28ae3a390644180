"""SFHformer, TPU-native (reference SFHformer.py — ECCV'24 spatial-frequency
hybrid mixer).

Each block: BatchNorm -> Mixer (local dilated-dwconv branch + global grouped
complex-conv Fourier branch with dynamic group weighting, channel-attention
fusion) -> layer-scale residual; BatchNorm -> multi-kernel FFN -> residual.
5-stage hourglass (48-96-192-96-48 by default) with 1x1-conv skips.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_restoration_tpu.models.registry import register_model
from image_restoration_tpu.ops.common import Conv, GroupedConv, gelu_exact
from image_restoration_tpu.ops.fft import irfft2_fast, rfft2_fast
from image_restoration_tpu.ops.layernorm import BatchNorm2d
from image_restoration_tpu.ops.resample import pixel_shuffle


class FFN(nn.Module):
    """4-way split multi-kernel FFN (SFHformer.py:76-117)."""

    dim: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        sp = self.dim // 2
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = Conv(self.dim * 2, 1, use_bias=True, name="conv_init_0", **kw)(x)
        parts = [x[..., i * sp:(i + 1) * sp] for i in range(4)]
        parts[1] = Conv(sp, 3, padding=1, groups=sp, use_bias=True,
                        name="conv1_1_0", **kw)(parts[1])
        parts[2] = Conv(sp, 5, padding=2, groups=sp, use_bias=True,
                        name="conv1_2_0", **kw)(parts[2])
        parts[3] = Conv(sp, 7, padding=3, groups=sp, use_bias=True,
                        name="conv1_3_0", **kw)(parts[3])
        x = gelu_exact(jnp.concatenate(parts, axis=-1))
        return Conv(self.dim, 1, use_bias=True, name="conv_fina_0", **kw)(x)


class LocalMixer(nn.Module):
    """dual dilated depthwise branch (:121-140)."""

    dim: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        sp = self.dim // 2
        x1, x2 = jnp.split(x, 2, axis=-1)
        cd1 = Conv(sp, 3, padding=1, groups=sp, use_bias=True, dtype=self.dtype,
                   param_dtype=self.param_dtype, name="CDilated_1")(x1)
        cd2 = GroupedConv(sp, (3, 3), padding=[(2, 2)] * 2, kernel_dilation=(2, 2),
                      feature_group_count=sp, use_bias=True, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="CDilated_2")(x2)
        return jnp.concatenate([cd1, cd2], axis=-1)


class FourierUnitGrouped(nn.Module):
    """Grouped complex conv with dynamic group mixing (:143-177)."""

    channels: int
    groups: int = 4
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels
        h, w = x.shape[1:3]
        kw = dict(dtype=jnp.float32, param_dtype=self.param_dtype)
        zr, zi = rfft2_fast(x, norm="ortho")
        # (B, h, w2, 2c), (c, re/im) interleaved — complex_to_channels layout
        f = jnp.stack([zr, zi], axis=-1).reshape(*zr.shape[:-1], 2 * c)
        f = BatchNorm2d(param_dtype=self.param_dtype, name="bn")(f, train=train)
        f = f + Conv(2 * c, 3, padding=1, groups=2 * c, use_bias=True,
                     name="fpe", **kw)(f)
        dyw = Conv(self.groups, 1, use_bias=True, name="weight_0", **kw)(f)
        dyw = jax.nn.softmax(dyw, axis=-1)  # softmax over groups
        fd = Conv(2 * c * self.groups, 1, groups=self.groups, use_bias=True,
                  name="fdc", **kw)(f)
        b, hh, ww, _ = fd.shape
        fd = fd.reshape(b, hh, ww, self.groups, 2 * c)
        f = jnp.einsum("bhwg,bhwgc->bhwc", dyw, fd)
        f = gelu_exact(f)
        st = f.reshape(*f.shape[:-1], c, 2)
        return irfft2_fast(st[..., 0], st[..., 1], (h, w), norm="ortho",
                           dtype=x.dtype)


class GlobalMixer(nn.Module):
    """(:180-206)."""

    dim: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = gelu_exact(Conv(self.dim * 2, 1, use_bias=True, name="conv_init_0", **kw)(x))
        x0 = x
        x = FourierUnitGrouped(self.dim * 2, param_dtype=self.param_dtype,
                               name="FFC")(x, train=train)
        return gelu_exact(Conv(self.dim, 1, use_bias=True, name="conv_fina_0",
                               **kw)(x + x0))


class Mixer(nn.Module):
    """local/global split + SE fusion (:209-251)."""

    dim: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = Conv(2 * self.dim, 1, use_bias=True, name="conv_init_0", **kw)(x)
        xl, xg = jnp.split(x, 2, axis=-1)
        xl = LocalMixer(self.dim, name="mixer_local", **kw)(xl)
        xg = GlobalMixer(self.dim, param_dtype=self.param_dtype,
                         name="mixer_gloal")(xg, train=train)
        x = gelu_exact(jnp.concatenate([xl, xg], axis=-1))
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = Conv(self.dim, 1, use_bias=True, name="ca_1", **kw)(se)
        se = Conv(2 * self.dim, 1, use_bias=True, name="ca_3", **kw)(nn.relu(se))
        x = jax.nn.sigmoid(se) * x
        return Conv(self.dim, 1, use_bias=True, name="ca_conv_0", **kw)(x)


class Block(nn.Module):
    dim: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, self.dim),
                          self.param_dtype)
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, self.dim),
                           self.param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = BatchNorm2d(param_dtype=self.param_dtype, name="norm1")(x, train=train)
        h = Mixer(self.dim, **kw, name="mixer")(h, train=train)
        x = x + h * beta.astype(h.dtype)
        h = BatchNorm2d(param_dtype=self.param_dtype, name="norm2")(x, train=train)
        h = FFN(self.dim, **kw, name="ffn")(h)
        return x + h * gamma.astype(h.dtype)


class Stage(nn.Module):
    """Named wrapper so params nest as layerN/blocks_i (torch key layout)."""

    dim: int
    depth: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.depth):
            x = Block(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                      name=f"blocks_{i}")(x, train=train)
        return x


@register_model("sfhformer")
class SFHformer(nn.Module):
    """Backbone (:306-360); _t/_s/_m/_l presets via depth."""

    in_chans: int = 3
    out_chans: int = 3
    embed_dim: Sequence[int] = (32, 64, 128, 64, 32)
    depth: Sequence[int] = (2, 2, 4, 2, 2)
    embed_kernel_size: int = 3
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ed = self.embed_dim
        inp = x
        x = x.astype(self.dtype) if self.dtype is not None else x
        x = Conv(ed[0], self.embed_kernel_size, stride=1,
                 padding=self.embed_kernel_size // 2, use_bias=True,
                 name="patch_embed", **kw)(x)

        x = Stage(ed[0], self.depth[0], **kw, name="layer1")(x, train=train)
        c1 = x
        x = Conv(ed[0] * 2, 2, stride=2, use_bias=True, name="downsample1", **kw)(x)
        x = Stage(ed[1], self.depth[1], **kw, name="layer2")(x, train=train)
        c2 = x
        x = Conv(ed[1] * 2, 2, stride=2, use_bias=True, name="downsample2", **kw)(x)
        x = Stage(ed[2], self.depth[2], **kw, name="layer3")(x, train=train)
        x = Conv(ed[3] * 4, 1, use_bias=False, name="upsample3", **kw)(x)
        x = pixel_shuffle(x, 2)
        x = Conv(ed[1], 1, use_bias=True, name="skip2", **kw)(
            jnp.concatenate([x, c2], axis=-1))
        x = Stage(ed[3], self.depth[3], **kw, name="layer8")(x, train=train)
        x = Conv(ed[4] * 4, 1, use_bias=False, name="upsample4", **kw)(x)
        x = pixel_shuffle(x, 2)
        x = Conv(ed[0], 1, use_bias=True, name="skip1", **kw)(
            jnp.concatenate([x, c1], axis=-1))
        x = Stage(ed[4], self.depth[4], **kw, name="layer9")(x, train=train)
        x = Conv(self.out_chans, 3, padding=1, use_bias=True,
                 name="patch_unembed", **kw)(x)
        return (inp + x).astype(jnp.float32)
