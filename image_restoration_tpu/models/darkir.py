"""DarkIR, TPU-native (reference DarkIR-main/archs/{DarkIR.py:11-114,
arch_model.py}).

NAFNet-lineage low-light + deblur U-Net: EBlock encoder (1x1 expand ->
depthwise branch -> SimpleGate -> SCA channel attention -> FreMLP frequency
modulation), DBlock decoder with parallel dilated depthwise branches
(dilations 1/4/9 summed), strided-conv downsamples, 1x1+PixelShuffle
upsamples, side output head for mid-supervision, pad-to-x8 + crop.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_restoration_tpu.models.registry import register_model
from image_restoration_tpu.ops.common import Conv, GroupedConv, simple_gate
from image_restoration_tpu.ops.fft import FreMLP
from image_restoration_tpu.ops.layernorm import LayerNorm2d
from image_restoration_tpu.ops.resample import pixel_shuffle


def _dilated_dwconv(x, features, dilation, name, dtype, param_dtype, groups):
    """3x3 depthwise conv with dilation (arch_model.Branch)."""
    return GroupedConv(
        features, (3, 3), padding=[(dilation, dilation)] * 2,
        kernel_dilation=(dilation, dilation), feature_group_count=groups,
        use_bias=True, dtype=dtype, param_dtype=param_dtype, name=name,
    )(x)


class EBlock(nn.Module):
    """arch_model.py:141-204."""

    c: int
    dw_expand: int = 2
    dilations: Sequence[int] = (1,)
    extra_depth_wise: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inp):
        c, dw = self.c, self.dw_expand * self.c
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = LayerNorm2d(eps=1e-6, param_dtype=self.param_dtype, name="norm1")(inp)
        if self.extra_depth_wise:
            x = Conv(c, 3, padding=1, groups=c, use_bias=True, name="extra_conv", **kw)(x)
        x = Conv(dw, 1, use_bias=True, name="conv1", **kw)(x)
        z = 0.0
        for i, d in enumerate(self.dilations):
            z = z + _dilated_dwconv(x, dw, d, f"branches_{i}", self.dtype,
                                    self.param_dtype, groups=dw)
        z = simple_gate(z)
        sca = jnp.mean(z, axis=(1, 2), keepdims=True)
        sca = Conv(dw // 2, 1, use_bias=True, name="sca_1", **kw)(sca)
        x = Conv(c, 1, use_bias=True, name="conv3", **kw)(sca * z)
        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, c), self.param_dtype)
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, c), self.param_dtype)
        y = inp + beta.astype(x.dtype) * x
        x2 = LayerNorm2d(eps=1e-6, param_dtype=self.param_dtype, name="norm2")(y)
        x_freq = FreMLP(nc=c, expand=2, param_dtype=self.param_dtype, name="freq")(x2)
        x = y * x_freq
        return y + x * gamma.astype(x.dtype)


class DBlock(nn.Module):
    """arch_model.py:72-139: parallel dilated branches + gated FFN."""

    c: int
    dw_expand: int = 2
    ffn_expand: int = 2
    dilations: Sequence[int] = (1, 4, 9)
    extra_depth_wise: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inp):
        c, dw = self.c, self.dw_expand * self.c
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = LayerNorm2d(eps=1e-6, param_dtype=self.param_dtype, name="norm1")(inp)
        x = Conv(dw, 1, use_bias=True, name="conv1", **kw)(x)
        if self.extra_depth_wise:
            # NB reference DBlock's extra dwconv uses groups=c on dw channels
            x = Conv(dw, 3, padding=1, groups=self.c, use_bias=True,
                     name="extra_conv", **kw)(x)
        z = 0.0
        for i, d in enumerate(self.dilations):
            z = z + _dilated_dwconv(x, dw, d, f"branches_{i}", self.dtype,
                                    self.param_dtype, groups=dw)
        z = simple_gate(z)
        sca = jnp.mean(z, axis=(1, 2), keepdims=True)
        sca = Conv(dw // 2, 1, use_bias=True, name="sca_1", **kw)(sca)
        x = Conv(c, 1, use_bias=True, name="conv3", **kw)(sca * z)
        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, c), self.param_dtype)
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, c), self.param_dtype)
        y = inp + beta.astype(x.dtype) * x
        x = Conv(self.ffn_expand * c, 1, use_bias=True, name="conv4", **kw)(
            LayerNorm2d(eps=1e-6, param_dtype=self.param_dtype, name="norm2")(y)
        )
        x = simple_gate(x)
        x = Conv(c, 1, use_bias=True, name="conv5", **kw)(x)
        return y + x * gamma.astype(x.dtype)


@register_model("darkir")
class DarkIR(nn.Module):
    img_channel: int = 3
    width: int = 32
    middle_blk_num_enc: int = 2
    middle_blk_num_dec: int = 2
    enc_blk_nums: Sequence[int] = (1, 2, 3)
    dec_blk_nums: Sequence[int] = (3, 1, 1)
    dilations: Sequence[int] = (1, 4, 9)
    extra_depth_wise: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inp, side_loss: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        H, W = inp.shape[1:3]
        pad = 2 ** len(self.enc_blk_nums)
        ph, pw = (-H) % pad, (-W) % pad
        x = jnp.pad(inp, ((0, 0), (0, ph), (0, pw), (0, 0)))
        inp_p = x
        x = x.astype(self.dtype) if self.dtype is not None else x
        x = Conv(self.width, 3, padding=1, use_bias=True, name="intro", **kw)(x)

        chan = self.width
        skips = []
        for li, num in enumerate(self.enc_blk_nums):
            for bi in range(num):
                x = EBlock(chan, extra_depth_wise=self.extra_depth_wise,
                           name=f"encoders_{li}_{bi}", **kw)(x)
            skips.append(x)
            x = Conv(2 * chan, 2, stride=2, use_bias=True, name=f"downs_{li}", **kw)(x)
            chan *= 2

        for bi in range(self.middle_blk_num_enc):
            x = EBlock(chan, extra_depth_wise=self.extra_depth_wise,
                       name=f"middle_blks_enc_{bi}", **kw)(x)
        x_light = x
        out_side = None
        if side_loss:
            out_side = Conv(self.img_channel, 3, padding=1, use_bias=True,
                            name="side_out", **kw)(x_light)
        for bi in range(self.middle_blk_num_dec):
            x = DBlock(chan, dilations=self.dilations,
                       extra_depth_wise=self.extra_depth_wise,
                       name=f"middle_blks_dec_{bi}", **kw)(x)
        x = x + x_light

        for li, num in enumerate(self.dec_blk_nums):
            x = Conv(2 * chan, 1, use_bias=False, name=f"ups_{li}_0", **kw)(x)
            x = pixel_shuffle(x, 2)
            chan //= 2
            x = x + skips[-(li + 1)]
            for bi in range(num):
                x = DBlock(chan, dilations=self.dilations,
                           extra_depth_wise=self.extra_depth_wise,
                           name=f"decoders_{li}_{bi}", **kw)(x)

        x = Conv(self.img_channel, 3, padding=1, use_bias=True, name="ending", **kw)(x)
        out = (x + inp_p.astype(x.dtype)).astype(jnp.float32)[:, :H, :W, :]
        if side_loss:
            return out, {"side": out_side.astype(jnp.float32)}
        return out


def darkir_key_map(key: str, keep_side: bool = False):
    """Normalize reference checkpoint keys: CustomSequential nests blocks
    under 'modules_list' (arch_util.CustomSequential); side_out is dropped
    when the flax model was initialized without the side head."""
    if key.startswith("side_out") and not keep_side:
        return None
    return key.replace(".modules_list.", ".")
