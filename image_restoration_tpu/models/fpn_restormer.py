"""FPN/PAFPN-fused Restormer with FFT-DSConv encoders, TPU-native (NHWC).

Re-designed from the owner's main experiment line
(experiment/baseline_restormer_new_train/20251120_Restormer_FFT_DSConv_Fusion_
elementwise_gate_FPN_frequency_aware_task_aware/src/net/model.py):

* ``GatedMDTA`` (:126-212): MDTA whose q projection carries extra gate
  channels — None / 'headwise' (one scalar per head) / 'elementwise'
  (full-dim), applied as sigmoid multiplicative gates on the SDPA output.
* ``Light_FFT_DSConv_Block`` (:264-323): channel-split spatial (BN-GELU-
  DSConv-BN) + frequency (full fft2 real/imag concat -> 1x1 -> BN-GELU-
  DSConv-BN) branches, ECA fusion, residual.
* ``FrequencyAwareBlock`` (:329-449): magnitude/phase frequency features,
  GAP-gated low(avg-pool-smooth)/high(detail) blend, cross-domain sigmoid
  attention, ECA, residual; per-level dilation 1/2/4/8.
* ``FPN_Fusion`` / ``PAFPN_Fusion`` (:507-638): lateral 1x1 to dims[1],
  channel-preserving pixel-shuffle up/down paths, optional task-aware SE
  weights per scale.
* Assembly (:656-805): FFT-DSConv encoder levels, optional FPN/PAFPN over
  [level1..latent], Restormer transformer decoder with the gated MDTA.

The tanh-approximate GELU (:19-22) is used wherever the reference's custom
GELU class is; the decoder FFN keeps exact GELU (:92, F.gelu).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_restoration_tpu.models.registry import register_model
from image_restoration_tpu.ops.attention import normalized_channel_logits_tok_minor
from image_restoration_tpu.ops.common import Conv, GroupedConv, gelu_exact
from image_restoration_tpu.ops.ffn import GDFN
from image_restoration_tpu.ops.layernorm import BatchNorm2d, LayerNorm
from image_restoration_tpu.ops.resample import (
    Downsample,
    Upsample,
    pixel_shuffle,
    pixel_unshuffle,
)


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


class ECA(nn.Module):
    """Efficient channel attention (model.py:233-244): GAP -> 1D conv over
    channels -> sigmoid scale."""

    k_size: int = 3
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2))[:, :, None]  # (B, C, 1): channel as "length"
        y = nn.Conv(1, (self.k_size,), padding=[(self.k_size // 2,) * 2],
                    use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv")(y)
        return x * jax.nn.sigmoid(y[..., 0])[:, None, None, :]


class DSConv(nn.Module):
    """Depthwise-separable conv (model.py:248-260)."""

    channels: int
    kernel: int = 3
    dilation: int = 1
    use_bias: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.dilation
        x = GroupedConv(self.channels, (self.kernel, self.kernel),
                    padding=[(p, p), (p, p)], kernel_dilation=(self.dilation,) * 2,
                    feature_group_count=self.channels, use_bias=self.use_bias,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="depthwise")(x)
        return Conv(self.channels, 1, use_bias=self.use_bias, name="pointwise",
                    dtype=self.dtype, param_dtype=self.param_dtype)(x)


class GatedMDTA(nn.Module):
    """model.py:126-212."""

    dim: int
    num_heads: int
    use_bias: bool = False
    gate_type: Optional[str] = None  # None | 'headwise' | 'elementwise'
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        heads, cph = self.num_heads, c // self.num_heads
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.gate_type is None:
            out_ch = c * 3
        elif self.gate_type == "headwise":
            out_ch = c * 3 + self.num_heads
        else:
            out_ch = c * 4
        qkv = Conv(out_ch, 1, use_bias=self.use_bias, name="qkv", **kw)(x)
        qkv = Conv(out_ch, 3, padding=1, groups=out_ch, use_bias=self.use_bias,
                   name="qkv_dwconv", **kw)(qkv)
        if self.gate_type is None:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            gate = None
        elif self.gate_type == "headwise":
            q = qkv[..., :c]
            gate = qkv[..., c : c + self.num_heads]
            k = qkv[..., c + self.num_heads : 2 * c + self.num_heads]
            v = qkv[..., 2 * c + self.num_heads :]
        else:
            q, gate, k, v = (qkv[..., :c], qkv[..., c : 2 * c],
                             qkv[..., 2 * c : 3 * c], qkv[..., 3 * c :])

        def hm(t):
            return t.reshape(b, h * w, heads, cph).transpose(0, 2, 3, 1)

        qh, kh, vh = hm(q), hm(k), hm(v)
        temp = self.param("temperature", nn.initializers.ones,
                          (heads, 1, 1), self.param_dtype)
        attn = normalized_channel_logits_tok_minor(qh, kh) * temp
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhcd,bhdt->bhct", attn, vh,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        if gate is not None:
            if self.gate_type == "headwise":
                g = gate.reshape(b, h * w, heads).transpose(0, 2, 1)[:, :, None, :]
            else:
                g = hm(gate)
            out = out * jax.nn.sigmoid(g)
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, c)
        return Conv(c, 1, use_bias=self.use_bias, name="project_out", **kw)(out)


class TransformerBlock(nn.Module):
    """model.py:214-226 (decoder block with GatedMDTA)."""

    dim: int
    num_heads: int
    expansion: float = 2.66
    use_bias: bool = False
    ln_type: str = "WithBias"
    gate_type: Optional[str] = None
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = x + GatedMDTA(self.dim, self.num_heads, self.use_bias,
                          self.gate_type, name="attn", **kw)(
            LayerNorm(self.ln_type, param_dtype=self.param_dtype, name="norm1")(x))
        x = x + GDFN(self.dim, self.expansion, self.use_bias, name="ffn", **kw)(
            LayerNorm(self.ln_type, param_dtype=self.param_dtype, name="norm2")(x))
        return x


class FrequencyAwareBlock(nn.Module):
    """model.py:329-449."""

    dim: int
    use_bias: bool = False
    dilation: int = 1
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.dim // 2
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        residual = x
        spatial_x, freq_x = jnp.split(x, 2, axis=-1)

        s = BatchNorm2d(name="spatial_branch_0", **kw)(spatial_x, train=train)
        s = gelu_tanh(s)
        s = DSConv(half, 3, self.dilation, self.use_bias,
                   name="spatial_branch_2", **kw)(s)
        s = BatchNorm2d(name="spatial_branch_3", **kw)(s, train=train)

        xf = jnp.fft.fft2(freq_x.astype(jnp.float32), axes=(1, 2))
        mp = jnp.concatenate([jnp.abs(xf), jnp.angle(xf)],
                             axis=-1).astype(x.dtype)
        f = Conv(half, 1, use_bias=self.use_bias,
                 name="fft_mag_phase_extract_0", **kw)(mp)
        f = BatchNorm2d(name="fft_mag_phase_extract_1", **kw)(f, train=train)
        f = gelu_tanh(f)

        g = jnp.mean(f, axis=(1, 2), keepdims=True)
        g = Conv(half, 1, use_bias=self.use_bias, name="freq_gate_1", **kw)(g)
        g = gelu_tanh(g)
        g = Conv(half * 2, 1, use_bias=self.use_bias, name="freq_gate_3", **kw)(g)
        g = jax.nn.sigmoid(g)
        low_w, high_w = jnp.split(g, 2, axis=-1)

        smooth = nn.avg_pool(f, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)])
        detail = f - smooth
        f = low_w * smooth + high_w * detail
        f = DSConv(half, 3, self.dilation, self.use_bias,
                   name="fft_conv_0", **kw)(f)
        f = BatchNorm2d(name="fft_conv_1", **kw)(f, train=train)

        fusion = jnp.concatenate([s, f], axis=-1)
        ca = Conv(self.dim // 4, 1, use_bias=self.use_bias,
                  name="cross_domain_attn_0", **kw)(fusion)
        ca = Conv(self.dim, 1, use_bias=self.use_bias,
                  name="cross_domain_attn_2", **kw)(gelu_tanh(ca))
        fusion = fusion * jax.nn.sigmoid(ca)
        fusion = ECA(name="eca", **kw)(fusion)
        return fusion + residual


class LightFFTDSConvBlock(nn.Module):
    """model.py:264-323."""

    dim: int
    use_bias: bool = False
    dilation: int = 1
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.dim // 2
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        residual = x
        spatial_x, fft_x = jnp.split(x, 2, axis=-1)

        s = BatchNorm2d(name="spatial_branch_0", **kw)(spatial_x, train=train)
        s = gelu_tanh(s)
        s = DSConv(half, 3, self.dilation, self.use_bias,
                   name="spatial_branch_2", **kw)(s)
        s = BatchNorm2d(name="spatial_branch_3", **kw)(s, train=train)

        xf = jnp.fft.fft2(fft_x.astype(jnp.float32), axes=(1, 2))
        ff = jnp.concatenate([jnp.real(xf), jnp.imag(xf)],
                             axis=-1).astype(x.dtype)
        f = Conv(half, 1, use_bias=self.use_bias, name="fft_branch_0", **kw)(ff)
        f = BatchNorm2d(name="fft_branch_1", **kw)(f, train=train)
        f = gelu_tanh(f)
        f = DSConv(half, 3, self.dilation, self.use_bias,
                   name="fft_branch_3", **kw)(f)
        f = BatchNorm2d(name="fft_branch_4", **kw)(f, train=train)

        fusion = jnp.concatenate([s, f], axis=-1)
        fusion = ECA(name="eca", **kw)(fusion)
        return fusion + residual


class UpKeep(nn.Module):
    """UpsampleKeepChannels (model.py:494-503)."""

    n_feat: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(self.n_feat * 4, 3, padding=1, use_bias=False, name="body_0",
                 dtype=self.dtype, param_dtype=self.param_dtype)(x)
        return pixel_shuffle(x, 2)


class DownKeep(nn.Module):
    """DownsampleKeepChannels (model.py:469-478)."""

    n_feat: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(self.n_feat // 4, 3, padding=1, use_bias=False, name="body_0",
                 dtype=self.dtype, param_dtype=self.param_dtype)(x)
        return pixel_unshuffle(x, 2)


class FPNFusion(nn.Module):
    """FPN_Fusion (model.py:507-548)."""

    dims: Sequence[int]
    use_bias: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lat = [Conv(self.dims[1], 1, use_bias=self.use_bias,
                    name=f"lateral_convs_{i}", **kw)(f)
               for i, f in enumerate(features)]
        fused = [lat[3]]
        for i, tgt in enumerate((2, 1, 0)):
            up = UpKeep(self.dims[1], name=f"upsamples_{i}", **kw)(fused[-1])
            fused.append(up + lat[tgt])
        fused = fused[::-1]
        return [Conv(self.dims[i], 3, padding=1, use_bias=self.use_bias,
                     name=f"output_convs_{i}", **kw)(f)
                for i, f in enumerate(fused)]


class PAFPNFusion(nn.Module):
    """PAFPN_Fusion (model.py:552-638)."""

    dims: Sequence[int]
    use_bias: bool = False
    task_aware: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.task_aware:
            weighted = []
            for i, f in enumerate(features):
                g = jnp.mean(f, axis=(1, 2), keepdims=True)
                g = Conv(self.dims[i] // 4, 1, use_bias=self.use_bias,
                         name=f"scale_attn_{i}_1", **kw)(g)
                g = Conv(self.dims[i], 1, use_bias=self.use_bias,
                         name=f"scale_attn_{i}_3", **kw)(gelu_tanh(g))
                weighted.append(f * jax.nn.sigmoid(g))
            features = weighted
        lat = [Conv(self.dims[1], 1, use_bias=self.use_bias,
                    name=f"lateral_convs_{i}", **kw)(f)
               for i, f in enumerate(features)]
        fused = [lat[3]]
        for i, tgt in enumerate((2, 1, 0)):
            up = UpKeep(self.dims[1], name=f"upsamples_{i}", **kw)(fused[-1])
            fused.append(up + lat[tgt])
        fused = fused[::-1]  # [l1, l2, l3, latent]
        enhanced = [fused[0]]
        for i in (0, 1):
            dn = DownKeep(self.dims[1], name=f"downsamples_{i}", **kw)(enhanced[-1])
            enhanced.append(dn + fused[i + 1])
        enhanced.append(fused[3])
        return [Conv(self.dims[i], 3, padding=1, use_bias=self.use_bias,
                     name=f"output_convs_{i}", **kw)(f)
                for i, f in enumerate(enhanced)]


@register_model("fpn_restormer")
class FPNRestormer(nn.Module):
    """Restormer_FFT_DSConv_Fusion (model.py:656-805)."""

    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    ln_type: str = "WithBias"
    dual_pixel_task: bool = False
    fusion_type: str = "PAFPN"  # 'None' | 'FPN' | 'PAFPN'
    gate_type: Optional[str] = None
    use_frequency_aware: bool = True
    task_aware_fusion: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inp_img, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d = self.dim
        dims = [d, d * 2, d * 4, d * 8]
        x = inp_img.astype(self.dtype) if self.dtype is not None else inp_img
        blk_cls = (FrequencyAwareBlock if self.use_frequency_aware
                   else LightFFTDSConvBlock)

        feats = Conv(d, 3, padding=1, use_bias=False, name="patch_embed", **kw)(x)
        inp1 = feats
        enc = feats
        dil = (1, 2, 4, 8)
        for b in range(self.num_blocks[0]):
            enc = blk_cls(dims[0], self.use_bias, dil[0],
                          name=f"encoder_level1_{b}", **kw)(enc, train=train)
        enc1 = enc
        enc = Downsample(dims[0], name="down1_2", **kw)(enc1)
        for b in range(self.num_blocks[1]):
            enc = blk_cls(dims[1], self.use_bias, dil[1],
                          name=f"encoder_level2_{b}", **kw)(enc, train=train)
        enc2 = enc
        enc = Downsample(dims[1], name="down2_3", **kw)(enc2)
        for b in range(self.num_blocks[2]):
            enc = blk_cls(dims[2], self.use_bias, dil[2],
                          name=f"encoder_level3_{b}", **kw)(enc, train=train)
        enc3 = enc
        enc = Downsample(dims[2], name="down3_4", **kw)(enc3)
        for b in range(self.num_blocks[3]):
            enc = blk_cls(dims[3], self.use_bias, dil[3],
                          name=f"latent_{b}", **kw)(enc, train=train)
        latent = enc

        if self.fusion_type == "FPN":
            f1, f2, f3, fl = FPNFusion(dims, self.use_bias,
                                       name="feature_fusion", **kw)(
                [enc1, enc2, enc3, latent])
        elif self.fusion_type == "PAFPN":
            f1, f2, f3, fl = PAFPNFusion(dims, self.use_bias,
                                         self.task_aware_fusion,
                                         name="feature_fusion", **kw)(
                [enc1, enc2, enc3, latent])
        else:
            f1, f2, f3, fl = enc1, enc2, enc3, latent

        dec3 = Upsample(dims[3], name="up4_3", **kw)(fl)
        dec3 = Conv(dims[2], 1, use_bias=self.use_bias,
                    name="reduce_chan_level3", **kw)(
            jnp.concatenate([dec3, f3], axis=-1))
        for b in range(self.num_blocks[2]):
            dec3 = TransformerBlock(dims[2], self.heads[2],
                                    self.ffn_expansion_factor, self.use_bias,
                                    self.ln_type, self.gate_type,
                                    name=f"decoder_level3_{b}", **kw)(dec3)
        dec2 = Upsample(dims[2], name="up3_2", **kw)(dec3)
        dec2 = Conv(dims[1], 1, use_bias=self.use_bias,
                    name="reduce_chan_level2", **kw)(
            jnp.concatenate([dec2, f2], axis=-1))
        for b in range(self.num_blocks[1]):
            dec2 = TransformerBlock(dims[1], self.heads[1],
                                    self.ffn_expansion_factor, self.use_bias,
                                    self.ln_type, self.gate_type,
                                    name=f"decoder_level2_{b}", **kw)(dec2)
        dec1 = Upsample(dims[1], name="up2_1", **kw)(dec2)
        dec1 = jnp.concatenate([dec1, f1], axis=-1)
        for b in range(self.num_blocks[0]):
            dec1 = TransformerBlock(dims[1], self.heads[0],
                                    self.ffn_expansion_factor, self.use_bias,
                                    self.ln_type, self.gate_type,
                                    name=f"decoder_level1_{b}", **kw)(dec1)
        for b in range(self.num_refinement_blocks):
            dec1 = TransformerBlock(dims[1], self.heads[0],
                                    self.ffn_expansion_factor, self.use_bias,
                                    self.ln_type, self.gate_type,
                                    name=f"refinement_{b}", **kw)(dec1)

        if self.dual_pixel_task:
            dec1 = dec1 + Conv(dims[1], 1, use_bias=self.use_bias,
                               name="skip_conv", **kw)(inp1)
            out = Conv(self.out_channels, 3, padding=1, use_bias=self.use_bias,
                       name="output", **kw)(dec1)
        else:
            out = Conv(self.out_channels, 3, padding=1, use_bias=self.use_bias,
                       name="output", **kw)(dec1) + x
        return out.astype(jnp.float32)
