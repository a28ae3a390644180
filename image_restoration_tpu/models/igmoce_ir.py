"""IGMoCE-IR, TPU-native (reference IGMoCE-IR-main/src/net/igmoce_ir.py).

Illumination-guided MoCE: Retinexformer-style estimator modulates the input
(x*illu_map + x) and feeds an illumination stream down the encoder; encoder
blocks split channels even/odd into a SpAM gate branch (NAFNet dilated
dwconvs + SCA) and an IG_MSA attention branch (illumination-modulated V),
fused spatially AND spectrally; decoder reuses the MoCE complexity-expert
MoE (image gate only — the freq gate exists in checkpoints but is unused,
igmoce_ir.py RoutingFunction.forward).

Reference quirks preserved: the FFN residual is anchored on the *normed*
tensor (EncoderBlock.forward reassigns F_fuse = norm(F_fuse)); the
frequency-fusion output (dim/2 channels) is channel-tiled x2.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_restoration_tpu.models.adair import ChannelCrossAttention
from image_restoration_tpu.models.moce_ir import (
    FFTAttention,
    ModExpert,
    RoutingFunction,
    _expert_schedules,
    expert_param_count,
)
from image_restoration_tpu.models.registry import register_model
from image_restoration_tpu.ops.common import Conv, GroupedConv, simple_gate
from image_restoration_tpu.ops.ffn import GDFN
from image_restoration_tpu.ops.illumination import (
    AdaptiveIlluminationModulator,
    IlluminationEstimator,
)
from image_restoration_tpu.ops.layernorm import BiasFreeLayerNorm, WithBiasLayerNorm
from image_restoration_tpu.ops.moe import dense_moe_combine
from image_restoration_tpu.ops.resample import Downsample, Upsample


class HolisticLayerNorm(nn.Module):
    """LN over (HW, C) jointly (igmoce_ir.py:490-516); with/without bias."""

    with_bias: bool = True
    eps: float = 1e-5
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,), self.param_dtype)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(xf, axis=(1, 2, 3), keepdims=True)
        y = (xf - mu) / jnp.sqrt(var + self.eps) * w
        if self.with_bias:
            b = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
            y = y + b
        return y.astype(x.dtype)


class LN(nn.Module):
    """LayerNorm dispatcher incl. holistic variants (igmoce_ir.py:517-537)."""

    ln_type: str = "WithBias"
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        t = self.ln_type
        if t == "BiasFree":
            return BiasFreeLayerNorm(param_dtype=self.param_dtype, name="body")(x)
        if t == "WithBias":
            return WithBiasLayerNorm(param_dtype=self.param_dtype, name="body")(x)
        if t in ("HolisticWithBias", "WithBias_Holistic_LayerNorm"):
            return HolisticLayerNorm(True, param_dtype=self.param_dtype, name="body")(x)
        if t in ("HolisticBiasFree", "BiasFree_Holistic_LayerNorm"):
            return HolisticLayerNorm(False, param_dtype=self.param_dtype, name="body")(x)
        raise NotImplementedError(t)


class FreMLPExp(nn.Module):
    """FreMLP with expansion/bias (igmoce_ir.py:130-150): MLP on the rfft2
    magnitude, phase preserved, fp32 island."""

    dim: int
    expansion: int = 2
    use_bias: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1:3]
        from image_restoration_tpu.ops.fft import irfft2_fast, rfft2_fast

        zr, zi = rfft2_fast(x, norm="backward")
        mag, pha = jnp.sqrt(zr * zr + zi * zi), jnp.arctan2(zi, zr)
        m = Conv(self.dim * self.expansion, 1, use_bias=self.use_bias,
                 dtype=jnp.float32, param_dtype=self.param_dtype,
                 name="process1_0")(mag)
        m = Conv(self.dim, 1, use_bias=self.use_bias, dtype=jnp.float32,
                 param_dtype=self.param_dtype, name="process1_2")(nn.leaky_relu(m, 0.1))
        return irfft2_fast(m * jnp.cos(pha), m * jnp.sin(pha), (h, w),
                           norm="backward", dtype=x.dtype)


class SpAM(nn.Module):
    """NAFNet-style spatial attention module (igmoce_ir.py:381-426)."""

    dim: int
    dw_expand: int = 2
    dilations: Sequence[int] = (1,)
    extra_depth_wise: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inp):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d, dw = self.dim, self.dw_expand * self.dim
        x = inp
        if self.extra_depth_wise:
            x = Conv(d, 3, padding=1, groups=d, use_bias=True, name="extra_conv", **kw)(x)
        x = Conv(dw, 1, use_bias=True, name="conv1", **kw)(x)
        z = 0.0
        for i, dil in enumerate(self.dilations):
            z = z + GroupedConv(dw, (3, 3), padding=[(dil, dil)] * 2,
                                kernel_dilation=(dil, dil), feature_group_count=dw,
                                use_bias=True, dtype=self.dtype,
                                param_dtype=self.param_dtype, name=f"branches_{i}")(x)
        z = simple_gate(z)
        sca = jnp.mean(z, axis=(1, 2), keepdims=True)
        sca = Conv(dw // 2, 1, use_bias=True, name="sca_1", **kw)(sca)
        x = Conv(d, 1, use_bias=True, name="conv3", **kw)(sca * z)
        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, d), self.param_dtype)
        return inp + beta.astype(x.dtype) * x


class IG_MSA(nn.Module):
    """Illumination-guided MDTA: V scaled by a learned modulation of the
    illumination features; dwconv positional branch (igmoce_ir.py:283-343)."""

    dim: int
    num_heads: int
    use_bias: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, illu_fea):
        from image_restoration_tpu.ops.attention import normalized_channel_logits
        from image_restoration_tpu.ops.common import gelu_exact

        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, h, w, c = x.shape
        heads = self.num_heads
        ch = c // heads
        temperature = self.param("temperature", nn.initializers.ones,
                                 (heads, 1, 1), self.param_dtype)
        illu_mod = AdaptiveIlluminationModulator(
            c, name="illumination_modulator", **kw)(illu_fea)
        qkv = Conv(c * 3, 1, use_bias=self.use_bias, name="qkv", **kw)(x)
        qkv = Conv(c * 3, 3, padding=1, groups=c * 3, use_bias=self.use_bias,
                   name="qkv_dwconv", **kw)(qkv)
        q, k, v_inp = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(b, h * w, heads, ch)

        attn = normalized_channel_logits(split_heads(q), split_heads(k))
        attn = jax.nn.softmax(
            attn * temperature.reshape(1, heads, 1, 1).astype(jnp.float32), axis=-1
        ).astype(x.dtype)
        v = split_heads(v_inp * illu_mod)
        out = jnp.einsum("bhcd,bnhd->bnhc", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(b, h, w, c)
        out_c = Conv(c, 1, use_bias=self.use_bias, name="proj", **kw)(out)
        pos = Conv(c, 3, padding=1, groups=c, use_bias=False, name="pos_emb_0", **kw)(v_inp)
        pos = Conv(c, 3, padding=1, groups=c, use_bias=False, name="pos_emb_2", **kw)(gelu_exact(pos))
        return out_c + pos


class IGEncoderBlock(nn.Module):
    """Even/odd channel split -> SpAM gate + IG_MSA attention, dual-domain
    fusion, FreMLP FFN (igmoce_ir.py:538-612)."""

    dim: int
    num_heads: int
    expansion: int = 2
    use_bias: bool = True
    ln_type: str = "HolisticWithBias"
    dw_expand: int = 2
    dilations: Sequence[int] = (1, 2, 4)
    fusion_weight: float = 0.5
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, illu_fea):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, h, w, c = x.shape
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, c), self.param_dtype)
        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, c), self.param_dtype)
        shortcut = x
        xn = LN(self.ln_type, self.param_dtype, name="norms_0")(x)
        attn = xn[..., 1::2]
        gate = xn[..., 0::2]
        attn = LN(self.ln_type, self.param_dtype, name="norms_1")(attn)
        gate = LN(self.ln_type, self.param_dtype, name="norms_2")(gate)
        f_att = IG_MSA(c // 2, self.num_heads, self.use_bias, name="mixer", **kw)(attn, illu_fea)
        f_gate = SpAM(c // 2, self.dw_expand, self.dilations, name="spam", **kw)(gate)
        # spatial fusion
        f_s = jnp.concatenate([f_att + jax.nn.sigmoid(f_gate),
                               f_gate + jax.nn.sigmoid(f_att)], axis=-1)
        # "frequency fusion" (igmoce_ir.py:222-224) — irfft2(rfft2(a)+rfft2(b))
        # is exactly a+b by linearity; the reference's FFT round-trip is a
        # mathematical no-op, computed directly here (fp32 to match roundoff)
        f_f = (f_att.astype(jnp.float32) + f_gate.astype(jnp.float32)).astype(x.dtype)
        f_f = jnp.tile(f_f, (1, 1, 1, 2))
        fuse = self.fusion_weight * f_s + (1 - self.fusion_weight) * f_f
        fuse = fuse * gamma.astype(x.dtype) + shortcut
        # NB: reference anchors the FFN residual on the NORMED tensor
        fuse = LN(self.ln_type, self.param_dtype, name="norms_3")(fuse)
        out = FreMLPExp(c, self.expansion, self.use_bias, name="ffn", **kw)(fuse)
        return fuse + beta.astype(x.dtype) * out


class IGAdapterLayer(nn.Module):
    """MoCE adapter with image-only gating (freq gate unused in reference)."""

    dim: int
    rank: int
    num_experts: int = 4
    top_k: int = 1
    stage_depth: int = 1
    depth_type: Any = "lin"
    rank_type: str = "constant"
    with_complexity: bool = False
    complexity_scale: str = "max"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, shared, train: bool = False):
        patches, kernels, depths, ranks = _expert_schedules(
            self.num_experts, self.stage_depth, self.rank, self.dim,
            self.depth_type, self.rank_type)
        counts = [expert_param_count(self.dim, r) for r in ranks]
        denom = min(counts) if self.complexity_scale == "min" else max(counts)
        complexity = tuple(cc / denom for cc in counts)
        gates, _, _, aux = RoutingFunction(
            self.dim, self.dim, self.num_experts, self.top_k, complexity,
            self.with_complexity, dtype=self.dtype, param_dtype=self.param_dtype,
            use_freq_gate=False, name="routing")(x, None, train=train)
        outs = [
            ModExpert(self.dim, rank=r, patch_size=p, kernel_size=k, depth=d,
                      dtype=self.dtype, param_dtype=self.param_dtype,
                      name=f"experts_{i}_0")(x, shared)
            for i, (r, p, k, d) in enumerate(zip(ranks, patches, kernels, depths))
        ]
        out = dense_moe_combine(gates, outs)
        out = Conv(self.dim, 1, use_bias=False, dtype=self.dtype,
                   param_dtype=self.param_dtype, name="proj_out")(out)
        return out, aux


class IGDecoderBlock(nn.Module):
    dim: int
    num_heads: int
    expansion: int = 2
    use_bias: bool = False
    ln_type: str = "HolisticWithBias"
    rank: int = 2
    num_experts: int = 4
    top_k: int = 1
    stage_depth: int = 1
    depth_type: Any = "lin"
    rank_type: str = "constant"
    with_complexity: bool = False
    complexity_scale: str = "max"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        shortcut = x
        xn = LN(self.ln_type, self.param_dtype, name="norms_0")(x)
        x_s = Conv(self.dim, 1, use_bias=True, name="proj_0", **kw)(xn)
        x_a = Conv(self.dim, 1, use_bias=True, name="proj_1", **kw)(xn)
        x_s = SpAM(self.dim, 2, (1, 2, 4), name="shared", **kw)(x_s)
        x_a, aux = IGAdapterLayer(
            self.dim, self.rank, self.num_experts, self.top_k, self.stage_depth,
            self.depth_type, self.rank_type, self.with_complexity,
            self.complexity_scale, name="adapter", **kw)(x_a, x_s, train=train)
        x = ChannelCrossAttention(self.dim, self.num_heads, self.use_bias,
                                  kv_kernel=7, name="mixer", **kw)(x_a, x_s) + shortcut
        x = x + GDFN(self.dim, self.expansion, self.use_bias, name="ffn", **kw)(
            LN(self.ln_type, self.param_dtype, name="norms_1")(x))
        return x, aux


@register_model("igmoce_ir")
class IGMoCEIR(nn.Module):
    """igmoce_ir.py:1008-1142."""

    # class-level flag (not a dataclass field): the trainer derives the
    # train=True apply set from this instead of a hardcoded name list
    uses_moe_rng = True

    in_channels: int = 3
    out_channels: int = 3
    dim: int = 32
    levels: int = 4
    heads: Sequence[int] = (1, 1, 1, 1)
    num_blocks: Sequence[int] = (1, 1, 1, 3)
    num_dec_blocks: Sequence[int] = (1, 1, 1)
    ffn_expansion_factor: int = 2
    ln_type: str = "HolisticWithBias"
    dw_expand: int = 2
    dilations: Sequence[int] = (1, 4, 9)
    fusion_weight: float = 0.5
    use_bias: bool = False
    rank: int = 2
    num_experts: int = 4
    depth_type: Any = "lin"
    stage_depth: Sequence[int] = (3, 2, 1)
    rank_type: str = "constant"
    topk: int = 1
    with_complexity: bool = False
    complexity_scale: str = "max"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d = self.dim
        dims = [d * 2**i for i in range(self.levels)]
        x = img.astype(self.dtype) if self.dtype is not None else img

        _, illu_map = IlluminationEstimator(d, name="estimator", **kw)(x)
        illu_fea = Conv(d // 2, 3, padding=1, use_bias=True,
                        name="illu_patch_embed", **kw)(illu_map)
        x = x * illu_map + x
        feats = Conv(d, 3, padding=1, use_bias=False, name="patch_embed", **kw)(x)

        enc_feats = []
        for i in range(self.levels - 1):
            for b in range(self.num_blocks[i]):
                feats = IGEncoderBlock(
                    dims[i], self.heads[i], self.ffn_expansion_factor, True,
                    self.ln_type, self.dw_expand, self.dilations,
                    self.fusion_weight, name=f"enc_{i}_0_{b}", **kw)(feats, illu_fea)
            enc_feats.append(feats)
            feats = Downsample(dims[i], name=f"enc_{i}_1", **kw)(feats)
            illu_fea = Downsample(d // 2 * 2**i, name=f"illu_downsamples_{i}",
                                  **kw)(illu_fea)

        for b in range(self.num_blocks[-1]):
            feats = IGEncoderBlock(
                dims[-1], self.heads[-1], self.ffn_expansion_factor, True,
                self.ln_type, self.dw_expand, self.dilations,
                self.fusion_weight, name=f"latent_{b}", **kw)(feats, illu_fea)

        rdims = dims[::-1]
        rheads = list(self.heads)[::-1]
        rdec = list(self.num_dec_blocks)[::-1]
        total_aux = 0.0
        for i in range(self.levels - 1):
            feats = Upsample(rdims[i], name=f"dec_{i}_0", **kw)(feats)
            feats = jnp.concatenate([feats, enc_feats.pop()], axis=-1)
            feats = Conv(rdims[i + 1], 1, use_bias=self.use_bias,
                         name=f"dec_{i}_1", **kw)(feats)
            for b in range(rdec[i]):
                feats, aux = IGDecoderBlock(
                    rdims[i + 1], rheads[i + 1], self.ffn_expansion_factor,
                    self.use_bias, self.ln_type, rank=self.rank,
                    num_experts=self.num_experts, top_k=self.topk,
                    stage_depth=self.stage_depth[i], depth_type=self.depth_type,
                    rank_type=self.rank_type,
                    with_complexity=self.with_complexity,
                    complexity_scale=self.complexity_scale,
                    name=f"dec_{i}_2_{b}", **kw)(feats, train=train)
                total_aux = total_aux + aux

        out = Conv(self.out_channels, 3, padding=1, use_bias=self.use_bias,
                   name="output", **kw)(feats)
        out = (out + img.astype(out.dtype)).astype(jnp.float32)
        aux_total = total_aux / sum(self.num_dec_blocks)
        if train:
            return out, {"aux_loss": aux_total}
        return out


def igmoce_key_map(key: str):
    """Flatten 'layers' nesting, drop unused routing buffers and the unused
    freq_gate, skip BasicConv's 'main' Sequential."""
    if key.endswith("routing.complexity") or ".routing.freq_gate." in key:
        return None
    return key.replace(".layers.", ".").replace(".main.0.", ".")
