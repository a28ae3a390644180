"""DACG-IR (the repo owner's main research line), TPU-native (reference
20260104_CG_IR/src/net/model.py).

Restormer U-Net where every block is context-conditioned:
* Degradation_Aware_Module (:164-236): multi-scale dwconv stem -> spatial
  gate -> mean+std statistics pooling -> global context vector + per-level
  prompts
* Context_Adaptive_Gated_Attention (:337-433): MDTA with context-predicted
  per-head log-temperature and context-predicted per-channel sigmoid output
  gate
* CGDM (:237-315): dual-domain modulation — rfft2 -> 1x1 convs on
  [real; imag] blocks -> context-sigmoid scale -> irfft2, plus a spatial
  dwconv branch
* Adaptive_Gated_Fusion (:84-163): joint spatial+channel gate on the encoder
  skip before fusion.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_restoration_tpu.models.registry import register_model
from image_restoration_tpu.ops.attention import normalized_channel_logits
from image_restoration_tpu.ops.common import Conv, gelu_exact
from image_restoration_tpu.ops.ffn import GDFN
from image_restoration_tpu.ops.layernorm import LayerNorm, WithBiasLayerNorm
from image_restoration_tpu.ops.resample import Downsample, Upsample


class DegradationAwareModule(nn.Module):
    context_dim: int = 64
    num_scales: int = 3
    dim_list: Sequence[int] = (48, 96, 192, 384)
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        inter = 48
        x = gelu_exact(Conv(inter, 3, padding=1, use_bias=True, name="stem_0", **kw)(img))
        feats = []
        for s in range(self.num_scales):
            k = 2 * s + 3
            h = Conv(inter, k, padding=k // 2, groups=inter, use_bias=True,
                     name=f"scale_branches_{s}_0", **kw)(x)
            h = Conv(inter, 1, use_bias=True, name=f"scale_branches_{s}_1", **kw)(h)
            feats.append(h)
        feat = Conv(self.context_dim, 1, use_bias=True, name="fusion", **kw)(
            jnp.concatenate(feats, axis=-1))
        gate = jax.nn.sigmoid(Conv(1, 1, use_bias=True, name="spatial_gate", **kw)(feat))
        feat = feat * gate
        avg = jnp.mean(feat, axis=(1, 2))
        std = jnp.std(feat.astype(jnp.float32), axis=(1, 2), ddof=1).astype(avg.dtype)
        g = jnp.concatenate([avg, std], axis=-1)
        g = nn.Dense(self.context_dim, name="global_process_0", **kw)(g)
        g = WithBiasLayerNorm(param_dtype=self.param_dtype, name="global_process_1")(g)
        g = gelu_exact(g)
        g = nn.Dense(self.context_dim, name="global_process_3", **kw)(g)
        prompts = [nn.Dense(d, name=f"layer_prompts_{i}", **kw)(g)
                   for i, d in enumerate(self.dim_list)]
        return prompts, g


class AdaptiveGatedFusion(nn.Module):
    """(:84-163)."""

    in_dim: int
    out_dim: int | None = None
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f_enc, f_dec):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d = self.in_dim
        out_dim = self.out_dim or d
        comb = jnp.concatenate([f_enc, f_dec], axis=-1)
        s = Conv(d, 1, use_bias=True, name="spatial_gate_0", **kw)(comb)
        s = nn.GroupNorm(num_groups=min(8, d), epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="spatial_gate_1")(s)
        s = nn.relu(s)
        s = Conv(d, 3, padding=1, groups=d, use_bias=True, name="spatial_gate_3", **kw)(s)
        s = nn.relu(s)
        s = Conv(d, 1, use_bias=True, name="spatial_gate_5", **kw)(s)
        y = jnp.mean(comb, axis=(1, 2))
        c = nn.Dense(d // 2, name="channel_gate_0", **kw)(y)
        c = nn.Dense(d, name="channel_gate_2", **kw)(nn.relu(c))
        attn = jax.nn.sigmoid(s + c[:, None, None, :])
        filtered = f_enc * attn
        out = jnp.concatenate([filtered, f_dec], axis=-1)
        return gelu_exact(Conv(out_dim, 1, use_bias=True, name="fusion_conv_0", **kw)(out))


class CGDM(nn.Module):
    """Context-gated dual-domain modulation (:237-315). FFT in fp32,
    [real; imag] as channel BLOCKS (not interleaved)."""

    dim: int
    context_dim: int = 64
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, global_feat):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d = self.dim
        h, w = x.shape[1:3]
        sp = Conv(d, 3, padding=1, groups=d, use_bias=True, name="spatial_conv_0", **kw)(x)
        sp = Conv(d, 1, use_bias=True, name="spatial_conv_2", **kw)(gelu_exact(sp))

        from image_restoration_tpu.ops.fft import irfft2_fast, rfft2_fast

        zr, zi = rfft2_fast(x, norm="ortho")
        f = jnp.concatenate([zr, zi], axis=-1)  # (B,h,w2,2d) blocks
        f = Conv(d * 2, 1, use_bias=True, dtype=jnp.float32,
                 param_dtype=self.param_dtype, name="freq_conv_0")(f)
        f = Conv(d * 2, 1, use_bias=True, dtype=jnp.float32,
                 param_dtype=self.param_dtype, name="freq_conv_2")(nn.leaky_relu(f, 0.1))
        scale = nn.Dense(d, name="context_mapper_0", **kw)(global_feat)
        scale = nn.Dense(d * 2, name="context_mapper_2", **kw)(nn.relu(scale))
        scale = jax.nn.sigmoid(scale.astype(jnp.float32))[:, None, None, :]
        f = f * scale
        re, im = jnp.split(f, 2, axis=-1)
        back = irfft2_fast(re, im, (h, w), norm="ortho", dtype=x.dtype)
        out = Conv(d, 1, use_bias=True, name="fusion", **kw)(
            jnp.concatenate([sp, back], axis=-1))
        return out + x


class _CGAttnParams(nn.Module):
    """Param twin of ContextAdaptiveGatedAttention for the fused-block path:
    same flax param names (checkpoint-importer compatible), but instead of
    running attention it computes the per-sample total temperature and output
    gate (tiny context MLPs, plain XLA) and returns the conv weights for the
    canvas kernel."""

    dim: int
    num_heads: int
    use_bias: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, context_emb):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        heads = self.num_heads
        log_base = self.param("log_base_temperature", nn.initializers.zeros,
                              (heads, 1, 1), self.param_dtype)
        log_delta = nn.Dense(self.dim // 4, name="temp_adapter_0", **kw)(context_emb)
        log_delta = nn.Dense(heads, name="temp_adapter_2", **kw)(nn.relu(log_delta))
        temp = jnp.exp(log_base.reshape(1, heads).astype(jnp.float32)
                       + log_delta.astype(jnp.float32))  # (b, heads)
        gate = nn.Dense(self.dim, name="attn_output_gate_0", **kw)(context_emb)
        gate = jax.nn.sigmoid(gate.astype(jnp.float32))  # (b, c)
        from image_restoration_tpu.ops.common import ConvParams

        wq, bq = ConvParams(3 * self.dim, self.dim, 1, self.use_bias,
                            self.param_dtype, name="qkv")()
        wd, bd = ConvParams(3 * self.dim, 1, 3, self.use_bias,
                            self.param_dtype, name="qkv_dwconv")()
        wo, bo = ConvParams(self.dim, self.dim, 1, self.use_bias,
                            self.param_dtype, name="project_out")()
        return temp, gate, wq, bq, wd, bd, wo, bo


class ContextAdaptiveGatedAttention(nn.Module):
    """(:337-433)."""

    dim: int
    num_heads: int
    use_bias: bool = False
    context_dim: int = 64
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context_emb):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, h, w, c = x.shape
        heads = self.num_heads
        ch = c // heads
        log_base = self.param("log_base_temperature", nn.initializers.zeros,
                              (heads, 1, 1), self.param_dtype)
        log_delta = nn.Dense(self.dim // 4, name="temp_adapter_0", **kw)(context_emb)
        log_delta = nn.Dense(heads, name="temp_adapter_2", **kw)(nn.relu(log_delta))
        total_temp = jnp.exp(
            log_base.reshape(1, heads, 1, 1).astype(jnp.float32)
            + log_delta.reshape(b, heads, 1, 1).astype(jnp.float32))
        gate = nn.Dense(self.dim, name="attn_output_gate_0", **kw)(context_emb)
        gate = jax.nn.sigmoid(gate.reshape(b, 1, 1, c))  # broadcast over HW

        qkv = Conv(c * 3, 1, use_bias=self.use_bias, name="qkv", **kw)(x)
        qkv = Conv(c * 3, 3, padding=1, groups=c * 3, use_bias=self.use_bias,
                   name="qkv_dwconv", **kw)(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(b, h * w, heads, ch)

        attn = normalized_channel_logits(split_heads(q),
                                         split_heads(k)) * total_temp
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhcd,bnhd->bnhc", attn, split_heads(v),
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(b, h, w, c) * gate.astype(x.dtype)
        return Conv(c, 1, use_bias=self.use_bias, name="project_out", **kw)(out)


class CGTB(nn.Module):
    dim: int
    num_heads: int
    expansion: float = 2.66
    use_bias: bool = False
    ln_type: str = "WithBias"
    context_dim: int = 64
    fused_block: bool = False  # whole-block 2-pass canvas kernel
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context_emb, w_real: int | None = None):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.fused_block:
            # CGTB is MDTA+GDFN with two per-sample twists, both of which
            # fold into the canvas kernel's plain-XLA finalize: the
            # context-predicted temperature is per-(b, heads), and the
            # per-(b, c) output gate becomes A^T diag(gate) W_proj.
            from image_restoration_tpu.kernels.block_pallas import fused_block
            from image_restoration_tpu.models.restormer import (
                _GDFNParams,
                _LNParams,
            )

            d = self.dim
            lnw1, lnb1 = _LNParams(self.ln_type, self.param_dtype,
                                   name="norm1")(d)
            temp, gate, wq, bq, wd, bd, wo, bo = _CGAttnParams(
                d, self.num_heads, self.use_bias, name="attn", **kw)(context_emb)
            lnw2, lnb2 = _LNParams(self.ln_type, self.param_dtype,
                                   name="norm2")(d)
            w_in, b_in, w_dw2, b_dw2, w_out, b_out = _GDFNParams(
                d, self.expansion, self.use_bias, self.param_dtype,
                name="ffn")()
            params = (lnw1, lnb1, wq, bq, wd, bd, temp, wo, bo, lnw2, lnb2,
                      w_in, b_in, w_dw2, b_dw2, w_out, b_out)
            return fused_block(
                x, params, (d, w_real, self.num_heads, self.ln_type, 1e-5),
                gate)
        x = x + ContextAdaptiveGatedAttention(
            self.dim, self.num_heads, self.use_bias, self.context_dim,
            name="attn", **kw)(
            LayerNorm(self.ln_type, param_dtype=self.param_dtype, name="norm1")(x),
            context_emb)
        x = x + GDFN(self.dim, self.expansion, self.use_bias, name="ffn", **kw)(
            LayerNorm(self.ln_type, param_dtype=self.param_dtype, name="norm2")(x))
        return x


class _CGScanCell(nn.Module):
    """Scan body for a CG-IR block stack: (canvas, broadcast prompt) carry."""

    dim: int
    num_heads: int
    expansion: float
    use_bias: bool
    ln_type: str
    context_dim: int
    fused_block: bool
    w_real: int | None
    dtype: Any
    param_dtype: Any

    @nn.compact
    def __call__(self, x, prompt):
        blk = CGTB(self.dim, self.num_heads, self.expansion, self.use_bias,
                   self.ln_type, self.context_dim,
                   fused_block=self.fused_block, dtype=self.dtype,
                   param_dtype=self.param_dtype, name="block")
        return blk(x, prompt, w_real=self.w_real), None


@register_model("cg_ir")
class DACG_IR(nn.Module):
    """(:459-640)."""

    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    ln_type: str = "WithBias"
    context_dim: int = 64
    num_scales: int = 3
    fused_block: bool = False  # whole-block 2-pass canvas kernel (serving)
    scan_blocks: bool = False  # nn.scan per stack (fast compile)
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inp_img):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        dims = [self.dim * 2**i for i in range(4)]
        x = inp_img.astype(self.dtype) if self.dtype is not None else inp_img

        prompts, gfeat = DegradationAwareModule(
            self.context_dim, self.num_scales, dims, name="context_net", **kw)(x)
        p1, p2, p3, p4 = prompts

        def blocks(t, d, hd, n, ctx, prompt, prefix):
            w = t.shape[2]
            if self.fused_block:
                from image_restoration_tpu.kernels.block_pallas import (
                    canvas_pad,
                    canvas_unpad,
                )

                t = canvas_pad(t)
            if self.scan_blocks:
                cell = nn.scan(
                    _CGScanCell,
                    variable_axes={"params": 0},
                    split_rngs={"params": True},
                    in_axes=(nn.broadcast,),
                    length=n,
                )(d, hd, self.ffn_expansion_factor, self.use_bias,
                  self.ln_type, ctx, self.fused_block,
                  w if self.fused_block else None, self.dtype,
                  self.param_dtype, name=f"{prefix}_scan")
                t, _ = cell(t, prompt)
            else:
                for i in range(n):
                    blk = CGTB(d, hd, self.ffn_expansion_factor, self.use_bias,
                               self.ln_type, ctx,
                               fused_block=self.fused_block,
                               name=f"{prefix}_{i}", **kw)
                    t = blk(t, prompt, w_real=w if self.fused_block else None)
            if self.fused_block:
                t = canvas_unpad(t, w, d)
            return t

        feats = Conv(dims[0], 3, padding=1, use_bias=self.use_bias,
                     name="patch_embed", **kw)(x)
        enc1 = blocks(feats, dims[0], self.heads[0], self.num_blocks[0],
                      dims[0], p1, "encoder_level1")
        enc2 = Downsample(dims[0], name="down1_2", **kw)(enc1)
        enc2 = blocks(enc2, dims[1], self.heads[1], self.num_blocks[1],
                      dims[1], p2, "encoder_level2")
        enc3 = Downsample(dims[1], name="down2_3", **kw)(enc2)
        enc3 = blocks(enc3, dims[2], self.heads[2], self.num_blocks[2],
                      dims[2], p3, "encoder_level3")
        latent = Downsample(dims[2], name="down3_4", **kw)(enc3)
        latent = blocks(latent, dims[3], self.heads[3], self.num_blocks[3],
                        dims[3], p4, "latent")
        latent = CGDM(dims[3], self.context_dim, name="freq_fusion", **kw)(latent, gfeat)

        dec3 = Upsample(dims[3], name="up4_3", **kw)(latent)
        dec3 = AdaptiveGatedFusion(dims[2], name="skip_fusion3", **kw)(enc3, dec3)
        dec3 = blocks(dec3, dims[2], self.heads[2], self.num_blocks[2],
                      dims[2], p3, "decoder_level3")
        dec2 = Upsample(dims[2], name="up3_2", **kw)(dec3)
        dec2 = AdaptiveGatedFusion(dims[1], name="skip_fusion2", **kw)(enc2, dec2)
        dec2 = blocks(dec2, dims[1], self.heads[1], self.num_blocks[1],
                      dims[1], p2, "decoder_level2")
        dec1 = Upsample(dims[1], name="up2_1", **kw)(dec2)
        dec1 = AdaptiveGatedFusion(dims[0], out_dim=dims[1],
                                   name="skip_fusion1", **kw)(enc1, dec1)
        dec1 = blocks(dec1, dims[1], self.heads[0], self.num_blocks[0],
                      dims[1], p2, "decoder_level1")
        dec1 = blocks(dec1, dims[1], self.heads[0], self.num_refinement_blocks,
                      dims[1], p2, "refinement")
        out = Conv(self.out_channels, 3, padding=1, use_bias=self.use_bias,
                   name="output", **kw)(dec1) + x
        return out.astype(jnp.float32)
