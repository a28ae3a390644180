"""RectiFormer, TPU-native (NHWC, flax) — the owner's prompt-modulated
Restormer experiment (experiment/RectiFormer.py).

* ``MSDRNet_NoModal`` (:63-108): multi-scale strided conv stem -> GAP ->
  MLP global degradation vector + per-level prompt projections.
* ``MDPM`` (:111-146): prompt modulation — channel affine (1+gamma, beta),
  spatial attention map from a prompt-scaled feature, and a sigmoid*2
  dynamic attention temperature.
* ``ElementwiseGatedAttention`` (:270-325): MDTA whose output is gated by a
  dwconv+1x1 sigmoid branch; temperature multiplied by the dynamic factor.
* ``GatedSpatialFFN`` (:231-266): dual dwconv branches, sigmoid gate x GELU
  content.
* ``DGSB`` bottleneck (:154-228): Gaussian-masked rfft high/low split with
  1x1 complex convs, dwconv spatial branch, softmax degradation-weighted
  3-way fusion (the Gaussian mask is centered at (f_h//2, f_w//2) of the
  UN-shifted rfft grid, exactly as the reference computes it).
* asymmetric encoder/decoder U-Net assembly (:396-603).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from image_restoration_tpu.models.registry import register_model
from image_restoration_tpu.ops.attention import normalized_channel_logits_tok_minor
from image_restoration_tpu.ops.common import Conv, gelu_exact
from image_restoration_tpu.ops.layernorm import LayerNorm
from image_restoration_tpu.ops.resample import Downsample, Upsample


class MSDRNet(nn.Module):
    """MSDRNet_NoModal (RectiFormer.py:63-108)."""

    context_dim: int = 64
    num_scales: int = 3
    dim_list: Sequence[int] = (48, 96, 192, 384)
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        feats = [
            Conv(16, 2 * s + 1, padding=s, stride=2, use_bias=True,
                 name=f"scale_convs_{s}", **kw)(x)
            for s in range(self.num_scales)
        ]
        feat = Conv(self.context_dim, 1, use_bias=True, name="fusion", **kw)(
            jnp.concatenate(feats, axis=-1))
        g = jnp.mean(feat, axis=(1, 2))
        g = nn.Dense(self.context_dim * 2, name="global_process_0", **kw)(g)
        g = nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype,
                         name="global_process_1")(g)
        g = gelu_exact(g)
        g = nn.Dense(self.context_dim, name="global_process_3", **kw)(g)
        prompts = [
            nn.Dense(d, name=f"layer_prompts_{i}", **kw)(g)
            for i, d in enumerate(self.dim_list)
        ]
        return prompts, g


class MDPM(nn.Module):
    """RectiFormer.py:111-146."""

    dim: int
    context_dim: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context_emb):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        gb = nn.Dense(self.dim * 2, name="channel_proj", **kw)(context_emb)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        x = x * (1 + gamma[:, None, None, :]) + beta[:, None, None, :]
        s_emb = nn.Dense(self.dim, name="spatial_proj", **kw)(context_emb)
        s_feat = x * s_emb[:, None, None, :]
        s_attn = Conv(1, 3, padding=1, use_bias=True, name="spatial_conv",
                      **kw)(gelu_exact(s_feat))
        x = x * s_attn
        temp = nn.Dense(1, name="temp_proj", **kw)(context_emb)
        dyn = jax.nn.sigmoid(temp[:, 0]) * 2.0  # (B,)
        return x, dyn[:, None, None, None]


class ElementwiseGatedAttention(nn.Module):
    """RectiFormer.py:270-325."""

    dim: int
    num_heads: int
    use_bias: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, dynamic_temp=None):
        b, h, w, c = x.shape
        heads, cph = self.num_heads, c // self.num_heads
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        qkv = Conv(3 * c, 1, use_bias=self.use_bias, name="qkv", **kw)(x)
        qkv = Conv(3 * c, 3, padding=1, groups=3 * c, use_bias=self.use_bias,
                   name="qkv_dwconv", **kw)(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        gate = Conv(c, 3, padding=1, groups=c, use_bias=self.use_bias,
                    name="gate_generator_0", **kw)(x)
        gate = Conv(c, 1, use_bias=self.use_bias,
                    name="gate_generator_1", **kw)(gate)

        def hm(t):
            return t.reshape(b, h * w, heads, cph).transpose(0, 2, 3, 1)

        qh, kh, vh = hm(q), hm(k), hm(v)
        temp = self.param("temperature", nn.initializers.ones,
                          (heads, 1, 1), self.param_dtype)
        attn = normalized_channel_logits_tok_minor(qh, kh)
        if dynamic_temp is not None:
            attn = attn * (temp[None] * dynamic_temp).astype(attn.dtype)
        else:
            attn = attn * temp[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhcd,bhdt->bhct", attn, vh,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, c)
        out = out * jax.nn.sigmoid(gate)
        return Conv(c, 1, use_bias=self.use_bias, name="project_out", **kw)(out)


class GatedSpatialFFN(nn.Module):
    """RectiFormer.py:231-266."""

    dim: int
    expansion: float = 2.66
    use_bias: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.expansion)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = Conv(hidden * 2, 1, use_bias=self.use_bias, name="project_in", **kw)(x)
        content, gate = jnp.split(x, 2, axis=-1)
        gate = jax.nn.sigmoid(Conv(hidden, 3, padding=1, groups=hidden,
                                   use_bias=self.use_bias,
                                   name="dwconv_gate", **kw)(gate))
        content = gelu_exact(Conv(hidden, 3, padding=1, groups=hidden,
                                  use_bias=self.use_bias,
                                  name="dwconv_content", **kw)(content))
        return Conv(self.dim, 1, use_bias=self.use_bias,
                    name="project_out", **kw)(content * gate)


class DGSB(nn.Module):
    """Degradation-guided frequency selection bottleneck
    (RectiFormer.py:154-228)."""

    dim: int
    context_dim: int = 64
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, global_feat):
        b, h, w, c = x.shape
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        spatial = Conv(c, 3, padding=1, groups=c, use_bias=True,
                       name="spatial_conv_0", **kw)(x)
        spatial = Conv(c, 1, use_bias=True, name="spatial_conv_1", **kw)(spatial)

        xf = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2))
        cat = jnp.concatenate([jnp.real(xf), jnp.imag(xf)], axis=-1)
        fh, fw = cat.shape[1:3]
        yy, xx = np.meshgrid(np.arange(fh), np.arange(fw), indexing="ij")
        dist2 = (xx - fw // 2) ** 2 + (yy - fh // 2) ** 2
        # h//8 == 0 gives inf/nan exactly like the reference's torch division
        with np.errstate(divide="ignore", invalid="ignore"):
            mask_np = np.exp(-dist2 / (2.0 * (h // 8) ** 2))
        low_mask = jnp.asarray(mask_np, cat.dtype)[None, :, :, None]
        low = Conv(2 * c, 1, use_bias=True, name="low_freq_conv",
                   dtype=jnp.float32, param_dtype=self.param_dtype)(cat * low_mask)
        high = Conv(2 * c, 1, use_bias=True, name="high_freq_conv",
                    dtype=jnp.float32, param_dtype=self.param_dtype)(
            cat * (1 - low_mask))
        lo_r, lo_i = jnp.split(low, 2, axis=-1)
        hi_r, hi_i = jnp.split(high, 2, axis=-1)
        low_s = jnp.fft.irfft2(lo_r + 1j * lo_i, s=(h, w), axes=(1, 2)).astype(x.dtype)
        high_s = jnp.fft.irfft2(hi_r + 1j * hi_i, s=(h, w), axes=(1, 2)).astype(x.dtype)

        wts = jax.nn.softmax(
            nn.Dense(3, name="fusion_proj", **kw)(global_feat), axis=-1)
        lw, hw_, sw = (wts[:, i, None, None, None] for i in range(3))
        fused = jnp.concatenate(
            [low_s * lw, high_s * hw_, spatial * sw], axis=-1)
        return Conv(c, 1, use_bias=True, name="fusion", **kw)(fused) + x


class DynamicTransformerBlock(nn.Module):
    """RectiFormer.py:329-358."""

    dim: int
    num_heads: int
    expansion: float = 2.66
    use_bias: bool = False
    ln_type: str = "WithBias"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, prompt):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        res = x
        h = LayerNorm(self.ln_type, param_dtype=self.param_dtype, name="norm1")(x)
        h, dyn = MDPM(self.dim, self.dim, name="prompt_fusion", **kw)(h, prompt)
        h = ElementwiseGatedAttention(self.dim, self.num_heads, self.use_bias,
                                      name="attn", **kw)(h, dyn)
        x = res + h
        x = x + GatedSpatialFFN(self.dim, self.expansion, self.use_bias,
                                name="ffn", **kw)(
            LayerNorm(self.ln_type, param_dtype=self.param_dtype, name="norm2")(x))
        return x


@register_model("rectiformer")
class RectiFormer(nn.Module):
    """RectiFormer.py:396-603."""

    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_encoder_blocks: Sequence[int] = (4, 6, 6, 8)
    num_decoder_blocks: Sequence[int] = (2, 3, 3, 4)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    ln_type: str = "WithBias"
    context_dim: int = 64
    num_scales: int = 3
    dtype: Any = None
    param_dtype: Any = jnp.float32

    def _blocks(self, dim, heads, n, prefix):
        return [
            DynamicTransformerBlock(dim, heads, self.ffn_expansion_factor,
                                    self.use_bias, self.ln_type,
                                    dtype=self.dtype,
                                    param_dtype=self.param_dtype,
                                    name=f"{prefix}_{i}")
            for i in range(n)
        ]

    @nn.compact
    def __call__(self, inp_img):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d = self.dim
        dims = [d * 2**i for i in range(4)]
        x = inp_img.astype(self.dtype) if self.dtype is not None else inp_img

        prompts, gfeat = MSDRNet(self.context_dim, self.num_scales, dims,
                                 name="context_net", **kw)(x)
        p1, p2, p3, p4 = prompts

        feats = Conv(d, 3, padding=1, use_bias=False, name="patch_embed", **kw)(x)
        enc1 = feats
        for blk in self._blocks(dims[0], self.heads[0],
                                self.num_encoder_blocks[0], "encoder_level1"):
            enc1 = blk(enc1, p1)
        enc2 = Downsample(dims[0], name="down1_2", **kw)(enc1)
        for blk in self._blocks(dims[1], self.heads[1],
                                self.num_encoder_blocks[1], "encoder_level2"):
            enc2 = blk(enc2, p2)
        enc3 = Downsample(dims[1], name="down2_3", **kw)(enc2)
        for blk in self._blocks(dims[2], self.heads[2],
                                self.num_encoder_blocks[2], "encoder_level3"):
            enc3 = blk(enc3, p3)
        enc4 = Downsample(dims[2], name="down3_4", **kw)(enc3)
        for blk in self._blocks(dims[3], self.heads[3],
                                self.num_encoder_blocks[3], "encoder_level4"):
            enc4 = blk(enc4, p4)

        latent = DGSB(dims[3], self.context_dim, name="freq_fusion", **kw)(
            enc4, gfeat)

        dec3 = Upsample(dims[3], name="up4_3", **kw)(latent)
        dec3 = Conv(dims[2], 1, use_bias=self.use_bias,
                    name="reduce_chan_level3", **kw)(
            jnp.concatenate([dec3, enc3], axis=-1))
        for blk in self._blocks(dims[2], self.heads[2],
                                self.num_decoder_blocks[2], "decoder_level3"):
            dec3 = blk(dec3, p3)
        dec2 = Upsample(dims[2], name="up3_2", **kw)(dec3)
        dec2 = Conv(dims[1], 1, use_bias=self.use_bias,
                    name="reduce_chan_level2", **kw)(
            jnp.concatenate([dec2, enc2], axis=-1))
        for blk in self._blocks(dims[1], self.heads[1],
                                self.num_decoder_blocks[1], "decoder_level2"):
            dec2 = blk(dec2, p2)
        dec1 = Upsample(dims[1], name="up2_1", **kw)(dec2)
        dec1 = Conv(dims[0], 1, use_bias=self.use_bias,
                    name="reduce_chan_level1", **kw)(
            jnp.concatenate([dec1, enc1], axis=-1))
        for blk in self._blocks(dims[0], self.heads[0],
                                self.num_decoder_blocks[0], "decoder_level1"):
            dec1 = blk(dec1, p1)
        for blk in self._blocks(dims[0], self.heads[0],
                                self.num_refinement_blocks, "refinement"):
            dec1 = blk(dec1, p1)

        out = Conv(self.out_channels, 3, padding=1, use_bias=self.use_bias,
                   name="output", **kw)(dec1)
        return (out + x).astype(jnp.float32)
